"""Structured Streaming tests: availableNow file-source ingest, event-time
windowed aggregation with watermark, idempotent foreachBatch dedup-append,
streaming-vs-batch extraction parity. Every query is stopped in a finally
block — a leftover running query can deadlock later py4j callbacks."""

import pytest
from pyspark.sql import functions as F

from wss_spark.extraction.parse_page import parse_pages
from wss_spark.streaming import (
    foreach_batch_dedup_append,
    stream_extract_entities,
    stream_pages,
    windowed_page_counts,
)
from wss_spark.synth import build_pages_df


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    build_pages_df(spark, 15, seed=9).repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_windowed_counts_match_batch(spark, pages_dir):
    stream = stream_pages(spark, pages_dir)
    agg = windowed_page_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300)
    finally:
        q.stop()
    got = spark.sql("SELECT host, sum(n_pages) AS n FROM win_counts GROUP BY host")

    batch = spark.read.parquet(pages_dir)
    want = batch.groupBy(
        F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1).alias("host")
    ).agg(F.count("*").alias("n"))
    assert {(r["host"], r["n"]) for r in got.collect()} == {
        (r["host"], r["n"]) for r in want.collect()
    }


def test_streaming_extraction_matches_batch(spark, pages_dir):
    stream = stream_pages(spark, pages_dir)
    ents = stream_extract_entities(stream).filter(F.col("kind") == "comment")
    q = (
        ents.writeStream.format("memory")
        .queryName("stream_comments")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300)
    finally:
        q.stop()
    got = spark.sql("SELECT url, entity_id FROM stream_comments")

    batch = parse_pages(spark.read.parquet(pages_dir)).filter(F.col("kind") == "comment")
    assert got.count() == batch.count()
    assert got.exceptAll(batch.select("url", "entity_id")).count() == 0


def test_foreach_batch_idempotent(spark, pages_dir, tmp_path):
    out = str(tmp_path / "ingested")
    sink = foreach_batch_dedup_append(out, key_col="url")

    for attempt in range(2):  # same source replayed twice, fresh checkpoints
        stream = stream_pages(spark, pages_dir).select("url", "warc_ts", "lang")
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ck{attempt}"))
            .start()
        )
        try:
            assert q.awaitTermination(300)
        finally:
            q.stop()

    n_src = spark.read.parquet(pages_dir).select("url").distinct().count()
    got = spark.read.parquet(out)
    assert got.count() == n_src  # second replay appended nothing
    assert got.select("url").distinct().count() == n_src
