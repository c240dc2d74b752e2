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


def test_foreach_batch_seen_table_is_narrow(spark, pages_dir, tmp_path):
    """VERDICT r01 item 7: the idempotent append must anti-join a compact
    bucket-partitioned seen-keys table, not re-scan the ever-growing target."""
    import os

    out = str(tmp_path / "ing2")
    sink = foreach_batch_dedup_append(out, key_col="url", n_buckets=4)
    stream = stream_pages(spark, pages_dir).select("url", "lang")
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_seen"))
        .start()
    )
    try:
        assert q.awaitTermination(300)
    finally:
        q.stop()
    seen_dir = out + "__seen"
    assert os.path.isdir(seen_dir)
    buckets = [d for d in os.listdir(seen_dir) if d.startswith("_bucket=")]
    assert buckets  # hash-bucket partitioned
    seen = spark.read.parquet(seen_dir)
    assert set(seen.columns) == {"url", "_bucket"}  # keys only, never payload
    assert seen.count() == spark.read.parquet(out).count()


def test_foreach_batch_corrupt_seen_state_raises(spark, pages_dir, tmp_path):
    """ADVICE r01: unreadable seen state must FAIL the batch, not silently
    disable dedup."""
    import os

    import pytest

    out = str(tmp_path / "ing3")
    seen_dir = out + "__seen"
    os.makedirs(seen_dir + "/_bucket=0", exist_ok=True)
    with open(seen_dir + "/_bucket=0/part-junk.parquet", "wb") as f:
        f.write(b"this is not parquet")
    sink = foreach_batch_dedup_append(out, key_col="url", n_buckets=4)
    batch = spark.read.parquet(pages_dir).select("url", "lang").limit(5)
    with pytest.raises(Exception):
        sink(batch, 0)


def test_stream_extract_entities_event_time(spark, pages_dir):
    """warc_ts rides through the Arrow extraction pass (passthrough), so the
    parsed stream itself is watermark/window-able."""
    stream = stream_pages(spark, pages_dir)
    ents = stream_extract_entities(stream, with_event_time=True)
    assert "warc_ts" in ents.columns
    agg = (
        ents.withWatermark("warc_ts", "2 hours")
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), "kind")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("ent_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300)
    finally:
        q.stop()
    got = spark.sql("SELECT sum(n) AS n FROM ent_windows").first()["n"]
    batch_n = parse_pages(spark.read.parquet(pages_dir)).count()
    assert got == batch_n
