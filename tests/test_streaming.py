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


# ---------------------------------------------------------------------------
# streaming frontier drain (SURVEY §2.9 T1 streaming form, VERDICT r04 #5):
# a seed stream drives the batch wave loop via foreachBatch generations


def _crawl_cfg(ckpt=None):
    from wss_spark.crawl.frontier import CrawlConfig

    return CrawlConfig(
        budget=5, n_buckets=8, m_bits=1 << 16,
        checkpoint_dir=str(ckpt) if ckpt else None,
    )


@pytest.fixture(scope="module")
def stream_crawl_world(spark):
    from wss_spark.synth import build_pages_df, seed_list

    pages = build_pages_df(spark, 8, seed=42).cache()
    pages.count()
    seeds = seed_list(8, seed=42)
    robots = spark.createDataFrame(
        [("weibo.cn", "/mblog/picAll", False, None)],
        "host string, path_prefix string, allowed boolean, crawl_delay int",
    )
    return {"pages": pages, "seeds": seeds, "robots": robots}


def test_stream_crawl_single_batch_equals_batch(spark, tmp_path, stream_crawl_world):
    """All seeds arriving in ONE availableNow micro-batch: the drain IS the
    batch crawl — identical visit order and seen set on a multi-wave crawl
    (the north-rule determinism invariant, streaming form)."""
    from wss_spark.crawl.frontier import run_crawl, visit_order
    from wss_spark.streaming import stream_crawl

    w = stream_crawl_world
    seeds_df = spark.createDataFrame([(u,) for u in w["seeds"]], "url string")
    batch = run_crawl(
        spark, w["pages"], seeds_df, _crawl_cfg(tmp_path / "batch"),
        robots=w["robots"],
    )
    assert batch.waves >= 2  # a real multi-wave crawl, not a one-shot

    seeds_dir = str(tmp_path / "seeds")
    seeds_df.coalesce(1).write.mode("append").parquet(seeds_dir)
    res = stream_crawl(
        spark, w["pages"], seeds_dir, config=_crawl_cfg(),
        robots=w["robots"], crawl_root=str(tmp_path / "stream"),
    )
    assert len(res) == 1
    assert visit_order(res[0].fetch_log) == visit_order(batch.fetch_log)
    got_seen = {r[0] for r in res[0].seen.select("canon_url").collect()}
    want_seen = {r[0] for r in batch.seen.select("canon_url").collect()}
    assert got_seen == want_seen
    # the blocked path exercised in streaming too
    assert res[0].fetch_log.filter(F.col("status") == 403).count() > 0


def test_stream_crawl_incremental_batches(spark, tmp_path, stream_crawl_world):
    """Seeds arriving across drains: later generations skip everything any
    earlier generation visited (no url fetched twice, ever), the cumulative
    seen set equals the all-at-once batch crawl's, and replaying an
    already-drained seed file admits nothing."""
    from wss_spark.crawl.frontier import run_crawl
    from wss_spark.streaming import stream_crawl

    w = stream_crawl_world
    seeds1 = w["seeds"][:5]
    root = str(tmp_path / "stream")
    seeds_dir = str(tmp_path / "seeds")

    def _write(urls):
        spark.createDataFrame([(u,) for u in urls], "url string") \
            .coalesce(1).write.mode("append").parquet(seeds_dir)

    _write(seeds1)
    r1 = stream_crawl(spark, w["pages"], seeds_dir, config=_crawl_cfg(),
                      robots=w["robots"], crawl_root=root)
    assert len(r1) == 1
    n_log_1 = r1[0].fetch_log.count()

    # second file: ALL seeds — 5 of 8 fully crawled already
    _write(w["seeds"])
    r2 = stream_crawl(spark, w["pages"], seeds_dir, config=_crawl_cfg(),
                      robots=w["robots"], crawl_root=root)
    assert len(r2) == 1
    log = r2[0].fetch_log
    # no canon_url ever fetched twice across generations (200s and 403s both)
    dup = log.groupBy("canon_url").count().filter(F.col("count") > 1).count()
    assert dup == 0
    # generation 2 did new work (the 3 unseen seed families)
    assert log.count() > n_log_1

    # cumulative seen set == the all-at-once batch crawl's
    seeds_df = spark.createDataFrame([(u,) for u in w["seeds"]], "url string")
    batch = run_crawl(
        spark, w["pages"], seeds_df, _crawl_cfg(tmp_path / "batch_all"),
        robots=w["robots"],
    )
    got = {r[0] for r in r2[0].seen.select("canon_url").collect()}
    want = {r[0] for r in batch.seen.select("canon_url").collect()}
    assert got == want

    # no new files -> availableNow drains nothing, zero generations run
    r3 = stream_crawl(spark, w["pages"], seeds_dir, config=_crawl_cfg(),
                      robots=w["robots"], crawl_root=root)
    assert r3 == []

    # replaying a committed generation's seeds (new file, same urls) is
    # idempotent per url: the generation admits nothing and the log is flat
    _write(seeds1)
    r4 = stream_crawl(spark, w["pages"], seeds_dir, config=_crawl_cfg(),
                      robots=w["robots"], crawl_root=root)
    assert len(r4) == 1
    assert all(m["n_admitted"] == 0 for m in r4[0].metrics)
    assert r4[0].fetch_log.count() == log.count()
