"""Streaming pipelines over the pages table.

- ``stream_pages``: file-source readStream of a pages parquet directory
  (new files = newly fetched pages; at production this is the Iceberg/warc
  landing zone).
- ``stream_extract_entities``: the same Arrow-vectorized extraction pass as
  batch (``parse_page.parse_pages`` — mapInPandas is streaming-safe), so
  batch and streaming share one extraction code path.
- ``windowed_page_counts``: event-time analytics on ``warc_ts`` with a
  watermark for late pages (the reference's hour-histogram A5 made
  incremental).
- ``foreach_batch_dedup_append``: idempotent micro-batch ingest — per batch,
  keep-first dedup within the batch, anti-join against the already-ingested
  key set, append. This is the streaming twin of the wave loop's seen-filter
  (exactly-once per key, replay-safe).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wss_spark.extraction.kernel import ANCHOR
from wss_spark.extraction.parse_page import parse_pages
from wss_spark.schema import PAGES


def stream_pages(spark: SparkSession, pages_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(pages_dir)


def stream_extract_entities(pages_stream: DataFrame, now: datetime = ANCHOR,
                            with_event_time: bool = False) -> DataFrame:
    """Streaming html→entities via the shared vectorized extraction pass.

    By default ``parse_pages`` projects only (url, html), so the streaming
    plan prunes the rest of the scan just like batch. With
    ``with_event_time=True`` the source's ``warc_ts`` rides through the
    Arrow pass onto every entity row (parse_pages passthrough), so the
    parsed stream itself can be watermarked/windowed downstream.
    """
    return parse_pages(
        pages_stream, now, passthrough=["warc_ts"] if with_event_time else None
    )


def windowed_page_counts(pages_stream: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Pages per (host, event-time window), late data bounded by watermark."""
    host = F.regexp_extract(F.col("url"), r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    return (
        pages_stream.withColumn("host", host)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_pages",
        )
    )


def host_budget_tracker(pages_stream: DataFrame, budget_per_batch: int = 100,
                        timeout_ms: int = 60000) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a per-host running fetch counter with budget flagging — the streaming
    twin of the politeness budget (SURVEY.md §2.9 T2 / §2.10 stateful UDF).

    State per host: (total_pages, batches_seen). Emits one row per host per
    micro-batch: (host, batch_pages, total_pages, over_budget).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("host", StringType(), False),
            StructField("batch_pages", LongType(), False),
            StructField("total_pages", LongType(), False),
            StructField("over_budget", BooleanType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("total", LongType(), False),
            StructField("batches", IntegerType(), False),
        ]
    )

    def track(key, pdfs, state: GroupState):
        host = key[0]
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            total, batches = state.get
        else:
            total, batches = 0, 0
        total += n
        batches += 1
        state.update((total, batches))
        yield pd.DataFrame(
            {
                "host": [host],
                "batch_pages": [n],
                "total_pages": [total],
                "over_budget": [n > budget_per_batch],
            }
        )

    host = F.regexp_extract(F.col("url"), r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    return (
        pages_stream.withColumn("host", host)
        .groupBy("host")
        .applyInPandasWithState(
            track,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_crawl(spark: SparkSession, pages: DataFrame, seeds_dir: str,
                 config=None, robots: DataFrame | None = None,
                 crawl_root: str | None = None,
                 stream_checkpoint: str | None = None,
                 max_files_per_batch: int | None = None,
                 timeout_s: float = 600.0) -> list:
    """Streaming frontier drain (SURVEY §2.9 T1, streaming form): a
    file-source stream of seed urls drives the SAME wave loop as the batch
    ``run_crawl`` via ``foreachBatch`` — each micro-batch of seeds runs one
    crawl *generation* (``run_crawl(..., continue_seen=True)``) against the
    standing seen store under ``crawl_root``, so a url visited by any earlier
    batch is never re-fetched and the visit order within each generation is
    the same pure-data ordering the batch loop produces. With all seeds in
    one batch the drain IS the batch crawl: identical visit order and seen
    set (pinned in test_streaming).

    ``availableNow`` processes every seed file present, then stops; calling
    ``stream_crawl`` again with the same ``stream_checkpoint`` after new
    seed files land drains only the new ones (the file-source ledger skips
    processed files) — the continuous form is the same query with a
    processing-time trigger left running.

    Exactly-once: the crawl's own per-wave commit markers make a generation
    internally resumable, and a *committed* generation replayed by the
    stream ledger admits nothing (every url already in the seen store), so
    micro-batch replay is idempotent per url. A crash mid-generation resumes
    at the crawl layer (wave-level), not the stream layer.

    Returns one CrawlResult per non-empty micro-batch, in batch order; each
    carries the CUMULATIVE fetch_log/entities/seen (all generations so far —
    the standing crawl state) and this generation's metrics. Uses
    ``defer_logs=False`` regardless of config (deferred in-memory logs
    cannot span foreachBatch invocations).
    """
    from dataclasses import replace
    import tempfile

    from wss_spark.crawl.frontier import CrawlConfig, run_crawl

    root = crawl_root or tempfile.mkdtemp(prefix="wss_stream_crawl_")
    cfg = replace(config or CrawlConfig(), checkpoint_dir=root, defer_logs=False)
    results: list = []

    def drain(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = run_crawl(
            spark, pages, batch_df.select("url"), cfg, robots=robots,
            continue_seen=True,
        )
        results.append(res)

    reader = spark.readStream.schema("url string")
    if max_files_per_batch:
        reader = reader.option("maxFilesPerTrigger", max_files_per_batch)
    q = (
        reader.parquet(seeds_dir)
        .writeStream.foreachBatch(drain)
        .option(
            "checkpointLocation",
            stream_checkpoint or root.rstrip("/") + "/_seed_stream_ckpt",
        )
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(
                f"stream_crawl drain did not finish within {timeout_s}s"
            )
    finally:
        q.stop()
    return results


def foreach_batch_dedup_append(target_dir: str, key_col: str = "url",
                               n_buckets: int = 16):
    """Returns a foreachBatch(fn) that appends each micro-batch to
    ``target_dir`` parquet, dropping keys already present — idempotent under
    micro-batch replay (streaming seen-filter semantics).

    The anti-join target is a dedicated compact seen-keys table
    (``<target>__seen``, hash-bucket partitioned like the crawl's seen state,
    `crawl/bloom.py`), NOT a re-scan of the full ingested data: per batch the
    engine reads only (bucket, key) of the keys table, and the batch's own
    bucket set prunes the partitioned scan — never the ever-growing payload
    (VERDICT r01 §wrong-3).

    Error handling: only a *missing* seen table (true first batch) is treated
    as empty; any other analysis error (corrupt/unreadable state) fails the
    batch instead of silently disabling dedup (ADVICE r01).

    Write order is payload-then-keys: replaying a *committed* batch appends
    nothing (its keys are in the seen table), while a crash landing exactly
    between the two writes can duplicate that one batch's payload — with
    plain parquet dirs no two-file append is atomic; production would use an
    Iceberg transaction for the dual append.
    """
    import os

    from pyspark.errors import AnalysisException

    seen_dir = target_dir.rstrip("/") + "__seen"

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates([key_col]).withColumn(
            "_bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
        )
        if os.path.isdir(seen_dir):
            try:
                seen = spark.read.parquet(seen_dir)
            except AnalysisException as e:
                if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                    seen = None  # dir exists but holds no parquet yet
                else:
                    raise  # unreadable state must fail the batch, not skip dedup
            if seen is not None:
                # partition pruning: only the batch's buckets are scanned
                buckets = [r[0] for r in fresh.select("_bucket").distinct().collect()]
                seen = seen.filter(F.col("_bucket").isin(buckets)).select("_bucket", key_col)
                fresh = fresh.join(seen, on=["_bucket", key_col], how="left_anti")
        fresh.persist()
        try:
            fresh.drop("_bucket").write.mode("append").parquet(target_dir)
            fresh.select("_bucket", key_col).write.mode("append") \
                .partitionBy("_bucket").parquet(seen_dir)
        finally:
            fresh.unpersist()

    return fn
