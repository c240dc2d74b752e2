"""CSV ingest round-trip (S10/U2) and the applyInPandasWithState politeness
tracker."""

import pytest
from pyspark.sql import functions as F

from wss_spark import export, sources
from wss_spark.extraction.parse_page import extract_comments, parse_pages
from wss_spark.streaming import host_budget_tracker, stream_pages
from wss_spark.synth import build_pages_df


def test_csv_roundtrip_and_header_scrub(spark, tmp_path):
    pages = build_pages_df(spark, 6, seed=42)
    comments = extract_comments(parse_pages(pages))
    path = str(tmp_path / "comments.csv")
    n = export.export_comments_csv(comments, path)

    # simulate the reference's resume bug: header re-appended mid-file
    with open(path, "a", encoding="utf-8") as f:
        f.write(",".join(export.COMMENT_HEADERS) + "\n")

    df = sources.read_reference_csv(spark, path)
    assert df.columns[0] == export.COMMENT_HEADERS[0]  # BOM scrubbed
    assert df.count() == n + 1  # stray header row read as data
    clean = sources.scrub_header_rows(df)
    assert clean.count() == n
    # values survive the round trip
    got = {r[export.COMMENT_HEADERS[0]] for r in clean.collect()}
    want = {r["comment_id"] for r in comments.collect()}
    assert got == want


def test_host_budget_tracker_state(spark, tmp_path):
    d = str(tmp_path / "pages")
    pages = build_pages_df(spark, 12, seed=9)
    pages.repartition(3).write.mode("overwrite").parquet(d)

    tracked = host_budget_tracker(
        stream_pages(spark, d), budget_per_batch=5
    )
    q = (
        tracked.writeStream.format("memory")
        .queryName("budget_track")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300)
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT host, sum(batch_pages) AS n, max(total_pages) AS tot, "
        "max(over_budget) AS over FROM budget_track GROUP BY host"
    ).collect()
    batch = pages.groupBy(
        F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1).alias("host")
    ).count()
    want = {(r["host"], r["count"]) for r in batch.collect()}
    got = {(r["host"], r["n"]) for r in rows}
    assert got == want
    # running state accumulated across batches to the true total
    assert {(r["host"], r["tot"]) for r in rows} == want
    # the hot host exceeds a 5-page budget in at least one batch
    hot = [r for r in rows if r["n"] > 20]
    assert hot and all(r["over"] for r in hot)
