"""Bucketed co-located joins (wss_spark/bucketing.py): the plan-level
shuffle eliminations the module promises, plus value equality with the
plain join path."""

import pytest
from pyspark.sql import functions as F

from wss_spark import bucketing


@pytest.fixture(scope="module")
def bucketed_pages(spark, pages_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("buck")
    t = bucketing.write_bucketed(
        pages_small.select("url", "warc_ts", "lang"),
        "pages_bucketed", str(d / "pages"), bucket_col="url", n_buckets=8,
        sort_cols=["url"],
    )
    yield t
    spark.sql("DROP TABLE IF EXISTS pages_bucketed")


@pytest.fixture()
def no_broadcast(spark):
    # bucketing matters when neither side broadcasts; pin SMJ for the asserts
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_both_bucketed_join_is_shuffle_free(spark, bucketed_pages,
                                            pages_small, no_broadcast,
                                            tmp_path):
    other = bucketing.write_bucketed(
        pages_small.select("url", "text"),
        "pages_text_bucketed", str(tmp_path / "text"), bucket_col="url",
        n_buckets=8, sort_cols=["url"],
    )
    joined = bucketed_pages.join(other, "url")
    assert bucketing.n_exchanges(joined) == 0
    assert joined.count() == pages_small.count()
    spark.sql("DROP TABLE IF EXISTS pages_text_bucketed")


def test_one_sided_join_shuffles_only_the_plain_side(spark, bucketed_pages,
                                                     pages_small, no_broadcast):
    frontier = pages_small.select("url").limit(50).withColumn(
        "wave", F.lit(0)
    )
    joined = bucketed_pages.join(frontier, "url")
    # one Exchange (the frontier side); the pages scan stays in place
    assert bucketing.n_exchanges(joined) == 1
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the bucketed side's scan reports its buckets
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan


def test_plain_parquet_join_shuffles_both_sides(spark, pages_small,
                                                no_broadcast, tmp_path):
    # the counterfactual: same data, no bucket spec → two Exchanges
    p = str(tmp_path / "plain")
    pages_small.select("url", "warc_ts").write.parquet(p)
    plain = spark.read.parquet(p)
    frontier = pages_small.select("url").limit(50)
    assert bucketing.n_exchanges(plain.join(frontier, "url")) == 2


def test_bucketed_join_values_match_plain_join(spark, bucketed_pages,
                                               pages_small):
    frontier = pages_small.select("url").distinct().limit(40)
    via_bucket = sorted(
        (r["url"], r["lang"])
        for r in bucketed_pages.join(frontier, "url").select("url", "lang").collect()
    )
    via_plain = sorted(
        (r["url"], r["lang"])
        for r in pages_small.join(frontier, "url").select("url", "lang").collect()
    )
    assert via_bucket == via_plain
