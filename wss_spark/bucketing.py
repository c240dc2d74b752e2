"""Bucketed storage for co-located joins — the 100 TB fetch-join story.

Every crawl wave joins the frontier (MBs of candidate urls) against the
pages corpus (TBs) on ``url`` (`crawl/frontier.py` step 5). Unbucketed,
that join shuffles BOTH sides every wave — including re-shuffling the same
multi-TB pages table wave after wave. Bucketing the pages table by url
once at write time pins its partitioning in the catalog, so every later
equi-join on url reuses it: the pages side is scanned in place (no
Exchange above its scan) and only the frontier side shuffles — per-wave
shuffle cost drops from O(corpus) to O(frontier).

This module uses Spark's native bucketing (``bucketBy`` + ``saveAsTable``
with an explicit external ``path``). With the default in-memory catalog
the table registration lives for the session while the parquet files are
plain files at ``path`` — the local/test harness shape. On a production
cluster the same declaration is durable: a Hive metastore table, or an
Iceberg table with a ``bucket(n, url)`` partition transform (Iceberg's
storage-partitioned joins give the identical no-shuffle property).

Rules for the shuffle elimination to hold (pinned in test_bucketing):
- join keys must include the bucket column;
- both-bucketed joins need the SAME bucket count on both tables
  (→ zero Exchange);
- a bucketed-vs-plain join shuffles only the plain side (one Exchange);
- broadcast must not kick in first (a broadcast join is already
  shuffle-free — bucketing is for when neither side broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str = "url",
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``df`` as a bucketed external table and return the bucketed
    scan. ``n_buckets`` should match (or divide) the cluster's
    ``spark.sql.shuffle.partitions`` so one-sided joins can align the
    plain side to the bucketed layout without re-bucketing. ``sort_cols``
    additionally sorts within buckets (skips the sort-merge join's sort on
    this side)."""
    spark = df.sparkSession
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .option("path", path)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)
    return spark.table(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """The bucketed scan — must go through the catalog table (a plain
    ``spark.read.parquet(path)`` of the same files loses the bucket spec
    and with it the shuffle elimination)."""
    return spark.table(name)


def n_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the executed plan — the thing
    bucketing exists to remove; used by tests and plan audits."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line and "Reused" not in line
    )
