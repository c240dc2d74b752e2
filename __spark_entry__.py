"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real implementations live in the ``wss_spark`` package
(``wss_spark.catalog`` holds the query/oracle registry).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wss_spark import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the multi-hop revenue join
    (scan → broadcast dims → shuffle joins → agg), SURVEY.md §2.3."""
    return catalog.j3_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data pipeline operators). See wss_spark/catalog.py."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY query — since r03 the engine-native
    paths (crawl scheduler, SRP/IVF ANN, banded simhash, multimodal) are
    value-oracled too, via exact DuckDB replays of their deterministic
    definitions (record-level VALUES for the crawl/extraction families)."""
    return catalog.oracle_sql()
