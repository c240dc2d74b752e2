"""Ingest sources beyond parquet: the reference's CSV round-trip path.

The reference re-reads its own CSV outputs for dedup/enrichment passes
(S10, `独立版/(using)WeiboUserScrapy.py:449`, `独立版/WeiboUserInfoSpider.py:129`)
and those files can contain re-appended header rows mid-file (its append-mode
writer re-emits headers on resume), which it scrubs post-hoc (U2,
`独立版/(using)WeiboUserScrapy.py:453`). This module is the engine's ingest
twin: schema-aware CSV read + declarative header-row scrub.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_reference_csv(spark: SparkSession, path: str,
                       schema: str | None = None) -> DataFrame:
    """Read a reference-convention CSV (utf-8-sig BOM, header row, quoted
    fields). With ``schema`` (DDL string) the scan avoids the inference pass
    — at 100 TB, inference means reading everything twice."""
    reader = (
        spark.read.option("header", "true")
        .option("encoding", "UTF-8")
        .option("multiLine", "true")
        .option("escape", '"')
    )
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    # utf-8-sig: the BOM rides on the first header cell; Spark handles the
    # header row itself, but scrub a stray BOM from the first column name
    first = df.columns[0]
    if first.startswith("﻿"):
        df = df.withColumnRenamed(first, first.lstrip("﻿"))
    return df


def scrub_header_rows(df: DataFrame) -> DataFrame:
    """U2 — drop data rows that are actually re-appended header rows
    (every column value equals its own column name)."""
    cond = None
    for c in df.columns:
        eq = F.col(c).cast("string") == F.lit(c)
        cond = eq if cond is None else (cond & eq)
    return df.filter(~F.coalesce(cond, F.lit(False)))
