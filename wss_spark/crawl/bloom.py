"""Partitioned bloom URL-seen filter (north-rule seen set).

The reference's seen set is an in-memory Python list / pandas
``drop_duplicates`` (`独立版/WeiboSuperCommentScrapy.py:393-406`,
`独立版/(using)WeiboUserScrapy.py:447-456`) — O(frontier) driver memory. At a
10^10-URL frontier the seen state must itself be a distributed table. Design:

- state table ``(bucket int, bitmap binary, count long)``: ``B`` buckets, each
  an ``m``-bit bloom bitmap. Bucket = ``pmod(xxhash64(canon_url, salt), B)``
  — salted so one hot host cannot concentrate state in one bucket.
- membership bits: double hashing ``h_i = h1 + i*h2 (mod m)`` with ``h1``/
  ``h2`` carved from the same 64-bit salted hash (classic Kirsch-Mitzenmacher;
  k probes from one hash).
- update: ``cogroup(new_urls, state).applyInPandas`` per bucket — each task
  ORs its bucket's new bits into the bitmap with numpy, no driver state.
- query: join candidates to state on bucket, vectorized membership test per
  bucket group. The bloom is a *prefilter* only: rows it cannot rule out go
  to an exact ``left_anti`` join against the exact seen table (bloom false
  positives must never drop truly-new URLs).

Sizing: default m = 2^23 bits (1 MiB) per bucket. At B=1024 that is 1 GiB of
state for ~8.6e9 bits ≈ 10^9 URLs at ~8.6 bits/url (k=6 → ~2% fp). For a
10^10 frontier set B=16384 (scales horizontally; each bucket is an
independent row and the cogroup shuffles by bucket, so skew-free).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wss_spark.functions.urls import DEFAULT_SALT, bucket_of, url_hash
from wss_spark.schema import BLOOM_STATE

DEFAULT_BITS = 1 << 23  # bits per bucket bitmap (1 MiB)
DEFAULT_K = 6


def _probe_positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n,) int64 salted hashes → (n, k) bit positions via double hashing."""
    u = hashes.astype(np.uint64)
    h1 = (u & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = ((u >> np.uint64(32)) | np.uint64(1)).astype(np.uint64)  # odd → full cycle
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _set_bits(bitmap: np.ndarray, pos: np.ndarray) -> None:
    np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def _test_bits(bitmap: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """(n,k) positions → (n,) bool 'all k bits set' (possibly-seen)."""
    bits = (bitmap[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return bits.all(axis=1)


def empty_state(spark, n_buckets: int) -> DataFrame:
    """All-zero bloom state (bitmaps materialized lazily on first update)."""
    return spark.createDataFrame([], BLOOM_STATE)


def with_hash_cols(df: DataFrame, url_col: str = "canon_url",
                   n_buckets: int = 1024, salt: int = DEFAULT_SALT) -> DataFrame:
    """Attach ``url_hash`` and ``bucket`` (JVM-side xxhash64) if missing."""
    if "url_hash" not in df.columns:
        df = df.withColumn("url_hash", url_hash(F.col(url_col), salt))
    if "bucket" not in df.columns:
        df = df.withColumn("bucket", bucket_of(F.col("url_hash"), n_buckets))
    return df


def update(state: DataFrame, new_urls: DataFrame,
           m_bits: int = DEFAULT_BITS, k: int = DEFAULT_K) -> DataFrame:
    """OR the new urls' bits into each bucket's bitmap.

    ``new_urls`` must carry (bucket, url_hash). One shuffle on ``bucket``;
    each task touches exactly one bucket's bitmap (bounded memory =
    m_bits/8 + its slice of new urls).
    """
    spark = state.sparkSession
    new_min = new_urls.select("bucket", "url_hash")

    def merge(adds: pd.DataFrame, st: pd.DataFrame) -> pd.DataFrame:
        if len(adds) == 0 and len(st) == 0:
            return pd.DataFrame(columns=["bucket", "bitmap", "count"])
        bucket = int(adds["bucket"].iloc[0] if len(adds) else st["bucket"].iloc[0])
        if len(st):
            bitmap = np.frombuffer(st["bitmap"].iloc[0], dtype=np.uint8).copy()
            count = int(st["count"].iloc[0])
        else:
            bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
            count = 0
        if len(adds):
            pos = _probe_positions(adds["url_hash"].to_numpy(), m_bits, k)
            _set_bits(bitmap, pos)
            count += len(adds)
        return pd.DataFrame(
            {"bucket": [bucket], "bitmap": [bitmap.tobytes()], "count": [count]}
        )

    return (
        new_min.groupBy("bucket")
        .cogroup(state.groupBy("bucket"))
        .applyInPandas(merge, schema=BLOOM_STATE)
    )


def prefilter(candidates: DataFrame, state: DataFrame,
              m_bits: int = DEFAULT_BITS, k: int = DEFAULT_K) -> DataFrame:
    """candidates (+bucket,+url_hash) → same rows + ``maybe_seen`` boolean.

    Rows with ``maybe_seen = false`` are PROVABLY new (bloom has no false
    negatives) and skip the exact anti-join entirely — at steady state that
    is the vast majority of a crawl frontier, so the expensive exact join
    runs only on the small maybe-seen slice.
    """
    from pyspark.sql.types import BooleanType, StructField, StructType

    out_schema = StructType(
        list(candidates.schema.fields) + [StructField("maybe_seen", BooleanType(), False)]
    )

    def probe(cand: pd.DataFrame, st: pd.DataFrame) -> pd.DataFrame:
        if len(cand) == 0:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        if len(st) == 0:
            cand = cand.copy()
            cand["maybe_seen"] = False
            return cand
        bitmap = np.frombuffer(st["bitmap"].iloc[0], dtype=np.uint8)
        pos = _probe_positions(cand["url_hash"].to_numpy(), m_bits, k)
        cand = cand.copy()
        cand["maybe_seen"] = _test_bits(bitmap, pos)
        return cand

    return (
        candidates.groupBy("bucket")
        .cogroup(state.groupBy("bucket"))
        .applyInPandas(probe, schema=out_schema)
    )
