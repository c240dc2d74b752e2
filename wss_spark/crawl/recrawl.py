"""Incremental re-crawl: diff two snapshots of the pages store and derive
the fetch list for a refresh crawl (SURVEY §2.9 T4 — the reference's analog
is the per-spider "skip what the CSV already holds" resume, e.g.
`独立版/(using)WeiboUserScrapy.py:447-456`; at Common-Crawl scale the same
decision is a content-hash diff between the previous warehouse snapshot and
the newly fetched batch).

Scale shape: one full-outer equi-join on the canonical key — both sides
hash-partitioned, skew-free (the key is a URL, not a host) — comparing
md5 fingerprints, never the payloads. The diff output is tiny relative to
the store (the change rate), and the downstream seed list is a projection
of it. No driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGES = ("new", "changed", "removed", "unchanged")


def recrawl_diff(old: DataFrame, new: DataFrame, key_col: str = "url",
                 content_col: str = "text",
                 include_unchanged: bool = False) -> DataFrame:
    """(key, change) per url across two snapshots: ``new`` (key only in the
    new snapshot), ``removed`` (only in the old), ``changed`` (both, md5 of
    content differs), and — only with ``include_unchanged`` — ``unchanged``.
    Content comparison is by md5 fingerprint so the join never carries the
    payload column past the scan."""
    # presence is its own flag: md5(NULL content) is NULL, so inferring
    # presence from hash nullability would misclassify a null-payload row
    # (e.g. a failed fetch stored with null html) as absent
    o = old.select(F.col(key_col).alias("k"), F.lit(True).alias("_op"),
                   F.md5(F.col(content_col)).alias("_oh"))
    n = new.select(F.col(key_col).alias("k"), F.lit(True).alias("_np"),
                   F.md5(F.col(content_col)).alias("_nh"))
    j = o.join(n, "k", "full_outer")
    change = (
        F.when(F.col("_op").isNull(), F.lit("new"))
        .when(F.col("_np").isNull(), F.lit("removed"))
        # null-safe compare: null→value or value→null is a content change
        .when(~F.col("_oh").eqNullSafe(F.col("_nh")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(F.col("k").alias(key_col), change.alias("change"))
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out


def recrawl_seeds(diff: DataFrame, key_col: str = "url") -> DataFrame:
    """The refresh crawl's fetch list: urls that are new or whose content
    changed (removed urls have nothing to fetch). Feed to run_crawl as the
    seed frame."""
    return diff.filter(F.col("change").isin("new", "changed")).select(key_col)


def evict_urls(spark, checkpoint_dir: str, urls, config=None) -> int:
    """Force URLs back into crawlability in a standing checkpoint: remove
    them from the exact seen store (copy-on-write segment rewrite,
    checkpoint.evict_seen_keys) and — under ``seen_filter="cuckoo"`` — from
    the snapshot's prefilter state (cuckoo.delete + an atomic filter-state
    swap). The next ``continue_seen`` generation seeded with these urls
    re-fetches them; everything else stays seen.

    Under the bloom filter the prefilter bits cannot be cleared; the
    evicted urls simply take the maybe-seen path and the (rewritten) exact
    anti-join re-admits them — correct either way, the cuckoo variant just
    keeps the prefilter tight. This is the scale analog of deleting rows
    from the reference's per-spider CSV so its resume scan re-fetches them
    (`独立版/(using)WeiboUserScrapy.py:447-456`).

    ``urls``: list of url strings or a DataFrame with a ``url`` column.
    Returns the number of seen entries actually removed."""
    from pyspark.sql import DataFrame as _DF

    from wss_spark.crawl import bloom, checkpoint, cuckoo
    from wss_spark.crawl.frontier import CrawlConfig
    from wss_spark.functions.urls import canonicalize_url

    cfg = config or CrawlConfig()
    snap = checkpoint.latest_snapshot(checkpoint_dir)
    if snap is None:
        raise ValueError(
            f"no committed crawl snapshot under {checkpoint_dir!r} to evict "
            "from (eviction operates on standing seen state)"
        )
    if cfg.seen_filter == "cuckoo":
        # validate BEFORE mutating anything: a bloom snapshot under a
        # cuckoo config must fail up front, not after the exact-store
        # rewrite (which would leave a half-applied eviction)
        _frontier0, state0 = checkpoint.read_state(
            spark, checkpoint_dir, snap.wave
        )
        if "table" not in state0.columns:
            raise ValueError(
                f"snapshot at wave {snap.wave} holds bloom state but "
                "seen_filter='cuckoo'; pass the config the crawl ran with"
            )
    if isinstance(urls, _DF):
        udf_ = urls.select("url")
    else:
        udf_ = spark.createDataFrame([(u,) for u in urls], "url string")
    evict = bloom.with_hash_cols(
        udf_.select(canonicalize_url(F.col("url")).alias("canon_url")),
        "canon_url", cfg.n_buckets, cfg.salt,
    ).dropDuplicates(["canon_url"]).localCheckpoint(eager=True)

    seen = checkpoint.read_seen_keys(spark, checkpoint_dir, snap.wave)
    if seen is None:
        return 0
    # restrict to keys actually present: the cuckoo delete contract covers
    # only inserted keys (deleting an absent key could drop a colliding
    # member's copy), and every seen key was inserted into the filter
    matched = evict.select("bucket", "url_hash", "canon_url").join(
        seen, ["bucket", "url_hash", "canon_url"], "left_semi"
    ).localCheckpoint(eager=True)
    n_hit = matched.count()
    if not n_hit:
        return 0
    checkpoint.evict_seen_keys(spark, checkpoint_dir, matched, snap.wave)
    if cfg.seen_filter == "cuckoo":
        _frontier, state = checkpoint.read_state(spark, checkpoint_dir, snap.wave)
        new_state = cuckoo.delete(
            state, matched, cfg.cuckoo_slots, cfg.cuckoo_slot_width
        )
        checkpoint.swap_filter_state(checkpoint_dir, snap, new_state)
    return n_hit
