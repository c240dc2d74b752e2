"""Frontier expansion: parsed pages → newly discovered URLs.

Reproduces the reference's per-target discovery order
(`独立版/WeiboDeepAnalyzer.py:693-736` analyze(): content → long-text/album
expansions → comment pages → repost pages; author profile last), encoded as a
``stage`` number so the deterministic frontier order
(priority, seed_order, stage, page, canon_url) replays the reference's
program order:

  stage 0  main /comment/{wid} page          (seed,   `:182`)
  stage 1  full-text ?ckAll=1 page           (J3,     `:218-230`)
  stage 2  picAll album page                 (J4,     `:233-245`)
  stage 3  comment pages 2..N                (S4,     `:328-341`)
  stage 4  repost pages 1.. until empty      (S5/S6,  `:444-456,529-531`)
  stage 5  author /{uid}/info profile page   (J1 dim, `WeiboCommentScrapy.py:102-120`)

Everything here is JVM-side Column expressions over the tall PARSED frame —
no Python in the loop. Comment pages are discovered all-at-once from the
page-count metadata (the reference precomputes page count,
`独立版/WeiboCommentScrapy.py:158-162`); repost pages are discovered one wave
at a time (scan-until-empty has a true sequential dependency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wss_spark.functions.urls import canonicalize_url, host_of

_FRONTIER_COLS = ["url", "canon_url", "host", "seed_order", "stage", "page", "priority"]


def _finish(df: DataFrame) -> DataFrame:
    url = F.col("url")
    return df.select(
        url.alias("url"),
        canonicalize_url(url).alias("canon_url"),
        host_of(url).alias("host"),
        F.col("seed_order").cast("long"),
        F.col("stage").cast("int"),
        F.col("page").cast("int"),
        F.col("priority").cast("double"),
    )


def discover(parsed: DataFrame, fetched: DataFrame) -> DataFrame:
    """New frontier candidates from one wave's parse results.

    ``parsed``: tall PARSED rows of this wave. ``fetched``: the admitted
    frontier rows that produced them (carries seed_order/priority per url).
    """
    lineage = fetched.select(
        F.col("url").alias("_src_url"), "seed_order", "priority"
    )
    p = parsed.join(lineage, parsed["url"] == lineage["_src_url"], "inner")
    base_host = host_of(F.col("url"))

    weibo = p.filter(F.col("kind") == "weibo")

    # stage 1: full-text page (href may be host-relative)
    fulltext = (
        weibo.filter(F.col("fulltext_href").isNotNull())
        .select(
            F.when(
                F.col("fulltext_href").startswith("http"), F.col("fulltext_href")
            )
            .otherwise(F.concat(F.lit("https://"), base_host, F.col("fulltext_href")))
            .alias("url"),
            "seed_order",
            F.lit(1).alias("stage"),
            F.lit(1).alias("page"),
            "priority",
        )
    )

    # stage 2: album page
    album = (
        weibo.filter(F.col("album_href").isNotNull())
        .select(
            F.when(F.col("album_href").startswith("http"), F.col("album_href"))
            .otherwise(F.concat(F.lit("https://"), base_host, F.col("album_href")))
            .alias("url"),
            "seed_order",
            F.lit(2).alias("stage"),
            F.lit(1).alias("page"),
            "priority",
        )
    )

    # stage 3: comment pages 2..N, all at once from the page count
    comment_pages = (
        weibo.filter(F.col("total_comment_pages") >= 2)
        .select(
            F.explode(F.sequence(F.lit(2), F.col("total_comment_pages"))).alias("p"),
            F.col("root_id"),
            base_host.alias("h"),
            "seed_order",
            "priority",
        )
        .select(
            F.format_string("https://%s/comment/%s?page=%d", "h", "root_id", "p").alias("url"),
            "seed_order",
            F.lit(3).alias("stage"),
            F.col("p").alias("page"),
            "priority",
        )
    )

    # stage 4 seed: repost page 1 (unconditional, `独立版/WeiboDeepAnalyzer.py:444`)
    repost1 = weibo.select(
        F.format_string(
            "https://%s/repost/%s?page=1", base_host, F.col("root_id")
        ).alias("url"),
        "seed_order",
        F.lit(4).alias("stage"),
        F.lit(1).alias("page"),
        "priority",
    )

    # stage 4 continuation: page k+1 iff page k had repost blocks (S6)
    page_rows = p.filter(F.col("kind") == "page")
    repost_next = (
        page_rows.filter(
            F.col("url").rlike(r"^https?://[^/]+/repost/") & (F.col("n_blocks") > 0)
        )
        .select(
            F.format_string(
                "https://%s/repost/%s?page=%d",
                base_host,
                F.col("root_id"),
                F.col("page") + F.lit(1),
            ).alias("url"),
            "seed_order",
            F.lit(4).alias("stage"),
            (F.col("page") + 1).alias("page"),
            "priority",
        )
    )

    # stage 5: author profile page
    info = (
        weibo.filter(F.col("user_id").isNotNull())
        .select(
            F.format_string("https://%s/%s/info", base_host, F.col("user_id")).alias("url"),
            "seed_order",
            F.lit(5).alias("stage"),
            F.lit(1).alias("page"),
            "priority",
        )
    )

    out = fulltext.unionByName(album).unionByName(comment_pages)
    out = out.unionByName(repost1).unionByName(repost_next).unionByName(info)
    return _finish(out)


def seeds_to_frontier(spark, seed_urls: list[str], priority: float = 0.0) -> DataFrame:
    """Seed list (config order, O4) → wave-0 frontier DataFrame."""
    rows = [(u, i) for i, u in enumerate(seed_urls)]
    df = spark.createDataFrame(rows, "url string, seed_order long")
    return _finish(
        df.select(
            "url",
            "seed_order",
            F.lit(0).alias("stage"),
            F.lit(1).alias("page"),
            F.lit(priority).alias("priority"),
        )
    )


def seeds_frontier_from_df(seeds: DataFrame, priority: float = 0.0) -> DataFrame:
    """Distributed seeding for bulk frontiers (backfill / re-crawl mode):
    a DataFrame with a ``url`` column becomes wave-0, never routed through
    the driver. All seeds share seed_order 0 — ordering falls through to the
    canon_url tiebreak, still a pure function of data."""
    return _finish(
        seeds.select(
            "url",
            F.lit(0).cast("long").alias("seed_order"),
            F.lit(0).alias("stage"),
            F.lit(1).alias("page"),
            F.lit(priority).alias("priority"),
        )
    )
