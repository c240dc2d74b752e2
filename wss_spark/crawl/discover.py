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
  stage 6  search result page k+1 until empty (S6, `WeiboTopicScrapy.py:454-457`)
  stage 7  hotflow max_id cursor continuation (S5, `WeiboSuperCommentScrapy.py:375-389`)

Search hits also feed stage 2 (their picAll albums) and stage 5 (their
publishers' info pages — the J2 dim, replacing the reference's per-hit
publisher fetch `WeiboTopicScrapy.py:332-349`).

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


_CAND_T = "array<struct<stage:int,page:int,url:string>>"


def _cand(stage: int, page, url) -> F.Column:
    return F.struct(
        F.lit(stage).cast("int").alias("stage"),
        (F.lit(page) if isinstance(page, int) else page).cast("int").alias("page"),
        url.alias("url"),
    )


def _abs_href(href: F.Column, base_host: F.Column) -> F.Column:
    return F.when(href.startswith("http"), href).otherwise(
        F.concat(F.lit("https://"), base_host, href)
    )


def discover(parsed: DataFrame) -> DataFrame:
    """New frontier candidates from one wave's parse results — ONE pass.

    ``parsed``: tall PARSED rows of this wave, carrying frontier lineage
    (``seed_order``, ``priority``, ``_src_page``) as extraction passthrough
    columns. Every discovery rule is a conditional element of a per-row
    candidate array, so the whole expansion is a single scan of the persisted
    parsed frame + one explode. (The r01 design unioned ~10 filter branches,
    each re-scanning — and originally re-joining — the wave's parse output;
    at bulk-drain scale that multiplied the wave's dominant cost.)
    """
    base_host = host_of(F.col("url"))
    kind = F.col("kind")
    null_c = F.lit(None).cast("struct<stage:int,page:int,url:string>")

    # --- weibo rows: fulltext (1), album (2), comment pages (3), repost
    # page 1 (4), author info (5)
    weibo_fixed = F.array(
        F.when(F.col("fulltext_href").isNotNull(),
               _cand(1, 1, _abs_href(F.col("fulltext_href"), base_host))).otherwise(null_c),
        F.when(F.col("album_href").isNotNull(),
               _cand(2, 1, _abs_href(F.col("album_href"), base_host))).otherwise(null_c),
        _cand(4, 1, F.format_string("https://%s/repost/%s?page=1", base_host, F.col("root_id"))),
        F.when(F.col("user_id").isNotNull(),
               _cand(5, 1, F.format_string("https://%s/%s/info", base_host, F.col("user_id")))).otherwise(null_c),
    )
    comment_pages = F.when(
        F.col("total_comment_pages") >= 2,
        F.transform(
            F.sequence(F.lit(2), F.col("total_comment_pages")),
            lambda pg: _cand(
                3, pg,
                F.format_string("https://%s/comment/%s?page=%d", base_host, F.col("root_id"), pg),
            ),
        ),
    ).otherwise(F.array().cast(_CAND_T))

    # --- page rows: repost continuation (4), search next page (6), hotflow
    # cursor continuation (7)
    is_repost_page = F.col("url").rlike(r"^https?://[^/]+/repost/")
    is_search_page = F.col("url").rlike(r"^https?://[^/]+/search/mblog\?")
    is_hotflow_page = F.col("url").rlike(r"^https?://[^/]+/comments/hotflow\?")
    is_supertopic_page = F.col("url").rlike(r"^https?://[^/]+/p/aj/proxy\?")
    # search continuation keeps the FULL original query string (advanced
    # windows carry advancedfilter/starttime/endtime on every page,
    # `独立版/WeiboTopicScrapy.py:438-446`): increment the page param in
    # place, or append one if the seed URL had none.
    next_page_str = (F.col("page") + F.lit(1)).cast("string")
    search_next_url = F.when(
        F.col("url").rlike(r"[?&]page=\d+"),
        F.regexp_replace(
            F.col("url"), F.lit(r"([?&]page=)\d+"), F.concat(F.lit("$1"), next_page_str)
        ),
    ).otherwise(F.concat(F.col("url"), F.lit("&page="), next_page_str))
    supertopic_paged = F.regexp_replace(
        F.col("url"), F.lit(r"([?&]page=)\d+"), F.concat(F.lit("$1"), next_page_str)
    )
    supertopic_next_url = F.when(
        F.col("url").rlike(r"[?&]since_id=[^&]*"),
        F.regexp_replace(
            supertopic_paged,
            F.lit(r"([?&]since_id=)[^&]*"),
            F.concat(F.lit("$1"), F.col("cursor")),
        ),
    ).otherwise(F.concat(supertopic_paged, F.lit("&since_id="), F.col("cursor")))
    page_cands = F.array(
        F.when(is_repost_page & (F.col("n_blocks") > 0),
               _cand(4, F.col("page") + 1,
                     F.format_string("https://%s/repost/%s?page=%d",
                                     base_host, F.col("root_id"), F.col("page") + F.lit(1)))).otherwise(null_c),
        F.when(is_search_page & (F.col("n_blocks") > 0),
               _cand(6, F.col("page") + 1, search_next_url)).otherwise(null_c),
        F.when(is_hotflow_page & F.col("cursor").isNotNull() & (F.col("cursor") != "0"),
               _cand(7, F.col("_src_page") + 1,
                     F.format_string("https://%s/comments/hotflow?id=%s&mid=%s&max_id=%s&max_id_type=0",
                                     base_host, F.col("root_id"), F.col("root_id"), F.col("cursor")))).otherwise(null_c),
        # supertopic since_id feed chain (8): resend the same params with the
        # page incremented in place and since_id replaced/appended — the
        # reference reuses one params dict per request
        # (`独立版/WeiboSuperTopicActiveUserSpider.py:150-155`); an empty
        # album page (n_blocks=0) stops the chain (`:122-125`, T6)
        F.when(is_supertopic_page & (F.col("n_blocks") > 0) & F.col("cursor").isNotNull(),
               _cand(8, F.col("page") + 1, supertopic_next_url)).otherwise(null_c),
    )

    # --- search-hit rows: hit album (2), publisher info page (5, host from
    # the publisher href — the J2 dim source)
    search_cands = F.array(
        F.when(F.col("album_href").isNotNull(),
               _cand(2, 1, _abs_href(F.col("album_href"), base_host))).otherwise(null_c),
        F.when(F.col("user_id").isNotNull() & F.col("publisher_href").isNotNull(),
               _cand(5, 1, F.format_string("https://%s/%s/info",
                                           host_of(F.col("publisher_href")), F.col("user_id")))).otherwise(null_c),
    )

    cands = (
        F.when(kind == "weibo", F.concat(weibo_fixed, comment_pages))
        .when(kind == "page", page_cands)
        .when(kind == "search", search_cands)
        .otherwise(F.array().cast(_CAND_T))
    )
    out = (
        parsed.select(
            "seed_order", "priority",
            F.explode(F.filter(cands, lambda c: c.isNotNull())).alias("c"),
        )
        .select(
            F.col("c.url").alias("url"),
            "seed_order",
            F.col("c.stage").alias("stage"),
            F.col("c.page").alias("page"),
            "priority",
        )
    )
    return _finish(out)


def search_window_urls(spark, keyword: str, start_time: str, end_time: str,
                       host: str = "weibo.cn") -> DataFrame:
    """F17/F12 — advanced-search URL partitioning over a time range: one
    day-sliced window per row, with the topic spider's GMT+8 boundary shifts
    (start −8 h; end −1 day −7 h; `独立版/WeiboTopicScrapy.py:65-66,505-512`)
    applied as JVM INTERVAL arithmetic, and the advancedfilter URL of
    `:438-446`. Inputs are the spider's 'YYYY-mm-dd-HH' strings.

    A 30-year crawl window is only ~11 k rows — the windows frame broadcasts
    and each window seeds its own scan-until-empty search chain (stage 6).
    """
    to_ts = lambda s: F.to_timestamp(F.lit(s), "yyyy-M-d-H")  # noqa: E731
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.date_trunc("DAY", to_ts(start_time)),
                F.date_trunc("DAY", to_ts(end_time)),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    fmt = "yyyy-MM-dd-HH"
    win_start = F.date_format(
        F.col("day") + F.expr("INTERVAL -8 HOURS"), fmt
    )
    win_end = F.date_format(
        F.col("day") + F.expr("INTERVAL 1 DAY") + F.expr("INTERVAL -1 DAY -7 HOURS"),
        fmt,
    )
    return days.select(
        F.date_format("day", "yyyy-MM-dd").alias("window_day"),
        win_start.alias("starttime"),
        win_end.alias("endtime"),
        F.format_string(
            "https://%s/search/mblog?keyword=%s&advancedfilter=1"
            "&starttime=%s&endtime=%s&sort=time&page=1",
            F.lit(host), F.lit(keyword), win_start, win_end,
        ).alias("url"),
    )


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
    canon_url tiebreak, still a pure function of data.

    Contract (ADVICE r04 #2): this is a LAZY projection, and wave 0 has two
    consumers, so the caller's seed plan executes twice — it must be cheap
    and deterministic (a parquet projection is; a sample()/limit() is NOT:
    re-execution could admit a different set than the counted one). For an
    expensive or nondeterministic seed plan set
    ``CrawlConfig.materialize_seeds=True``, which eager-localCheckpoints
    wave 0 once instead."""
    return _finish(
        seeds.select(
            "url",
            F.lit(0).cast("long").alias("seed_order"),
            F.lit(0).alias("stage"),
            F.lit(1).alias("page"),
            F.lit(priority).alias("priority"),
        )
    )
