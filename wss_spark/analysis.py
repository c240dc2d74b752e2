"""The reference's flagship analysis pipeline as a library API.

``deep_analyze`` mirrors ``WeiboDeepAnalyzer.analyze()``
(`独立版/WeiboDeepAnalyzer.py:693-736`): content → comments → reposts →
stats → export, but distributed — the per-page fetch loop becomes one crawl
(or a direct parse of a pages table) and every per-list Python aggregation
becomes a DataFrame plan. ``enrich_comments_with_users`` is the J1
commenter-profile lookup join (`独立版/WeiboCommentScrapy.py:102-120`): the
reference fetches every commenter's profile page N+1-style; here the user
dim extracted from /info pages joins broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wss_spark import export as export_mod
from wss_spark.extraction.parse_page import (
    enrich_weibo,
    extract_comments,
    extract_reposts,
    extract_users,
    parse_pages,
)


def add_user_links(df: DataFrame, mapping: DataFrame,
                   name_col: str = "user_name",
                   link_col: str = "user_link",
                   finish_col: str = "finish") -> DataFrame:
    """J6 — name→uid resolution with finish-column work skipping, the
    distributed `独立版/SearchUser.py:63-92` (dfAddUserLink): rows already
    marked ``finish`` keep their link untouched; unresolved rows left-join
    the name→uid mapping (built from user-search pages) and are marked done.
    A name with no hit resolves to uid -1 — the reference writes
    ``https://weibo.com/u/-1`` too (`:80-88`). Its 3-consecutive-miss cookie
    bailout is operational pacing, not dataflow, and has no engine analog.

    ADVICE r02 hardening: an existing ``link_col`` is never blanked when only
    ``finish_col`` is missing, and the mapping is deduped to first-hit-per-
    name (the reference takes the first search hit, `SearchUser.py:72-79`)
    so a unioned multi-run mapping cannot fan todo rows out.
    """
    if finish_col not in df.columns:
        df = df.withColumn(finish_col, F.lit(False))
        if link_col not in df.columns:
            df = df.withColumn(link_col, F.lit(""))
    done = df.filter(F.col(finish_col))
    todo = df.filter(~F.col(finish_col)).drop(link_col)
    # one row per name: a real hit always beats a '-1' miss (a unioned
    # multi-run mapping can carry both — run 1 missed, run 2 hit), and among
    # real hits the numerically smallest uid is the deterministic pick
    # (string min would order '-1' < '5…' and '10…' < '9…')
    m = (
        mapping.groupBy("query_name")
        .agg(
            F.min(
                F.when(F.col("uid") != "-1", F.col("uid").cast("long"))
            ).alias("_hit")
        )
        .select(
            F.col("query_name").alias(name_col),
            F.coalesce(F.col("_hit").cast("string"), F.lit("-1")).alias("_uid"),
        )
    )
    resolved = (
        todo.join(F.broadcast(m), name_col, "left")
        .withColumn(
            link_col,
            F.format_string(
                "https://weibo.com/u/%s", F.coalesce(F.col("_uid"), F.lit("-1"))
            ),
        )
        .withColumn(finish_col, F.lit(True))
        .drop("_uid")
    )
    return done.unionByName(resolved.select(*done.columns))


# json.dumps key order of the reference's profile dict
# (`独立版/WeiboUserInfoSpider.py:106-115`); ``user_link`` is appended after
# (`:146`), so it renders last.
USER_INFO_FIELDS = [
    "sunshine_credit_level", "school", "location", "gender",
    "birthday", "created_at", "description", "followers_num",
]


def add_user_info(df: DataFrame, profiles: DataFrame, user_col: str,
                  user_info_col: str = "user_info") -> DataFrame:
    """J5/F14 — the ``user_info`` JSON-in-a-cell enrichment with
    ``init``-sentinel work skipping, the distributed
    `独立版/WeiboUserInfoSpider.py:122-153` (dfAddUserInfo):

    - a missing ``user_info`` column is initialized to the ``'init'``
      sentinel (`:130-133`);
    - rows whose cell is NOT ``'init'`` are already enriched and skipped
      untouched (`:137-139`, the work-skip that makes re-runs incremental);
    - the uid is cut from the user-link column — strip from the last ``?``,
      then take the segment after the last ``/`` (`:141-143`);
    - the reference's per-row profile fetch becomes a broadcast join against
      a profiles dim table (uid → the 8 detail fields of `:106-115`);
    - the cell is ``to_json(struct(...))`` in the reference's exact
      ``json.dumps`` key order with nulls KEPT (``ignoreNullFields=false``
      ⇔ ``json.dumps`` renders ``None`` as ``null``), ``user_link`` last
      (`:146-148`);
    - a banned/deleted uid (the HTTP-400 branch, `:76-81`) renders the
      ``errorMsg`` cell instead; a uid with no profile row keeps ``'init'``
      (the reference breaks and retries later — same rerun semantics).
    """
    if user_info_col not in df.columns:
        df = df.withColumn(user_info_col, F.lit("init"))
    else:
        # a NULL cell means never-enriched: treat as 'init' (the reference's
        # fillna-then-retry path, `:130-133`) — a plain != / == split would
        # satisfy neither side and silently drop the row
        df = df.withColumn(
            user_info_col, F.coalesce(F.col(user_info_col), F.lit("init"))
        )
    done = df.filter(F.col(user_info_col) != "init")
    todo = df.filter(F.col(user_info_col) == "init")

    link_stripped = F.substring_index(F.col(user_col), "?", 1)
    dim_cols = [c for c in USER_INFO_FIELDS if c in profiles.columns]
    dim = profiles.select(
        F.col("uid").alias("_uid"),
        F.lit(True).alias("_hit"),
        (F.col("banned") if "banned" in profiles.columns else F.lit(False)).alias("_banned"),
        *dim_cols,
    )
    joined = todo.withColumn(
        "_uid", F.substring_index(link_stripped, "/", -1)
    ).join(F.broadcast(dim), "_uid", "left")

    ok_cell = F.to_json(
        F.struct(*[F.col(c) for c in dim_cols], link_stripped.alias("user_link")),
        {"ignoreNullFields": "false"},
    )
    banned_cell = F.to_json(
        F.struct(
            F.lit("用户可能注销或者封号").alias("errorMsg"),
            F.lit(None).cast("string").alias("location"),
            F.concat(F.lit("https://weibo.com/"), F.col("_uid")).alias("user_link"),
        ),
        {"ignoreNullFields": "false"},
    )
    enriched = joined.withColumn(
        user_info_col,
        F.when(F.col("_banned"), banned_cell)
        .when(F.col("_hit"), ok_cell)
        .otherwise(F.lit("init")),
    ).drop("_uid", "_hit", "_banned", *dim_cols)
    return done.unionByName(enriched.select(*done.columns))


def enrich_comments_with_users(comments: DataFrame, users: DataFrame) -> DataFrame:
    """J1: per-commenter profile enrichment as a broadcast join — replaces
    the reference's per-comment profile fetch (N+1 → 1 join). Output mirrors
    the legacy comment spider's columns (FIXTURES.md §3.2)."""
    dim = users.select(
        F.col("uid"),
        F.col("nickname"),
        F.col("gender").alias("sex"),
        F.col("location"),
        F.col("weibo_num"),
        F.col("following_num"),
        F.col("followers_num"),
    )
    return (
        comments.join(F.broadcast(dim), comments["commenter_id"] == dim["uid"], "left")
        .select(
            "root_wid",
            "page",
            "block_index",
            "comment_id",
            "commenter_id",
            "commenter_name",
            "nickname",
            "sex",
            "location",
            "weibo_num",
            "following_num",
            "followers_num",
            "content",
            F.col("like_count").alias("praised_num"),
            "publish_time",
        )
    )


def collect_image_urls(parsed: DataFrame) -> DataFrame:
    """Distinct large-image URLs referenced by a crawl's extracted entities:
    explode every ``images`` array (timeline posts, search hits, albums) and
    rewrite thumb/wap variants to the full-size form (F9,
    `独立版/(using)WeiboUserScrapy.py:360-363`). One narrow column out —
    ready for the download post-pass or an images-frontier seed list."""
    from wss_spark.functions.text import large_image_url

    return (
        parsed.select(F.explode("images").alias("_img"))
        .select(large_image_url("_img").alias("url"))
        .distinct()
    )


def download_images(parsed: DataFrame, images: DataFrame, out_dir: str,
                    already: DataFrame | None = None) -> int:
    """The image-download post-pass over a crawl's entities — the distributed
    ``get_weibo_img`` (`独立版/(using)WeiboUserScrapy.py:569-591`): gather the
    entity-referenced image urls (:func:`collect_image_urls`), join payloads
    from the fetched-media table ``images(url, payload)`` (the warehouse
    stand-in for the reference's per-url HTTP GET, exactly like the crawl's
    pages join), and write content-addressed files via
    :func:`wss_spark.operators.multimodal.binary_file_sink` — md5-named,
    skip-if-exists, payloads never through the driver. ``already`` is the
    downloaded-set anti-join (the reference's os.path.isfile check, `:577`).
    Returns the number of new files written."""
    from wss_spark.operators.multimodal import binary_file_sink

    wanted = collect_image_urls(parsed)
    media = wanted.join(images.select("url", "payload"), on="url", how="inner")
    return binary_file_sink(media, out_dir, already=already)


def deep_analyze(pages: DataFrame, wid: str | None = None,
                 export_dir: str | None = None) -> dict:
    """Full deep-analysis over a pages table (optionally for one ``wid``).

    Returns {"weibo", "comments", "reposts", "users", "comments_enriched",
    "stats"}; when ``export_dir`` is set, also writes the reference-shaped
    golden outputs (CSVs + complete.json) there.
    """
    parsed = parse_pages(pages)
    weibo = enrich_weibo(parsed)
    comments = extract_comments(parsed)
    reposts = extract_reposts(parsed)
    users = extract_users(parsed)
    if wid is not None:
        weibo = weibo.filter(F.col("wid") == wid)
        comments = comments.filter(F.col("root_wid") == wid)
        reposts = reposts.filter(F.col("root_wid") == wid)

    result = {
        "weibo": weibo,
        "comments": comments,
        "reposts": reposts,
        "users": users,
        "comments_enriched": enrich_comments_with_users(comments, users),
        "stats": None,
    }
    if export_dir is not None:
        prefix = wid or "all"
        export_mod.export_weibo_csv(weibo, f"{export_dir}/{prefix}_weibo.csv")
        export_mod.export_comments_csv(comments, f"{export_dir}/{prefix}_comments.csv")
        export_mod.export_reposts_csv(reposts, f"{export_dir}/{prefix}_reposts.csv")
        result["stats"] = export_mod.export_complete_json(
            weibo, comments, reposts, f"{export_dir}/{prefix}_complete.json"
        )["stats"]
    else:
        result["stats"] = export_mod.compute_stats(comments, reposts)
    return result
