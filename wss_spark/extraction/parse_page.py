"""Vectorized extraction stage: pages(html) → typed entity rows.

One Arrow-batched ``mapInPandas`` pass parses each fetched page exactly once
and emits a *tall* unified result (one row per extracted entity + one
``kind='page'`` row carrying page-level metadata and the canonical extracted
``text``). Downstream stages slice it declaratively by ``kind`` — Catalyst
prunes the unused columns per consumer.

This replaces the reference's per-page imperative parse loops
(`独立版/WeiboDeepAnalyzer.py:308-428,432-544`) with the engine's UDTF-shaped
pandas-UDF pattern (SURVEY.md §2.10). No per-row Python UDFs: the only Python
boundary is this one mapInPandas, per the BASELINE.json input_hint.
"""

from __future__ import annotations

from datetime import datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from wss_spark.extraction import kernel
from wss_spark.extraction.kernel import ANCHOR

PARSED = StructType(
    [
        StructField("url", StringType(), False),
        StructField("kind", StringType(), False),  # page|weibo|comment|repost|user|album
        StructField("root_id", StringType(), True),  # wid (or uid for user)
        StructField("page", IntegerType(), True),
        StructField("block_index", IntegerType(), True),
        StructField("entity_id", StringType(), True),
        StructField("user_id", StringType(), True),
        StructField("user_name", StringType(), True),
        StructField("content", StringType(), True),
        StructField("like_count", IntegerType(), True),
        StructField("publish_time", StringType(), True),
        StructField("is_hot", BooleanType(), True),
        StructField("publish_source", StringType(), True),
        StructField("repost_count", IntegerType(), True),
        StructField("comment_count", IntegerType(), True),
        StructField("total_comment_pages", IntegerType(), True),
        StructField("fulltext_href", StringType(), True),
        StructField("album_href", StringType(), True),
        StructField("images", ArrayType(StringType()), True),
        StructField("gender", StringType(), True),
        StructField("location", StringType(), True),
        StructField("followers_num", IntegerType(), True),
        StructField("weibo_num", IntegerType(), True),
        StructField("following_num", IntegerType(), True),
        StructField("n_blocks", IntegerType(), True),  # repost stop-condition input
        StructField("text", StringType(), True),  # canonical page text (kind='page')
        StructField("is_origin", BooleanType(), True),  # timeline P3 flag
    ]
)

_COLS = [f.name for f in PARSED.fields]
_IDX = {name: i for i, name in enumerate(_COLS)}
_I_URL, _I_KIND, _I_ROOT, _I_PAGE = (_IDX["url"], _IDX["kind"], _IDX["root_id"], _IDX["page"])


def _rows_for_page(url: str, html, now: datetime) -> list[list]:
    """One fetched page → positional PARSED rows (lists in _COLS order —
    pandas builds a frame from position-aligned lists ~3x faster than from
    per-row dicts, which matters at millions of pages per stage)."""
    root = kernel.parse_html(html)
    kind, rid, page = kernel.classify_url(url)
    ncols = len(_COLS)

    def mk(kind_val: str, **kw) -> list:
        row = [None] * ncols
        row[_I_URL] = url
        row[_I_KIND] = kind_val
        row[_I_ROOT] = rid
        row[_I_PAGE] = page
        for k, v in kw.items():
            row[_IDX[k]] = v
        return row

    out: list[list] = []
    text_parts: list[str] = []

    if kind == "comment":
        w = kernel.extract_weibo_from_page(root, now, rid or "")
        if w is not None and page == 1:
            out.append(
                mk(
                    "weibo",
                    entity_id=w["weibo_id"],
                    user_id=w["user_id"],
                    user_name=w["user_name"],
                    content=w["content"],
                    like_count=w["like_count"],
                    publish_time=w["publish_time"],
                    publish_source=w["publish_source"],
                    repost_count=w["repost_count"],
                    comment_count=w["comment_count"],
                    total_comment_pages=w["total_comment_pages"],
                    fulltext_href=w["fulltext_href"],
                    album_href=w["album_href"],
                    block_index=0,
                )
            )
            if w["content"]:
                text_parts.append(w["content"])
        comments = kernel.extract_comments_from_page(root, now)
        for c in comments:
            out.append(
                mk(
                    "comment",
                    entity_id=c["comment_id"],
                    user_id=c["commenter_id"],
                    user_name=c["commenter_name"],
                    content=c["content"],
                    like_count=c["like_count"],
                    publish_time=c["publish_time"],
                    is_hot=c["is_hot"],
                    block_index=c["block_index"],
                )
            )
            if not c["is_hot"]:
                text_parts.append(c["content"])
        n_blocks = len(comments)
    elif kind == "repost":
        reposts = kernel.extract_reposts_from_page(root, now)
        for r in reposts:
            out.append(
                mk(
                    "repost",
                    user_id=r["user_id"],
                    user_name=r["user_name"],
                    content=r["content"],
                    like_count=r["like_count"],
                    publish_time=r["publish_time"],
                    block_index=r["block_index"],
                )
            )
            text_parts.append(r["content"])
        n_blocks = len(reposts)
    elif kind == "profile":
        posts = kernel.extract_timeline_from_page(root, now)
        for p in posts:
            out.append(
                mk(
                    "timeline",
                    entity_id=p["wid"],
                    content=p["content"],
                    like_count=p["like_count"],
                    repost_count=p["forward_count"],
                    comment_count=p["comment_count"],
                    publish_time=p["publish_time"],
                    publish_source=p["publish_tool"],
                    images=p["images"],
                    album_href=p["album_href"],
                    is_origin=p["is_origin"],
                    block_index=p["block_index"],
                )
            )
            text_parts.append(p["content"])
        n_blocks = len(posts)
    elif kind == "album":
        imgs = kernel.extract_album_images(root)
        out.append(mk("album", images=imgs))
        n_blocks = len(imgs)
    elif kind == "info":
        u = kernel.extract_user_from_page(root, rid or "")
        out.append(
            mk(
                "user",
                entity_id=u["uid"],
                user_id=u["uid"],
                user_name=u["nickname"],
                gender=u["gender"],
                location=u["location"],
                followers_num=u["followers_num"],
                weibo_num=u["weibo_num"],
                following_num=u["following_num"],
            )
        )
        n_blocks = 1
        body = root.first("body")
        t = kernel.clean_text(body.string() if body is not None else "")
        text_parts = [t] if t else []
    else:
        body = root.first("body")
        t = kernel.clean_text(body.string() if body is not None else "")
        text_parts = [t] if t else []
        n_blocks = 0

    out.append(mk("page", n_blocks=n_blocks, text="\n".join(text_parts)))
    return out


def parse_pages(pages: DataFrame, now: datetime = ANCHOR) -> DataFrame:
    """pages(url, html, ...) → tall PARSED DataFrame (one Arrow pass)."""
    cols = pages.select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[list] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                rows.extend(_rows_for_page(url, html, now))
            # column-wise assembly: zip(*rows) transposes position-aligned
            # lists straight into pandas columns (no per-row dict resolution)
            if rows:
                cols_data = list(zip(*rows))
                yield pd.DataFrame(
                    {name: cols_data[i] for i, name in enumerate(_COLS)},
                    columns=_COLS,
                )
            else:
                yield pd.DataFrame(columns=_COLS)

    return cols.mapInPandas(run, schema=PARSED)


# ---------------------------------------------------------------------------
# typed entity views over the tall result
# ---------------------------------------------------------------------------


def extract_text(pages: DataFrame, now: datetime = ANCHOR) -> DataFrame:
    """url → canonical extracted text (the north-star html→text stage)."""
    return (
        parse_pages(pages, now)
        .filter(F.col("kind") == "page")
        .select("url", F.col("text").alias("extracted_text"))
    )


def extract_comments(parsed: DataFrame, drop_hot: bool = True) -> DataFrame:
    df = parsed.filter(F.col("kind") == "comment")
    if drop_hot:
        df = df.filter(~F.col("is_hot"))  # P5 hot-comment skip
    return df.select(
        F.col("root_id").alias("root_wid"),
        "page",
        "block_index",
        F.col("entity_id").alias("comment_id"),
        F.col("user_id").alias("commenter_id"),
        F.col("user_name").alias("commenter_name"),
        "content",
        "like_count",
        "publish_time",
        "is_hot",
    )


def extract_reposts(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("kind") == "repost").select(
        F.col("root_id").alias("root_wid"),
        "page",
        "block_index",
        "user_id",
        "user_name",
        "content",
        "like_count",
        "publish_time",
    )


def extract_weibo(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("kind") == "weibo").select(
        F.col("root_id").alias("wid"),
        F.col("entity_id").alias("weibo_id"),
        "user_id",
        "user_name",
        "content",
        "publish_time",
        "publish_source",
        "like_count",
        "repost_count",
        "comment_count",
        "total_comment_pages",
        "fulltext_href",
        "album_href",
        # the post's canonical link (`独立版/WeiboDeepAnalyzer.py:299`): the
        # main page url sans query
        F.regexp_replace(F.col("url"), r"\?.*$", "").alias("weibo_url"),
    )


def extract_users(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("kind") == "user").select(
        F.col("entity_id").alias("uid"),
        F.col("user_name").alias("nickname"),
        "gender",
        "location",
        "followers_num",
        "weibo_num",
        "following_num",
    )


def extract_timeline(parsed: DataFrame, only_origin: bool = False) -> DataFrame:
    """User-timeline rows (FIXTURES.md §3.5). ``only_origin`` is the
    reference's filter=1 mode (P3, `独立版/(using)WeiboUserScrapy.py:403`)."""
    df = parsed.filter(F.col("kind") == "timeline")
    if only_origin:
        df = df.filter(F.col("is_origin"))
    host = F.regexp_extract(F.col("url"), r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    uid = F.col("root_id")
    return df.select(
        F.col("entity_id").alias("wid"),
        uid.alias("uid"),
        "page",
        "block_index",
        F.format_string("https://%s/comment/%s", host, F.col("entity_id")).alias("weibo_link"),
        "content",
        F.coalesce(F.col("images"), F.array()).alias("img_urls"),
        "is_origin",
        "publish_time",
        F.col("publish_source").alias("publish_tool"),
        F.col("like_count").alias("like_num"),
        F.col("repost_count").alias("forward_num"),
        F.col("comment_count").alias("comment_num"),
        "album_href",
    )


def extract_albums(parsed: DataFrame) -> DataFrame:
    return parsed.filter(F.col("kind") == "album").select(
        F.col("root_id").alias("wid"), "images"
    )


def enrich_weibo(parsed: DataFrame) -> DataFrame:
    """J3 long-text expansion + J4 album expansion as joins.

    The reference re-fetches the ``ckAll=1`` page when a post is truncated and
    the picAll page when an album link exists
    (`独立版/(using)WeiboUserScrapy.py:176-191,351-369`); here both are plain
    equi-joins against the already-parsed pages — ``coalesce(full, truncated)``
    for content, ``collect``-free image arrays for albums.
    """
    from pyspark.sql import Window

    # one weibo row per wid: comment pages ?page=1 / ?ckAll=1 re-render the M
    # block, so prefer the main page's row (shortest url — no query string)
    w = Window.partitionBy("root_id").orderBy(F.length("url"), "url")
    weibo = extract_weibo(
        parsed.filter(F.col("kind") == "weibo")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    fulls = (
        parsed.filter((F.col("kind") == "page") & F.col("url").contains("ckAll=1"))
        .select(F.col("root_id").alias("wid"), F.col("text").alias("full_text"))
    )
    albums = extract_albums(parsed)
    return (
        weibo.join(fulls, "wid", "left")
        .join(albums, "wid", "left")
        .withColumn("content_full", F.coalesce("full_text", "content"))
        .withColumn(
            "image_count", F.coalesce(F.size("images"), F.lit(0))
        )
        .drop("full_text")
    )


def extract_entities(pages: DataFrame, now: datetime = ANCHOR) -> dict[str, DataFrame]:
    parsed = parse_pages(pages, now)
    return {
        "parsed": parsed,
        "weibo": extract_weibo(parsed),
        "comments": extract_comments(parsed),
        "reposts": extract_reposts(parsed),
        "users": extract_users(parsed),
        "albums": extract_albums(parsed),
    }
