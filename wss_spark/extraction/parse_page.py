"""Vectorized extraction stage: pages(html) → typed entity rows.

One Arrow-batched ``mapInArrow`` pass parses each fetched page exactly once
and emits a *tall* unified result (one row per extracted entity + one
``kind='page'`` row carrying page-level metadata and the canonical extracted
``text``). Downstream stages slice it declaratively by ``kind`` — Catalyst
prunes the unused columns per consumer.

This replaces the reference's per-page imperative parse loops
(`独立版/WeiboDeepAnalyzer.py:308-428,432-544`) with the engine's UDTF-shaped
Arrow-UDF pattern (SURVEY.md §2.10). No per-row Python UDFs: the only Python
boundary is this one mapInArrow, per the BASELINE.json input_hint.

Why mapInArrow, not mapInPandas: the stage is memory-bandwidth-bound at high
core counts (BASELINE.md r01 measured 0.34 single-box 8→32 scaling). The
pandas path costs two extra full materializations per batch on each side
(Arrow→pandas object blocks on input, pandas→Arrow on output, both via
per-cell PyObject shuffling in the block manager); building pyarrow arrays
straight from the parser's row lists removes both copies and most of the
intermediate allocation churn.
"""

from __future__ import annotations

from datetime import datetime
from typing import Iterator

import pyarrow as pa
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
        StructField("cursor", StringType(), True),  # max_id continuation (S5)
        StructField("publish_place", StringType(), True),  # search-hit place
        StructField("publisher_href", StringType(), True),  # J2 dim link
    ]
)

_COLS = [f.name for f in PARSED.fields]
_IDX = {name: i for i, name in enumerate(_COLS)}
_I_URL, _I_KIND, _I_ROOT, _I_PAGE = (_IDX["url"], _IDX["kind"], _IDX["root_id"], _IDX["page"])

# Arrow types per PARSED column (mapInArrow output batches must match the
# Spark schema exactly: Integer→int32, Boolean→bool, Array<String>→list)
_PA_TYPES = {
    "url": pa.string(), "kind": pa.string(), "root_id": pa.string(),
    "page": pa.int32(), "block_index": pa.int32(), "entity_id": pa.string(),
    "user_id": pa.string(), "user_name": pa.string(), "content": pa.string(),
    "like_count": pa.int32(), "publish_time": pa.string(),
    "is_hot": pa.bool_(), "publish_source": pa.string(),
    "repost_count": pa.int32(), "comment_count": pa.int32(),
    "total_comment_pages": pa.int32(), "fulltext_href": pa.string(),
    "album_href": pa.string(), "images": pa.list_(pa.string()),
    "gender": pa.string(), "location": pa.string(),
    "followers_num": pa.int32(), "weibo_num": pa.int32(),
    "following_num": pa.int32(), "n_blocks": pa.int32(),
    "text": pa.string(), "is_origin": pa.bool_(),
    "cursor": pa.string(), "publish_place": pa.string(),
    "publisher_href": pa.string(),
}


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
    elif kind == "search":
        hits = kernel.extract_search_from_page(root, now)
        for h in hits:
            out.append(
                mk(
                    "search",
                    entity_id=h["wid"],
                    user_id=h["publisher_uid"],
                    publisher_href=h["publisher_href"],
                    content=h["content"],
                    like_count=h["like_count"],
                    repost_count=h["forward_count"],
                    comment_count=h["comment_count"],
                    publish_time=h["publish_time"],
                    publish_source=h["publish_tool"],
                    publish_place=h["publish_place"],
                    album_href=h["album_href"],
                    is_origin=h["is_origin"],
                    block_index=h["block_index"],
                )
            )
            text_parts.append(h["content"])
        n_blocks = len(hits)
    elif kind == "article":
        t = kernel.extract_article_text(root)
        out.append(mk("article", entity_id=rid, content=t, block_index=0))
        text_parts = [t] if t else []
        n_blocks = 1 if t else 0
    elif kind == "usersearch":
        uid = kernel.extract_first_user_hit(root)
        out.append(mk("usersearch", entity_id=uid, user_name=rid, block_index=0))
        n_blocks = 0 if uid == "-1" else 1
    elif kind == "api_comments":
        parsed_api = kernel.parse_api_comments(html)
        for j, c in enumerate(parsed_api["comments"]):
            out.append(
                mk(
                    "api_comment",
                    entity_id=c["wid"],
                    user_id=c["uid"],
                    user_name=c["username"],
                    content=c["text"],
                    like_count=c["like_count"],
                    publish_time=c["time"],
                    gender=c["gender"],
                    followers_num=c["followed"],
                    following_num=c["following"],
                    block_index=j,
                )
            )
            text_parts.append(c["text"])
        n_blocks = len(parsed_api["comments"])
        out.append(
            mk("page", n_blocks=n_blocks, text="\n".join(text_parts),
               cursor=parsed_api["max_id"])
        )
        return out
    elif kind == "supertopic":
        st = kernel.parse_supertopic(html)
        for j, p in enumerate(st["photos"]):
            out.append(
                mk(
                    "supertopic_photo",
                    entity_id=p["mid"],
                    user_id=p["uid"],
                    images=[p["pic_url"]],
                    block_index=j,
                )
            )
        n_blocks = len(st["photos"])
        out.append(mk("page", n_blocks=n_blocks, text="", cursor=st["since_id"]))
        return out
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


def parse_pages(pages: DataFrame, now: datetime = ANCHOR,
                passthrough: list[str] | None = None) -> DataFrame:
    """pages(url, html, ...) → tall PARSED DataFrame (one Arrow pass).

    ``passthrough`` names extra input columns (e.g. ``warc_ts`` for
    streaming event-time) to replicate onto every output row of their page —
    carried as Arrow ``take`` on the original arrays, so any type rides
    through with zero Python-object conversion.
    """
    extra = list(passthrough or [])
    cols = pages.select("url", "html", *extra)
    out_schema = StructType(
        PARSED.fields + [pages.schema[c] for c in extra]
    ) if extra else PARSED

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        names = _COLS + extra
        for batch in batches:
            urls = batch.column(0).to_pylist()
            htmls = batch.column(1).to_pylist()
            rows: list[list] = []
            src_idx: list[int] = []  # output row → input row (passthrough take)
            for i, (url, html) in enumerate(zip(urls, htmls)):
                page_rows = _rows_for_page(url, html, now)
                rows.extend(page_rows)
                if extra:
                    src_idx.extend([i] * len(page_rows))
            # columnar assembly: transpose position-aligned row lists straight
            # into pyarrow arrays (no pandas block manager in the path)
            if rows:
                cols_data = list(zip(*rows))
                arrays = [
                    pa.array(cols_data[i], type=_PA_TYPES[name])
                    for i, name in enumerate(_COLS)
                ]
            else:
                arrays = [pa.array([], type=_PA_TYPES[name]) for name in _COLS]
            if extra:
                take = pa.array(src_idx, type=pa.int32())
                arrays += [
                    batch.column(2 + j).take(take) for j in range(len(extra))
                ]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return cols.mapInArrow(run, schema=out_schema)


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


def extract_search_hits(parsed: DataFrame, only_origin: bool = False) -> DataFrame:
    """Topic-search rows (`独立版/WeiboTopicScrapy.py:352-386`); P3
    ``only_origin`` is the spider's filter=1 mode (`:356`)."""
    df = parsed.filter(F.col("kind") == "search")
    if only_origin:
        df = df.filter(F.col("is_origin"))
    return df.select(
        F.col("root_id").alias("keyword"),
        "page",
        "block_index",
        F.col("entity_id").alias("wid"),
        F.col("user_id").alias("publisher_uid"),
        "publisher_href",
        "is_origin",
        "content",
        "publish_place",
        "publish_time",
        F.col("publish_source").alias("publish_tool"),
        F.col("like_count").alias("up_num"),
        F.col("repost_count").alias("retweet_num"),
        F.col("comment_count").alias("comment_num"),
        "album_href",
    )


def enrich_search_hits(parsed: DataFrame, users: DataFrame) -> DataFrame:
    """J2 — publisher-profile enrichment as a broadcast join against the
    user dim, replacing the reference's per-hit publisher-page fetch
    (`独立版/WeiboTopicScrapy.py:332-349` → columns 发布者昵称/性别/地区/
    关注数/粉丝数 of `:392-405`)."""
    dim = users.select(
        F.col("uid").alias("publisher_uid"),
        F.col("nickname").alias("publisher_name"),
        F.col("gender").alias("publisher_sex"),
        F.col("location").alias("publisher_province"),
        F.col("following_num").alias("publisher_following"),
        F.col("followers_num").alias("publisher_followed"),
    )
    return extract_search_hits(parsed).join(
        F.broadcast(dim), "publisher_uid", "left"
    )


def extract_articles(parsed: DataFrame) -> DataFrame:
    """Article `<p>`-walk rows (`独立版/WeiboComPostSpider.py:114-137`)."""
    return parsed.filter(F.col("kind") == "article").select(
        F.col("entity_id").alias("article_id"),
        F.col("content").alias("article_text"),
        "url",
    )


def extract_api_comments(parsed: DataFrame) -> DataFrame:
    """max_id-cursor API comment rows
    (`独立版/WeiboSuperCommentScrapy.py:353-374` info_parser fields; raw
    ``created_at`` kept verbatim like the reference's CSV)."""
    return parsed.filter(F.col("kind") == "api_comment").select(
        F.col("root_id").alias("weibo_id"),
        "page",
        "block_index",
        F.col("entity_id").alias("wid"),
        F.col("publish_time").alias("time"),
        F.col("content").alias("text"),
        F.col("user_id").alias("uid"),
        "like_count",
        F.col("user_name").alias("username"),
        F.col("following_num").alias("following"),
        F.col("followers_num").alias("followed"),
        "gender",
    )


def extract_user_hits(parsed: DataFrame) -> DataFrame:
    """Name→uid resolution rows (`独立版/SearchUser.py:14-21`): first search
    hit per name; uid '-1' = no hit."""
    return parsed.filter(F.col("kind") == "usersearch").select(
        F.col("user_name").alias("query_name"),
        F.col("entity_id").alias("uid"),
        F.format_string("https://weibo.com/u/%s", F.col("entity_id")).alias("user_link"),
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
