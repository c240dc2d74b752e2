"""All engine schemas as explicit StructTypes.

The reference keeps schemas implicit in hard-coded CSV header lists (e.g.
`独立版/(using)WeiboUserScrapy.py:461-474`, `独立版/WeiboDeepAnalyzer.py:643-669`);
here every table is a fixed StructType so Catalyst can prune/push down.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Primary input table (BASELINE.json input_hint): Common-Crawl-style pages.
# `text` is the oracle column holding the expected byte-identical extraction.
# ---------------------------------------------------------------------------
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Crawl-state tables (engine-owned; FIXTURES.md §2)
# ---------------------------------------------------------------------------
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("canon_url", StringType(), False),
        StructField("host", StringType(), False),
        # deterministic ordering keys: (seed_order, stage, page) — reproduces
        # the reference's "targets in config order, stages in program order,
        # pages ascending" visit order (SURVEY.md §2.6 O4).
        StructField("seed_order", LongType(), False),
        StructField("stage", IntegerType(), False),
        StructField("page", IntegerType(), False),
        StructField("priority", DoubleType(), False),
        StructField("wave", IntegerType(), False),
        StructField("root_wid", StringType(), True),
    ]
)

SEEN_URLS = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("url_hash", LongType(), False),
        StructField("canon_url", StringType(), False),
    ]
)

BLOOM_STATE = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("bitmap", BinaryType(), False),
        StructField("count", LongType(), False),
    ]
)

# cuckoo-filter variant of the seen prefilter (crawl/cuckoo.py): per-bucket
# fingerprint table + overflow stash; deletable, unlike the bloom bitmap
CUCKOO_STATE = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("table", BinaryType(), False),
        StructField("stash", BinaryType(), False),
        StructField("count", LongType(), False),
    ]
)

ROBOTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("path_prefix", StringType(), False),
        StructField("allowed", BooleanType(), False),
        StructField("crawl_delay", IntegerType(), True),
    ]
)

FETCH_LOG = StructType(
    [
        StructField("url", StringType(), False),
        StructField("canon_url", StringType(), False),
        StructField("host", StringType(), False),
        StructField("wave", IntegerType(), False),
        StructField("rank_in_wave", IntegerType(), False),
        StructField("status", IntegerType(), False),
        StructField("fetched_at", TimestampType(), True),
        StructField("partition_id", IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Entity outputs of extraction (FIXTURES.md §3; golden-comparable)
# ---------------------------------------------------------------------------
COMMENT = StructType(
    [
        StructField("root_wid", StringType(), False),
        StructField("page", IntegerType(), False),
        StructField("block_index", IntegerType(), False),  # DOM order (O4)
        StructField("comment_id", StringType(), True),
        StructField("commenter_id", StringType(), True),
        StructField("commenter_name", StringType(), True),
        StructField("content", StringType(), True),
        StructField("like_count", IntegerType(), True),
        StructField("publish_time", StringType(), True),
        StructField("is_hot", BooleanType(), True),
    ]
)

REPOST = StructType(
    [
        StructField("root_wid", StringType(), False),
        StructField("page", IntegerType(), False),
        StructField("block_index", IntegerType(), False),
        StructField("user_id", StringType(), True),
        StructField("user_name", StringType(), True),
        StructField("content", StringType(), True),
        StructField("like_count", IntegerType(), True),
        StructField("publish_time", StringType(), True),
    ]
)

WEIBO = StructType(
    [
        StructField("wid", StringType(), False),
        StructField("weibo_id", StringType(), True),
        StructField("user_id", StringType(), True),
        StructField("user_name", StringType(), True),
        StructField("content", StringType(), True),
        StructField("images", ArrayType(StringType()), True),
        StructField("image_count", IntegerType(), True),
        StructField("publish_time", StringType(), True),
        StructField("publish_source", StringType(), True),
        StructField("like_count", IntegerType(), True),
        StructField("repost_count", IntegerType(), True),
        StructField("comment_count", IntegerType(), True),
        StructField("weibo_url", StringType(), True),
        StructField("total_comment_pages", IntegerType(), True),
    ]
)

USER = StructType(
    [
        StructField("uid", StringType(), False),
        StructField("nickname", StringType(), True),
        StructField("gender", StringType(), True),
        StructField("location", StringType(), True),
        StructField("followers_num", IntegerType(), True),
        StructField("weibo_num", IntegerType(), True),
        StructField("following_num", IntegerType(), True),
    ]
)

# Per-page extraction result (what the extract UDF emits before explode):
PAGE_KIND_WEIBO = 0
PAGE_KIND_COMMENTS = 1
PAGE_KIND_REPOSTS = 2
PAGE_KIND_OTHER = 3
