"""Golden-output export sinks: the reference's CSV/JSON renders, byte-shape
compatible.

The reference writes per-entity CSVs with Chinese headers in utf-8-sig and a
nested ``complete.json`` (`独立版/WeiboDeepAnalyzer.py:604-689`). These are
driver-side exports of small final results (the reference's own outputs are
per-target files) — the distributed path stays parquet; these renders exist
for golden-output comparison and user-facing parity.
"""

from __future__ import annotations

import csv
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wss_spark.operators.analytics import count_top_names

# CSV headers per the reference's writers (FIXTURES.md §3)
COMMENT_HEADERS = ["评论ID", "评论者ID", "评论者昵称", "评论内容", "点赞数", "发布时间"]
REPOST_HEADERS = ["用户ID", "用户昵称", "转发内容", "点赞数", "发布时间"]
WEIBO_HEADERS = [
    "微博ID", "用户昵称", "微博内容", "图片数量", "发布时间",
    "发布工具", "点赞数", "转发数", "评论数", "微博链接",
]


# Driver-side renders are for per-target golden files (the reference writes
# one CSV per crawl target). A full-corpus DataFrame pointed here by mistake
# would OOM the driver — fail fast instead (VERDICT r01 §wrong-5).
EXPORT_MAX_ROWS = 1_000_000


def _guard_size(df: DataFrame, what: str) -> None:
    n = df.limit(EXPORT_MAX_ROWS + 1).count()
    if n > EXPORT_MAX_ROWS:
        raise ValueError(
            f"{what}: refusing driver-side export of >{EXPORT_MAX_ROWS} rows "
            f"— these renders are per-target golden files; write parquet for "
            f"full-corpus results"
        )


def _write_csv(path: str, headers: list[str], rows: list[list]) -> None:
    """Header-once, utf-8-sig, the reference's CSV convention
    (`独立版/WeiboCommentScrapy.py:149-155`)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="", encoding="utf-8-sig") as f:
        w = csv.writer(f)
        w.writerow(headers)
        w.writerows(rows)


def export_comments_csv(comments: DataFrame, path: str) -> int:
    """Comments entity table → `{wid}_comments.csv` shape
    (`独立版/WeiboDeepAnalyzer.py:643-655`). Deterministic order:
    (page, block_index)."""
    _guard_size(comments, "export_comments_csv")
    rows = (
        comments.orderBy("page", "block_index")
        .select("comment_id", "commenter_id", "commenter_name", "content",
                "like_count", "publish_time")
        .collect()
    )
    _write_csv(path, COMMENT_HEADERS, [list(r) for r in rows])
    return len(rows)


def export_reposts_csv(reposts: DataFrame, path: str) -> int:
    """`独立版/WeiboDeepAnalyzer.py:658-669` shape."""
    _guard_size(reposts, "export_reposts_csv")
    rows = (
        reposts.orderBy("page", "block_index")
        .select("user_id", "user_name", "content", "like_count", "publish_time")
        .collect()
    )
    _write_csv(path, REPOST_HEADERS, [list(r) for r in rows])
    return len(rows)


def export_weibo_csv(weibo: DataFrame, path: str) -> int:
    """`独立版/WeiboDeepAnalyzer.py:625-640` shape; '无' placeholder for
    missing source (P8)."""
    _guard_size(weibo, "export_weibo_csv")
    rows = (
        weibo.orderBy("wid")
        .select(
            "wid",
            "user_name",
            "content",
            F.coalesce(F.col("image_count"), F.lit(0)).alias("image_count"),
            "publish_time",
            F.when(
                F.col("publish_source").isNull() | (F.col("publish_source") == ""),
                F.lit("无"),
            ).otherwise(F.col("publish_source")).alias("publish_source"),
            "like_count",
            "repost_count",
            "comment_count",
            "weibo_url",
        )
        .collect()
    )
    _write_csv(path, WEIBO_HEADERS, [list(r) for r in rows])
    return len(rows)


TIMELINE_HEADERS = [
    "id", "微博链接", "微博正文", "原始图片url", "是否原创", "发布时间",
    "发布工具", "点赞数", "转发数", "评论数",
]


def export_timeline_csv(timeline: DataFrame, path: str) -> int:
    """User-timeline CSV (`独立版/(using)WeiboUserScrapy.py:461-475` shape):
    image urls space-joined (F13), '无' placeholder for no-image rows (P8),
    newest-first is the reference's flush order but the deterministic export
    key here is (uid, page, block_index)."""
    _guard_size(timeline, "export_timeline_csv")
    rows = (
        timeline.orderBy("uid", "page", "block_index")
        .select(
            "wid",
            "weibo_link",
            "content",
            F.when(F.size("img_urls") == 0, F.lit("无"))
            .otherwise(F.array_join("img_urls", " "))
            .alias("img_urls"),
            "is_origin",
            "publish_time",
            F.when(
                F.col("publish_tool").isNull() | (F.col("publish_tool") == ""),
                F.lit("无"),
            ).otherwise(F.col("publish_tool")).alias("publish_tool"),
            "like_num",
            "forward_num",
            "comment_num",
        )
        .collect()
    )
    _write_csv(path, TIMELINE_HEADERS, [list(r) for r in rows])
    return len(rows)


def compute_stats(comments: DataFrame, reposts: DataFrame, top_k: int = 10) -> dict:
    """The deep-analyzer stats block (`独立版/WeiboDeepAnalyzer.py:548-600`):
    totals, averages (rendered '%.1f'), Counter-style top-N. All aggregation
    is distributed; only the tiny result is collected."""
    c = comments.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("like_count"), F.lit(0)).alias("likes"),
        F.avg(F.length("content")).alias("avg_len"),
    ).first()
    r = reposts.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum("like_count"), F.lit(0)).alias("likes"),
        F.avg(F.length("content")).alias("avg_len"),
    ).first()
    top_c = [
        {"name": row["commenter_name"], "count": row["cnt"]}
        for row in count_top_names(comments, "commenter_name", top_k).collect()
    ]
    top_r = [
        {"name": row["user_name"], "count": row["cnt"]}
        for row in count_top_names(reposts, "user_name", top_k).collect()
    ]
    return {
        "total_comments": c["n"],
        "total_reposts": r["n"],
        "total_comment_likes": int(c["likes"]),
        "total_repost_likes": int(r["likes"]),
        "total_interactions": c["n"] + r["n"],
        "avg_comment_length": float(f"{(c['avg_len'] or 0.0):.1f}"),
        "avg_repost_length": float(f"{(r['avg_len'] or 0.0):.1f}"),
        "top_commenters": top_c,
        "top_reposters": top_r,
    }


def export_complete_json(weibo: DataFrame, comments: DataFrame,
                         reposts: DataFrame, path: str) -> dict:
    """Nested complete.json (`独立版/WeiboDeepAnalyzer.py:604-620`):
    weibo_content + comments[] + reposts[] + stats, ensure_ascii=False,
    indent=2."""
    _guard_size(comments, "export_complete_json(comments)")
    _guard_size(reposts, "export_complete_json(reposts)")
    w = weibo.orderBy("wid").limit(1).collect()
    doc = {
        "weibo_content": dict(w[0].asDict()) if w else None,
        "comments": [
            r.asDict()
            for r in comments.orderBy("page", "block_index")
            .select("comment_id", "commenter_id", "commenter_name", "content",
                    "like_count", "publish_time")
            .collect()
        ],
        "reposts": [
            r.asDict()
            for r in reposts.orderBy("page", "block_index")
            .select("user_id", "user_name", "content", "like_count", "publish_time")
            .collect()
        ],
        "stats": compute_stats(comments, reposts),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False, indent=2)
    return doc
