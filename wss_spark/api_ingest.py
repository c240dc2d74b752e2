"""Mobile-API JSON ingest: the reference's cookie-less spider family.

The reference's second data plane is JSON from m.weibo.cn ajax endpoints
(S3): `独立版/WeiboCnTopicSpiderWithoutCookie.py:33-52` (topic search cards),
`独立版/CommentedWeiboSpider.py:103-134` (commented/praised/reposted pages).
Here stored API payloads are a DataFrame column parsed with ``from_json`` —
all JVM-side, no Python:

- P4 card-type filter: skip card_type 7/8, and 11 only without a card_group;
  unwrap ``coalesce(mblog, card_group[0].mblog)``
  (`独立版/WeiboCnTopicSpiderWithoutCookie.py:90-104`)
- P6 action classification: commented/praised/reposted from the page title,
  ``retweeted_status`` unwrap (`独立版/CommentedWeiboSpider.py:114-134`)
- F2 API time: 'EEE MMM dd HH:mm:ss Z yyyy' → 'yyyy-MM-dd HH:mm:ss'
- F15 html→text for the ``text`` field (tag strip, the pyquery ``.text()``
  equivalent) via regexp
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wss_spark.functions.times import parse_api_time

# m.weibo.cn getIndex card schema (subset the reference reads)
MBLOG = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("mid", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("reposts_count", T.IntegerType()),
        T.StructField("comments_count", T.IntegerType()),
        T.StructField("attitudes_count", T.IntegerType()),
        T.StructField("isLongText", T.BooleanType()),
        T.StructField(
            "user",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("screen_name", T.StringType()),
                    T.StructField("gender", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "retweeted_status",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("text", T.StringType()),
                    T.StructField(
                        "user",
                        T.StructType([T.StructField("screen_name", T.StringType())]),
                    ),
                ]
            ),
        ),
    ]
)

CARD = T.StructType(
    [
        T.StructField("card_type", T.IntegerType()),
        T.StructField("mblog", MBLOG),
        T.StructField(
            "card_group",
            T.ArrayType(
                T.StructType([T.StructField("mblog", MBLOG), T.StructField("card_type", T.IntegerType())])
            ),
        ),
    ]
)

TOPIC_PAYLOAD = T.StructType(
    [
        T.StructField("ok", T.IntegerType()),
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField("cards", T.ArrayType(CARD)),
                    T.StructField("cardlistInfo",
                                  T.StructType([T.StructField("since_id", T.StringType())])),
                ]
            ),
        ),
    ]
)


def strip_html_tags(col: Column | str) -> Column:
    """F15 — the pyquery ``.text()`` equivalent for API text fields
    (`独立版/WeiboCnTopicSpiderWithoutCookie.py:113,127`): drop tags,
    unescape the common entities, collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"<br\s*/?>", "\n")
    c = F.regexp_replace(c, r"<[^>]+>", "")
    for ent, ch in (("&quot;", '"'), ("&#39;", "'"), ("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, r"[ \t]+", " "))


def parse_topic_payloads(payloads: DataFrame, json_col: str = "payload") -> DataFrame:
    """Stored topic-search API pages → topic rows (FIXTURES.md §3.7 shape).

    One ``from_json`` + ``explode`` + declarative card filtering; emits
    ``card_index`` for deterministic ordering (O4) and the payload's
    ``since_id`` cursor for frontier continuation (S5).
    """
    parsed = payloads.withColumn("_p", F.from_json(F.col(json_col), TOPIC_PAYLOAD))
    cards = (
        parsed.filter(F.col("_p.ok") == 1)
        .select(
            "*",
            F.posexplode_outer(F.col("_p.data.cards")).alias("card_index", "card"),
            F.col("_p.data.cardlistInfo.since_id").alias("since_id"),
        )
    )
    # P4: drop ad/recommendation card types; unwrap nested card_group
    mblog = F.coalesce(F.col("card.mblog"), F.col("card.card_group")[0]["mblog"])
    rows = (
        cards.filter(~F.col("card.card_type").isin(7, 8))
        .filter(~((F.col("card.card_type") == 11) & F.col("card.card_group").isNull()
                  & F.col("card.mblog").isNull()))
        .withColumn("_m", mblog)
        .filter(F.col("_m").isNotNull())
    )
    return rows.select(
        F.col("_m.id").alias("wid"),
        F.col("_m.user.screen_name").alias("user_name"),
        F.col("_m.user.id").alias("user_id"),
        F.col("_m.user.gender").alias("gender"),
        parse_api_time(F.col("_m.created_at")).alias("publish_time"),
        strip_html_tags(F.col("_m.text")).alias("text"),
        F.col("_m.attitudes_count").alias("like_count"),
        F.col("_m.comments_count").alias("comment_count"),
        F.col("_m.reposts_count").alias("forward_count"),
        F.col("_m.isLongText").alias("is_long_text"),
        "card_index",
        "since_id",
    )


def classify_user_actions(payloads: DataFrame, title_col: str = "page_title",
                          json_col: str = "payload") -> DataFrame:
    """P6 — label rows commented/praised/reposted from the page title and
    unwrap retweets (`独立版/CommentedWeiboSpider.py:114-134`). Emits the
    user-actions shape (FIXTURES.md §3.10 subset)."""
    typ = (
        F.when(F.col(title_col).contains("评论过"), F.lit("commented"))
        .when(F.col(title_col).contains("赞过"), F.lit("praised"))
        .otherwise(F.lit("reposted"))
    )
    parsed = payloads.withColumn("_p", F.from_json(F.col(json_col), TOPIC_PAYLOAD))
    cards = parsed.select(
        "*", typ.alias("typ"),
        F.posexplode_outer(F.col("_p.data.cards")).alias("card_index", "card"),
    ).filter(F.col("card.mblog").isNotNull())
    m = F.col("card.mblog")
    rt = m["retweeted_status"]
    return cards.select(
        "typ",
        m["mid"].alias("mid"),
        parse_api_time(m["created_at"]).alias("publish_time"),
        m["user"]["id"].cast("string").alias("uid"),
        m["user"]["screen_name"].alias("screen_name"),
        # retweet assembly: prepend original author context when present (F8)
        F.when(
            rt.isNotNull(),
            F.concat(
                strip_html_tags(m["text"]),
                F.lit("\n原始用户: "),
                F.coalesce(rt["user"]["screen_name"], F.lit("已删除")),
                F.lit("\n转发内容: "),
                strip_html_tags(rt["text"]),
            ),
        )
        .otherwise(strip_html_tags(m["text"]))
        .alias("text"),
        m["reposts_count"].alias("reposts_count"),
        m["comments_count"].alias("comments_count"),
        m["attitudes_count"].alias("attitudes_count"),
        "card_index",
    )


# ---------------------------------------------------------------------------
# like plane: m.weibo.cn /api/attitudes/show (`独立版/WeiboLikeSpider.py`)
# ---------------------------------------------------------------------------

LIKE_ITEM = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField(
            "user",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("screen_name", T.StringType()),
                    T.StructField("verified_type", T.IntegerType()),
                ]
            ),
        ),
    ]
)

LIKE_PAYLOAD = T.StructType(
    [
        T.StructField("ok", T.IntegerType()),
        T.StructField(
            "data",
            T.StructType([T.StructField("data", T.ArrayType(LIKE_ITEM))]),
        ),
    ]
)


def _raw_time_like(r) -> str:
    """created_at strings hitting every branch of the like spider's padded
    parser — crucially including UNPADDED ``8月5日`` forms (`:41-51`)."""
    from datetime import timedelta

    from wss_spark.extraction.kernel import ANCHOR

    kind = r.random()
    if kind < 0.08:
        return "刚刚"
    if kind < 0.22:
        return f"{r.randint(1, 59)}分钟前"
    if kind < 0.34:
        return f"{r.randint(1, 12)}小时前"
    if kind < 0.48:
        return f"今天 {r.randint(0, 23):02d}:{r.randint(0, 59):02d}"
    if kind < 0.82:
        d = ANCHOR - timedelta(days=r.randint(0, 60), minutes=r.randint(0, 1400))
        return f"{d.month}月{d.day}日 {d.hour:02d}:{d.minute:02d}"  # unpadded
    d = ANCHOR - timedelta(days=r.randint(0, 200), minutes=r.randint(0, 1400))
    return d.strftime("%Y-%m-%d %H:%M:%S")


def like_payload_rows(n_weibos: int, seed: int = 42) -> list[tuple]:
    """Deterministic stored /api/attitudes/show payload pages, shared between
    the Spark fixture and the DuckDB oracle VALUES. Per weibo: 1-3 pages of
    4-9 like rows, then one empty page (the reference's stop probe,
    `独立版/WeiboLikeSpider.py:175-177`)."""
    import json
    import random

    rows: list[tuple] = []
    for w in range(n_weibos):
        r = random.Random(seed * 1_000_003 + w * 7919)
        wid = str(4_400_000_000_000_000 + w * 104729)
        n_pages = r.randint(1, 3)
        for p in range(1, n_pages + 2):
            items = []
            if p <= n_pages:
                for j in range(r.randint(4, 9)):
                    items.append(
                        {
                            "id": 9_000_000_000 + w * 10_000 + p * 100 + j,
                            "created_at": _raw_time_like(r),
                            "source": r.choice(
                                ["微博网页版", "iPhone客户端", "HUAWEI Mate", "Android"]
                            ),
                            "user": {
                                "id": 7_000_000_000 + w * 1000 + j,
                                "screen_name": f"点赞用户{w}_{p}_{j}",
                                "verified_type": r.choice([-1, 0, 1, 3]),
                            },
                        }
                    )
            payload = {"ok": 1, "data": {"data": items}}
            rows.append((wid, p, json.dumps(payload, ensure_ascii=False)))
    return rows


def synth_like_payloads(spark, n_weibos: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(
        like_payload_rows(n_weibos, seed), "wid string, page int, payload string"
    )


def parse_like_payloads(payloads: DataFrame, json_col: str = "payload") -> DataFrame:
    """Stored like-API pages → like rows (`独立版/WeiboLikeSpider.py:167-196`
    result columns): lid, publish_time (padded sliced parser, JVM), user_name,
    user_link (F12 `:182`), source, user_verified_type. All from_json — no
    Python."""
    from wss_spark.extraction.kernel import ANCHOR
    from wss_spark.functions.times import parse_weibo_time_like

    parsed = payloads.withColumn("_p", F.from_json(F.col(json_col), LIKE_PAYLOAD))
    items = parsed.select(
        "*", F.posexplode_outer(F.col("_p.data.data")).alias("like_index", "item")
    ).filter(F.col("item").isNotNull())
    return items.select(
        F.col("wid"),
        F.col("page"),
        F.col("like_index"),
        F.col("item.id").alias("lid"),
        parse_weibo_time_like(F.col("item.created_at"), ANCHOR).alias("publish_time"),
        F.col("item.user.screen_name").alias("user_name"),
        F.format_string(
            "https://weibo.com/u/%d", F.col("item.user.id")
        ).alias("user_link"),
        F.col("item.source").alias("source"),
        F.col("item.user.verified_type").alias("user_verified_type"),
    )


def topic_payload_rows(n_pages: int, seed: int = 42) -> list[tuple]:
    """Deterministic stored-API fixture pages (JSON strings), shaped like the
    m.weibo.cn getIndex responses the reference consumes. Includes every P4
    card-type branch and retweet/longtext variants. Pure Python so the same
    payload strings feed both the Spark fixture and the DuckDB oracle
    VALUES."""
    import json

    rows = []
    for p in range(n_pages):
        cards = []
        for i in range(6):
            k = (p * 7 + i) % 10
            mblog = {
                "id": f"4{seed}{p:03d}{i:02d}",
                "mid": f"4{seed}{p:03d}{i:02d}",
                "created_at": f"Mon Aug {(p % 28) + 1:02d} 12:{i:02d}:05 +0800 2022",
                "text": f"话题内容<span class='url-icon'>x</span> 第{p}页第{i}条"
                        + ("<br/>换行 &amp; 实体" if i % 2 == 0 else ""),
                "reposts_count": (p * 31 + i) % 100,
                "comments_count": (p * 17 + i) % 50,
                "attitudes_count": (p * 13 + i) % 200,
                "isLongText": i % 5 == 0,
                "user": {
                    "id": 2_000_000 + (p * 11 + i) % 500,
                    "screen_name": f"用户{(p * 11 + i) % 500}",
                    "gender": "m" if i % 2 == 0 else "f",
                },
            }
            if i % 4 == 3:
                mblog["retweeted_status"] = {
                    "id": f"3{p:03d}{i:02d}",
                    "text": f"原帖<b>内容</b>{p}-{i}",
                    "user": {"screen_name": f"原作者{i}"},
                }
            if k == 7:
                cards.append({"card_type": 7})          # filtered (ad)
            elif k == 8:
                cards.append({"card_type": 8})          # filtered
            elif k == 9:
                cards.append({"card_type": 11, "card_group": [{"mblog": mblog, "card_type": 9}]})
            else:
                cards.append({"card_type": 9, "mblog": mblog})
        payload = {
            "ok": 1 if p % 13 != 12 else 0,             # occasional empty page
            "data": {"cards": cards, "cardlistInfo": {"since_id": f"s{p + 1}"}},
        }
        rows.append((p, f"某人评论过的微博" if p % 3 == 0 else ("赞过的微博" if p % 3 == 1 else "转发过的微博"),
                     json.dumps(payload, ensure_ascii=False)))
    return rows


def synth_topic_payloads(spark, n_pages: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(
        topic_payload_rows(n_pages, seed), "page int, page_title string, payload string"
    )
