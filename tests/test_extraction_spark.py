"""Spark-side extraction stage tests: byte-identical text per url, entity
shaping, and JVM scalar-function parity with the pure-Python kernel."""

from datetime import datetime

from pyspark.sql import functions as F

from wss_spark.extraction import kernel
from wss_spark.extraction.parse_page import extract_entities, extract_text
from wss_spark.functions import urls
from wss_spark.functions.base62 import id2mid, mid2id
from wss_spark.functions.times import parse_weibo_time

NOW = datetime(2025, 10, 29, 12, 0, 0)


def test_extracted_text_byte_identical(spark, pages_small):
    et = extract_text(pages_small)
    j = pages_small.select("url", F.col("text").alias("expected")).join(et, "url")
    assert j.count() == pages_small.count()
    assert j.filter(F.col("expected") != F.col("extracted_text")).count() == 0


def test_entities_shapes(spark, pages_small):
    ents = extract_entities(pages_small)
    comments = ents["comments"]
    assert comments.filter(F.col("comment_id").isNull()).count() == 0
    assert comments.filter(F.col("is_hot")).count() == 0  # P5 applied
    reposts = ents["reposts"]
    assert reposts.count() > 0
    assert reposts.filter(F.col("user_name").isNull()).count() == 0
    users = ents["users"]
    assert users.count() == 60  # one per target
    assert users.filter(F.col("followers_num").isNull()).count() == 0
    weibo = ents["weibo"]
    # main page and ?page=1 both carry the M block; dedup by wid
    assert weibo.select("wid").distinct().count() == 60


def test_parse_weibo_time_column_parity(spark):
    samples = [
        "刚刚",
        "3分钟前",
        "59分钟",
        "1小时前 来自iPhone",
        "12小时前",
        "今天 08:31 来自微博网页版",
        "今天 23:59",
        "10月28日 20:08 来自nova 11 SE",
        "3月5日",
        "01月01日 00:00",
        "2024-12-31 23:59:59 来自X",
        "2025-10-01 09:30:00",
        "短字符串",
        "恰好十六个字的字符串啊啊啊啊啊啊",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["raw"])
    got = [r[0] for r in df.select(parse_weibo_time("raw", NOW)).collect()]
    expected = [kernel.parse_time(s, NOW) for s in samples]
    assert got == expected


def test_base62_udfs(spark):
    df = spark.createDataFrame([("201110410216293360",)], ["wid"])
    out = df.select(id2mid("wid").alias("mid")).withColumn("back", mid2id("mid")).collect()[0]
    assert out["mid"] == "wr4mOFqpbO"
    assert out["back"] == "201110410216293360"


def test_base62_zero_quirk():
    """Reference JS parity (`独立版/WeiboSuperCommentScrapy.py:46-55`): the
    JS `while (int10 != 0)` loop renders 0 as the EMPTY string, so id '0'
    does not round-trip — by spec, not by bug. The catalog's roundtrip gate
    therefore restricts its domain to ids ≥ 1."""
    from wss_spark.functions.base62 import id_to_mid, mid_to_id

    assert id_to_mid("0") == ""
    assert mid_to_id("") == ""
    assert id_to_mid("") == ""
    # decode is the exact inverse on 4-char-aligned mids (real weibo mids):
    assert mid_to_id("wr4mOFqpbO") == "201110410216293360"


def test_url_canonicalization(spark):
    rows = [
        ("https://weibo.cn/comment/ABC?page=1", "https://weibo.cn/comment/ABC"),
        ("https://WEIBO.cn/comment/ABC#frag", "https://weibo.cn/comment/ABC"),
        ("https://weibo.cn/comment/ABC?page=2", "https://weibo.cn/comment/ABC?page=2"),
        ("https://weibo.cn/path/", "https://weibo.cn/path"),
        ("https://weibo.cn", "https://weibo.cn/"),
    ]
    df = spark.createDataFrame([(a,) for a, _ in rows], ["url"])
    got = [r[0] for r in df.select(urls.canonicalize_url("url")).collect()]
    assert got == [b for _, b in rows]


def test_url_classify_cols(spark):
    df = spark.createDataFrame(
        [
            ("https://weibo.cn/comment/Qb1?page=3",),
            ("https://m1.weibo.example/repost/Qb2",),
            ("https://weibo.cn/mblog/picAll/Qb3?rl=1",),
            ("https://weibo.cn/12345/info",),
        ],
        ["url"],
    )
    c = urls.classify_url_cols("url")
    got = df.select(
        c["kind"].alias("kind"), c["wid"].alias("wid"), c["uid"].alias("uid"), c["page"].alias("page")
    ).collect()
    assert [r["kind"] for r in got] == ["comment", "repost", "album", "info"]
    assert got[0]["page"] == 3 and got[1]["page"] == 1
    assert got[3]["uid"] == "12345"


def test_host_skew_present(spark, pages_small):
    hosts = pages_small.select(urls.host_of("url").alias("h")).groupBy("h").count().collect()
    counts = {r["h"]: r["count"] for r in hosts}
    total = sum(counts.values())
    assert counts.get("weibo.cn", 0) / total > 0.6  # deliberate hot host
