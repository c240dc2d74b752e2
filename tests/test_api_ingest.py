"""Mobile-API JSON ingest tests: card-type filtering (P4), action
classification + retweet unwrap (P6/F8), API time normalization (F2),
tag-strip text (F15)."""

from pyspark.sql import functions as F

from wss_spark.api_ingest import (
    classify_user_actions,
    parse_topic_payloads,
    strip_html_tags,
    synth_topic_payloads,
)
from wss_spark.functions.times import parse_api_time


def test_parse_topic_payloads(spark):
    payloads = synth_topic_payloads(spark, 12, seed=42)
    rows = parse_topic_payloads(payloads).collect()
    # ok=1 pages only; card types 7/8 filtered; 11-with-group unwrapped
    assert len(rows) > 0
    per_page_max = 6
    assert all(r["card_index"] < per_page_max for r in rows)
    assert all(r["wid"] for r in rows)
    # card_type 11 unwrap worked: ids from card_group mblogs present
    assert any(r["is_long_text"] for r in rows)
    # F2: times normalized to yyyy-MM-dd HH:mm:ss
    assert all(len(r["publish_time"]) == 19 and r["publish_time"][4] == "-" for r in rows)
    # F15: no tags or entities remain
    assert all("<" not in r["text"] and "&amp;" not in r["text"] for r in rows)
    # S5 cursor propagated
    assert all(r["since_id"].startswith("s") for r in rows)


def test_card_type_filtering_counts(spark):
    payloads = synth_topic_payloads(spark, 10, seed=42)
    got = parse_topic_payloads(payloads)
    # recompute expectation from the generator's arithmetic: k = (p*7+i)%10,
    # cards with k in {7,8} are dropped, ok==0 pages (p%13==12) dropped
    expect = 0
    for p in range(10):
        if p % 13 == 12:
            continue
        for i in range(6):
            if (p * 7 + i) % 10 not in (7, 8):
                expect += 1
    assert got.count() == expect


def test_classify_user_actions_and_retweet_unwrap(spark):
    payloads = synth_topic_payloads(spark, 9, seed=42)
    acts = classify_user_actions(payloads).collect()
    kinds = {r["typ"] for r in acts}
    assert kinds == {"commented", "praised", "reposted"}
    retweets = [r for r in acts if "原始用户: " in r["text"]]
    assert retweets
    assert all("转发内容: " in r["text"] for r in retweets)
    assert all("<b>" not in r["text"] for r in retweets)  # tags stripped inside


def test_api_time_and_tag_strip_units(spark):
    df = spark.createDataFrame(
        [("Fri Aug 05 17:23:05 +0800 2022", "a<br/>b <i>c</i> &gt;d")],
        "t string, h string",
    )
    row = df.select(
        parse_api_time("t").alias("ts"), strip_html_tags("h").alias("txt")
    ).first()
    assert row["ts"] == "2022-08-05 17:23:05"  # original +0800 wall time kept
    assert row["txt"] == "a\nb c >d"
