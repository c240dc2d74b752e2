"""Round-2 page families: topic search (J2/F17), likes API (zero-pad F1),
article <p> walk (F15 variant), name→uid resolution (J6), max_id cursor
plane (S5/T6). Byte-identity + crawl-order equivalence + parser parity."""

import tempfile

from pyspark.sql import functions as F

from wss_spark import synth
from wss_spark.extraction import kernel
from wss_spark.extraction.kernel import ANCHOR
from wss_spark.extraction.parse_page import (
    extract_api_comments,
    extract_search_hits,
    extract_user_hits,
    parse_pages,
)

N = 16
SEED = 42


def _family_pages(spark):
    return (
        synth.build_search_pages_df(spark, N, seed=SEED)
        .unionByName(synth.build_article_pages_df(spark, N, seed=SEED))
        .unionByName(synth.build_hotflow_pages_df(spark, N, seed=SEED))
        .unionByName(synth.build_usersearch_pages_df(spark, N, seed=SEED))
    )


def test_new_families_text_byte_identical(spark):
    pages = _family_pages(spark).cache()
    parsed = parse_pages(pages).filter(F.col("kind") == "page")
    j = pages.select("url", F.col("text").alias("exp")).join(
        parsed.select("url", "text"), "url"
    )
    assert j.count() == pages.count()
    assert j.filter(F.col("exp") != F.col("text")).count() == 0
    pages.unpersist()


def test_search_hits_fields(spark):
    hits = extract_search_hits(
        parse_pages(synth.build_search_pages_df(spark, N, seed=SEED))
    )
    got = {
        r["wid"]: r
        for r in hits.collect()
    }
    exp = []
    for kw in range(synth.n_search_keywords(N)):
        exp.extend(synth.search_keyword_hits(kw, N, SEED))
    assert len(got) == len(exp)
    for h in exp:
        o = synth._search_hit_oracle(h)
        g = got[h["swid"]]
        assert g["content"] == o["content"]
        assert g["publish_time"] == o["publish_time"]
        assert g["publish_place"] == o["publish_place"]
        assert g["is_origin"] == o["is_origin"]
        assert g["up_num"] == o["like_count"]


def test_search_retweet_assembly_shape(spark):
    hits = extract_search_hits(
        parse_pages(synth.build_search_pages_df(spark, N, seed=SEED))
    )
    rts = hits.filter(~F.col("is_origin")).collect()
    assert rts  # synth guarantees some retweets
    for r in rts:
        assert "\n原始用户: " in r["content"] and "\n转发内容: " in r["content"]
        assert r["content"].startswith("转发理由:")


def test_sliced_time_parser_variants():
    """Like-spider zero-padding (`WeiboLikeSpider.py:41-51`) and topic
    variant (no 小时 branch) against hand-computed expectations."""
    p = kernel.parse_time_sliced
    assert p("8月5日 13:05", ANCHOR, pad=True) == "2025-08-05 13:05"
    assert p("12月31日 09:00", ANCHOR, pad=True) == "2025-12-31 09:00"
    assert p("8月15日 13:05", ANCHOR, pad=True) == "2025-08-15 13:05"
    assert p("10月5日 07:30", ANCHOR, pad=True) == "2025-10-05 07:30"
    assert p("3分钟前", ANCHOR, pad=True) == "2025-10-29 11:57"
    assert p("2小时前", ANCHOR, pad=True) == "2025-10-29 10:00"
    assert p("今天 08:31", ANCHOR, pad=True) == "2025-10-29 08:31"
    assert p("2024-12-31 23:59:59", ANCHOR, pad=True) == "2024-12-31 23:59"
    # topic variant: 小时 falls through to the else branch ([:16])
    assert p("2小时前", ANCHOR, pad=False, hour_branch=False) == "2小时前"
    # 来自 split keeps the trailing space (no strip) — faithful quirk
    assert (
        p("今天 08:31 来自X", ANCHOR, hour_branch=False, split_source=True)
        == "2025-10-29 08:31 "
    )


def test_like_time_parser_jvm_parity(spark):
    samples = [
        "刚刚", "5分钟前", "11小时前", "今天 23:59", "8月5日 13:05",
        "12月31日 09:00", "1月1日 00:07", "10月15日 20:08",
        "2024-12-31 23:59:59", "短",
    ]
    from wss_spark.functions.times import parse_weibo_time_like

    df = spark.createDataFrame([(s,) for s in samples], ["raw"])
    got = [r[0] for r in df.select(parse_weibo_time_like("raw", ANCHOR)).collect()]
    exp = [kernel.parse_time_sliced(s, ANCHOR, pad=True) for s in samples]
    assert got == exp


def test_likes_extract_rows(spark):
    from wss_spark.api_ingest import parse_like_payloads, synth_like_payloads

    likes = parse_like_payloads(synth_like_payloads(spark, 6, seed=SEED))
    rows = likes.collect()
    assert rows
    assert all(r["user_link"].startswith("https://weibo.com/u/") for r in rows)
    # no raw relative forms may survive normalization
    assert all("分钟" not in r["publish_time"] for r in rows)
    assert all("月" not in r["publish_time"] for r in rows)


def test_article_p_walk_semantics():
    html = (
        "<html><body>"
        "<p>纯文本段</p>"
        '<p><img src="https://x/i1.jpg"/>图文段</p>'
        '<p><img src="https://x/i2.jpg"/></p>'
        "<p><b>嵌套文本</b>尾巴</p>"
        "<p></p>"
        "</body></html>"
    )
    got = kernel.extract_article_text(kernel.parse_html(html))
    assert got == "纯文本段\nhttps://x/i1.jpg\n图文段\nhttps://x/i2.jpg\n嵌套文本"


def test_name_uid_resolution_and_work_skipping(spark):
    from wss_spark.analysis import add_user_links

    mapping = extract_user_hits(
        parse_pages(synth.build_usersearch_pages_df(spark, N, seed=SEED))
    )
    names = spark.createDataFrame(
        [(synth.Target(SEED, t).user_name,) for t in range(N)], "user_name string"
    )
    out1 = add_user_links(names, mapping).cache()
    assert out1.filter(~F.col("finish")).count() == 0
    assert out1.filter(F.col("user_link") == "").count() == 0
    # J7-style work skipping: a second pass must not touch finished rows even
    # against an EMPTY mapping (nothing re-resolves)
    empty_map = mapping.limit(0)
    out2 = add_user_links(out1, empty_map)
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))


def test_hotflow_cursor_crawl_matches_simulator(spark):
    from wss_spark.crawl import simulator
    from wss_spark.crawl.frontier import CrawlConfig, run_crawl, visit_order

    pages = (
        synth.build_pages_df(spark, N, seed=SEED)
        .unionByName(synth.build_search_pages_df(spark, N, seed=SEED))
        .unionByName(synth.build_hotflow_pages_df(spark, N, seed=SEED))
    ).cache()
    seeds = synth.seed_list(N, seed=SEED, n_seeds=3)
    seeds += [synth.search_url(synth.HOT_HOST, "topic0", 1)]
    for t in range(N):
        tt = synth.Target(SEED, t)
        if synth.hotflow_chain(tt, SEED):
            seeds.append(synth.hotflow_url(tt.wid, None))
        if len(seeds) >= 7:
            break
    cfg = CrawlConfig(budget=5, n_buckets=8, m_bits=1 << 16,
                      checkpoint_dir=tempfile.mkdtemp(prefix="wss_nf_"))
    res = run_crawl(spark, pages, seeds, cfg)
    order = visit_order(res.fetch_log)
    pages_map = {r["url"]: bytes(r["html"]) for r in pages.select("url", "html").collect()}
    sim_order, sim_seen = simulator.simulate(pages_map, seeds, budget=5)
    assert order == sim_order
    assert {r[0] for r in res.seen.select("canon_url").collect()} == sim_seen
    pages.unpersist()


def test_api_comments_flatten_and_raw_time(spark):
    c = extract_api_comments(
        parse_pages(synth.build_hotflow_pages_df(spark, N, seed=SEED))
    ).collect()
    assert c
    # raw created_at kept verbatim (the reference writes it unparsed)
    assert any("分钟" in r["time"] or "月" in r["time"] or "刚刚" in r["time"] for r in c)
    # nested sub-comments flattened inline: their ids end with the 9x suffix
    assert any(len(r["wid"]) > 16 for r in c)


def test_search_window_urls(spark):
    from wss_spark.crawl.discover import search_window_urls
    from wss_spark.functions.times import time_params_formatter

    w = search_window_urls(spark, "S10", "2020-10-1-0", "2020-10-3-0").collect()
    assert len(w) == 3
    # F17 parity with the pure formatter (`WeiboTopicScrapy.py:505-512`)
    assert w[0]["starttime"] == time_params_formatter("2020-10-1-0", offset_hour=-8)
    assert w[0]["endtime"] == time_params_formatter(
        "2020-10-2-0", offset_day=-1, offset_hour=-7
    )
    assert "advancedfilter=1" in w[0]["url"] and "keyword=S10" in w[0]["url"]
