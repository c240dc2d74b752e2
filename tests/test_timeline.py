"""User-timeline family tests (FIXTURES.md §3.5, `(using)WeiboUserScrapy`):
byte-identical extraction oracle, P3 origin filter, F8 retweet assembly,
F4 footer triples, F13/P8 CSV render; plus non-perturbation of the existing
page families."""

import csv

import pytest
from pyspark.sql import functions as F

from wss_spark import export
from wss_spark.extraction.parse_page import extract_timeline, parse_pages
from wss_spark.synth import (
    Target,
    _timeline_oracle_content,
    _timeline_post,
    build_pages_df,
    build_timeline_pages_df,
    render_target_pages,
)


@pytest.fixture(scope="module")
def timeline_world(spark):
    pages = build_timeline_pages_df(spark, 10, seed=42).cache()
    parsed = parse_pages(pages).cache()
    return pages, parsed


def test_timeline_text_byte_identical(spark, timeline_world):
    pages, parsed = timeline_world
    got = parsed.filter(F.col("kind") == "page").select("url", "text")
    joined = got.join(pages.select("url", F.col("text").alias("oracle")), "url")
    assert joined.count() == pages.count()
    assert joined.filter(F.col("text") != F.col("oracle")).count() == 0


def test_timeline_rows_match_model(spark, timeline_world):
    _, parsed = timeline_world
    tl = extract_timeline(parsed)
    rows = {r["wid"]: r for r in tl.collect()}
    # rebuild expectations straight from the synthetic model
    from wss_spark.synth import _rng

    checked_retweet = checked_del = 0
    for t_idx in range(10):
        t = Target(42, t_idx)
        n_posts = _rng(42, t_idx, 6).randint(3, 12)
        for j in range(n_posts):
            p = _timeline_post(t, j, 42)
            r = rows[p["twid"]]
            assert r["is_origin"] == p["is_origin"]
            assert r["content"] == _timeline_oracle_content(p)
            assert r["like_num"] == p["like"]
            assert r["forward_num"] == p["fwd"]
            assert r["comment_num"] == p["cmt"]
            assert len(r["img_urls"]) == p["n_imgs"]
            assert all("/large/" in u for u in r["img_urls"])
            if not p["is_origin"] and not p["deleted"]:
                assert "原始用户: " + p["orig_user"] in r["content"]
                checked_retweet += 1
            if p["deleted"]:
                assert r["content"] == "转发微博已被删除"
                checked_del += 1
    assert checked_retweet > 0 and checked_del > 0


def test_timeline_origin_filter_and_csv(spark, timeline_world, tmp_path):
    _, parsed = timeline_world
    all_rows = extract_timeline(parsed)
    origin_only = extract_timeline(parsed, only_origin=True)
    assert origin_only.count() == all_rows.filter("is_origin").count() < all_rows.count()

    path = str(tmp_path / "timeline.csv")
    n = export.export_timeline_csv(all_rows, path)
    with open(path, encoding="utf-8-sig") as f:
        rows = list(csv.reader(f))
    assert rows[0] == export.TIMELINE_HEADERS
    assert len(rows) == n + 1
    imgcol = [r[3] for r in rows[1:]]
    assert "无" in imgcol  # P8 placeholder
    assert any(" https://" in v or v.startswith("https://") for v in imgcol)  # F13 join


def test_existing_families_unperturbed():
    """Adding the timeline family must not change any existing page bytes
    (disjoint RNG streams)."""
    rows = render_target_pages(Target(42, 3), 42)
    # stable spot-check: first page's html hash recorded before the timeline
    # family existed would be ideal; assert structural invariants instead
    assert all(not r["url"].endswith("/profile?page=1") for r in rows)
    import hashlib

    h = hashlib.md5(b"".join(r["html"] for r in rows)).hexdigest()
    # regenerate: must be deterministic run-to-run
    rows2 = render_target_pages(Target(42, 3), 42)
    assert hashlib.md5(b"".join(r["html"] for r in rows2)).hexdigest() == h
