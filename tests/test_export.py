"""Golden-output export layer tests: CSV render conventions (utf-8-sig BOM,
Chinese headers, header-once), nested complete.json, stats block, and the
J3/J4 enrichment joins (full-text coalesce, album image arrays)."""

import csv
import json

import pytest
from pyspark.sql import functions as F

from wss_spark import export
from wss_spark.extraction.parse_page import enrich_weibo, extract_entities, parse_pages
from wss_spark.synth import Target, build_pages_df


@pytest.fixture(scope="module")
def entities(spark):
    pages = build_pages_df(spark, 10, seed=42).cache()
    ents = extract_entities(pages)
    ents["parsed"] = ents["parsed"].cache()
    return ents


def test_export_comments_csv(spark, entities, tmp_path):
    path = str(tmp_path / "comments.csv")
    n = export.export_comments_csv(entities["comments"], path)
    raw = open(path, "rb").read()
    assert raw.startswith(b"\xef\xbb\xbf")  # utf-8-sig BOM (reference convention)
    with open(path, encoding="utf-8-sig") as f:
        rows = list(csv.reader(f))
    assert rows[0] == export.COMMENT_HEADERS
    assert len(rows) == n + 1
    assert n == entities["comments"].count()


def test_export_weibo_csv_placeholder(spark, entities, tmp_path):
    path = str(tmp_path / "weibo.csv")
    enriched = enrich_weibo(entities["parsed"])
    n = export.export_weibo_csv(enriched, path)
    assert n == 10
    with open(path, encoding="utf-8-sig") as f:
        rows = list(csv.reader(f))
    assert rows[0] == export.WEIBO_HEADERS


def test_complete_json_and_stats(spark, entities, tmp_path):
    path = str(tmp_path / "complete.json")
    doc = export.export_complete_json(
        enrich_weibo(entities["parsed"]), entities["comments"], entities["reposts"], path
    )
    on_disk = json.load(open(path, encoding="utf-8"))
    assert set(on_disk) == {"weibo_content", "comments", "reposts", "stats"}
    s = on_disk["stats"]
    assert s["total_comments"] == len(on_disk["comments"])
    assert s["total_reposts"] == len(on_disk["reposts"])
    assert s["total_interactions"] == s["total_comments"] + s["total_reposts"]
    assert len(s["top_commenters"]) <= 10
    if s["top_commenters"]:
        counts = [t["count"] for t in s["top_commenters"]]
        assert counts == sorted(counts, reverse=True)
    # ensure_ascii=False: Chinese text stays raw in the file
    assert "\\u" not in open(path, encoding="utf-8").read()[:2000]


def test_enrich_weibo_fulltext_and_albums(spark, entities):
    enriched = enrich_weibo(entities["parsed"]).cache()
    rows = {r["wid"]: r for r in enriched.collect()}
    targets = {Target(42, t).wid: Target(42, t) for t in range(10)}
    assert set(rows) == set(targets)
    for wid, t in targets.items():
        r = rows[wid]
        if t.has_longtext:
            # full-text page text is longer than the truncated content
            assert r["content_full"] and len(r["content_full"]) > len(r["content"])
        else:
            assert r["content_full"] == r["content"]
        if t.has_album:
            assert r["image_count"] == t.n_images
            assert all("/large/" in u for u in r["images"])
        else:
            assert r["image_count"] == 0
