"""deep_analyze pipeline + J1 enrichment + binary sink tests."""

import os

from pyspark.sql import functions as F

from wss_spark.analysis import deep_analyze, enrich_comments_with_users
from wss_spark.operators import multimodal
from wss_spark.synth import Target, build_pages_df


def test_deep_analyze_single_wid(spark, tmp_path):
    pages = build_pages_df(spark, 6, seed=42).cache()
    t0 = Target(42, 0)
    res = deep_analyze(pages, wid=t0.wid, export_dir=str(tmp_path))
    assert res["weibo"].count() == 1
    w = res["weibo"].first()
    assert w["user_name"] == t0.user_name
    assert res["comments"].count() == t0.n_comments
    assert res["stats"]["total_comments"] == t0.n_comments
    assert os.path.exists(tmp_path / f"{t0.wid}_complete.json")
    assert os.path.exists(tmp_path / f"{t0.wid}_comments.csv")


def test_enrich_comments_with_users(spark):
    pages = build_pages_df(spark, 6, seed=42).cache()
    res = deep_analyze(pages)
    enriched = res["comments_enriched"]
    # author profiles exist only for post authors, not commenters — the join
    # must keep every comment (left) and resolve authors when present
    assert enriched.count() == res["comments"].count()
    assert {"sex", "location", "followers_num", "praised_num"} <= set(enriched.columns)
    # direct check: users dim joined onto a synthetic comment row by uid
    users = res["users"]
    fake = spark.createDataFrame(
        [("w", 1, 0, "c1", users.first()["uid"], "n", "hi", 2, "t", False)],
        "root_wid string, page int, block_index int, comment_id string, "
        "commenter_id string, commenter_name string, content string, "
        "like_count int, publish_time string, is_hot boolean",
    )
    row = enrich_comments_with_users(fake, users).first()
    assert row["nickname"] == users.first()["nickname"]


def test_binary_file_sink_skip_if_exists(spark, tmp_path):
    out = str(tmp_path / "blobs")
    media = multimodal.synth_media_df(spark, 20, seed=5).cache()
    n1 = multimodal.binary_file_sink(media, out)
    files = set(os.listdir(out))
    assert n1 == len(files) == 20  # payloads are distinct by construction
    # second pass with the already-written set: nothing new
    already = spark.createDataFrame(
        [(f[:-4],) for f in files], "name string"
    )
    n2 = multimodal.binary_file_sink(media, out, already=already)
    assert n2 == 0


def test_download_images_from_crawl_entities(spark, tmp_path):
    """Image post-pass driven by real extraction output: timeline/album image
    refs -> large-url rewrite -> payload join -> md5-named files, with the
    downloaded-set anti-join making re-runs incremental."""
    import hashlib

    from wss_spark.analysis import collect_image_urls, download_images
    from wss_spark.extraction.parse_page import parse_pages

    pages = build_pages_df(spark, 6, seed=42).cache()
    parsed = parse_pages(pages).cache()
    urls = collect_image_urls(parsed)
    got = [r["url"] for r in urls.collect()]
    assert got and all("/large/" in u for u in got)          # F9 rewrite applied
    assert not any("thumb180" in u or "wap180" in u for u in got)
    assert len(got) == len(set(got))                          # distinct

    # fetched-media table: deterministic payload per url (the warehouse
    # stand-in for the reference's HTTP GET)
    images = urls.select(
        "url", F.encode(F.concat(F.lit("IMG:"), F.col("url")), "utf-8").alias("payload")
    ).cache()
    out = str(tmp_path / "imgs")
    n1 = download_images(parsed, images, out)
    files = set(os.listdir(out))
    assert n1 == len(files) == len(got)
    # content-addressed names: md5(payload).bin, like the reference's md5
    # image naming
    want = {hashlib.md5(f"IMG:{u}".encode()).hexdigest() + ".bin" for u in got}
    assert files == want

    # skip-if-exists: a second pass with the already-set writes nothing new
    already = spark.createDataFrame(
        [(f[:-4],) for f in files], "name string"
    )
    n2 = download_images(parsed, images, out, already=already)
    assert n2 == 0
    assert set(os.listdir(out)) == want
