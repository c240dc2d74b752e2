"""WARC segment egress + ingest (wss_spark/warc.py).

The boundary invariant: pages → pages_to_warc → parse_warc is the
identity on (url, warc_ts, html) — byte-identical html through the
Content-Length framing, for plain and per-record-gzip segments, under
any input partitioning.
"""

import gzip
from datetime import datetime

import pytest

from wss_spark import warc


def _roundtrip_rows(spark, pages, n_segments, gz):
    seg = warc.pages_to_warc(pages, n_segments=n_segments, gzip_members=gz)
    parsed = warc.parse_warc(seg)
    return seg, parsed


@pytest.mark.parametrize("gz", [False, True])
def test_spark_roundtrip_identity(spark, pages_small, gz):
    seg, parsed = _roundtrip_rows(spark, pages_small, 7, gz)
    want = {
        (r["url"], r["warc_ts"], bytes(r["html"]))
        for r in pages_small.select("url", "warc_ts", "html").collect()
    }
    got_rows = parsed.collect()
    got = {(r["url"], r["warc_ts"], bytes(r["html"])) for r in got_rows}
    assert got == want
    assert all(r["http_status"] == 200 for r in got_rows)
    assert all(r["content_type"] == "text/html; charset=UTF-8" for r in got_rows)


def test_segment_bytes_partition_invariant(spark, pages_small):
    a = {
        r["segment_id"]: bytes(r["data"])
        for r in warc.pages_to_warc(pages_small, 5).collect()
    }
    b = {
        r["segment_id"]: bytes(r["data"])
        for r in warc.pages_to_warc(pages_small.repartition(13), 5).collect()
    }
    assert a == b
    assert len(a) == 5


def test_non_response_records_skipped():
    # the warcinfo record heads every segment; only responses come back
    recs = [("http://x/", datetime(2024, 1, 2, 3, 4, 5), b"<p>hi</p>")]
    blob = warc.render_warc_segment(recs, "s.warc")
    assert blob.count(b"WARC/1.0") == 2  # warcinfo + response
    out = list(warc._parse_segment("s.warc", blob, strict=True))
    assert len(out) == 1 and out[0]["url"] == "http://x/"


def test_strict_vs_lax_on_truncated_tail():
    recs = [
        ("http://x/1", datetime(2024, 1, 1), b"a" * 50),
        ("http://x/2", datetime(2024, 1, 1), b"b" * 50),
    ]
    cut = warc.render_warc_segment(recs, "s")[:-40]
    with pytest.raises(ValueError):
        list(warc._parse_segment("s", cut, strict=True))
    kept = list(warc._parse_segment("s", cut, strict=False))
    assert [r["url"] for r in kept] == ["http://x/1"]


def test_gzip_members_are_independent():
    # Common Crawl layout: each record its own gzip member → a reader can
    # decompress a single member without the rest of the file
    recs = [
        ("http://x/1", datetime(2024, 1, 1), b"first"),
        ("http://x/2", datetime(2024, 1, 2), b"second"),
    ]
    blob = warc.render_warc_segment(recs, "s.warc.gz", gzip_members=True)
    # 3 members: warcinfo + 2 responses
    assert blob.count(b"\x1f\x8b\x08") == 3
    # whole-stream decompress sees all members
    assert gzip.decompress(blob).count(b"WARC/1.0") == 3
