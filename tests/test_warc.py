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


def test_crlf_url_cannot_inject_headers():
    # a hostile url with CR/LF must not inject header lines or desync
    # framing — and since the escaping is reversible (marker header +
    # unescape on parse), it round-trips to the ORIGINAL url (ADVICE r04 #1)
    evil = "http://evil/\r\nWARC-Type: request"
    recs = [
        (evil, datetime(2024, 1, 1), b"<p>x</p>"),
        ("http://ok/", datetime(2024, 1, 2), b"<p>y</p>"),
    ]
    blob = warc.render_warc_segment(recs, "s")
    # the hostile text survives only INSIDE the URI value — never as its
    # own header line (which needs a preceding CRLF)
    assert blob.count(b"\r\nWARC-Type: request") == 0
    out = list(warc._parse_segment("s", blob, strict=True))
    assert len(out) == 2  # nothing dropped, framing intact
    assert {r["url"] for r in out} == {evil, "http://ok/"}


def test_escaped_uri_is_injective():
    # a url containing the literal TEXT '%0D' and a url containing a real
    # CR must neither render identical WARC bytes nor rehydrate to the
    # same string (the pre-r05 collision ADVICE r04 #1 flagged)
    lit = "http://x/a%0Db"
    raw = "http://x/a\rb"
    recs = [
        (lit, datetime(2024, 1, 1), b"1"),
        (raw, datetime(2024, 1, 2), b"2"),
    ]
    blob = warc.render_warc_segment(recs, "s")
    out = {r["url"] for r in warc._parse_segment("s", blob, strict=True)}
    assert out == {lit, raw}
    # percent-free valid urls render verbatim (no marker, no escaping)
    clean = warc.render_warc_segment(
        [("http://x/a%20b%25c", datetime(2024, 1, 1), b"z")], "s"
    )
    assert b"WARC-Target-URI: http://x/a%20b%25c\r\n" in clean
    assert b"WSS-URI-Escaped" not in clean


def test_foreign_warc_uri_not_unescaped():
    # a record WITHOUT our marker header (a foreign / Common Crawl segment)
    # keeps legitimate percent-encodings untouched — no spurious unescape
    rec = warc._record(
        [
            (b"WARC-Type", b"response"),
            (b"WARC-Target-URI", b"http://cc/%0D%0A%25"),
            (b"WARC-Date", b"2024-01-01T00:00:00Z"),
        ],
        b"HTTP/1.1 200 OK\r\n\r\nbody",
    )
    out = list(warc._parse_segment("s", rec, strict=True))
    assert out[0]["url"] == "http://cc/%0D%0A%25"


def test_lax_tolerates_missing_content_length():
    good = warc.render_warc_segment(
        [("http://x/1", datetime(2024, 1, 1), b"ok")], "s"
    )
    bad = good + b"WARC/1.0\r\nWARC-Type: response\r\n\r\njunk"
    with pytest.raises(ValueError):
        list(warc._parse_segment("s", bad, strict=True))
    kept = list(warc._parse_segment("s", bad, strict=False))
    assert [r["url"] for r in kept] == ["http://x/1"]
    # non-numeric length: same contract
    bad2 = good + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: xx\r\n\r\n"
    with pytest.raises(ValueError):
        list(warc._parse_segment("s", bad2, strict=True))
    assert [r["url"] for r in warc._parse_segment("s", bad2, strict=False)] == [
        "http://x/1"
    ]


def test_response_without_http_separator():
    # framing is intact but the HTTP payload has no CRLFCRLF separator:
    # strict raises, lax skips just that record and keeps parsing
    payload = b"HTTP/1.1 200 OK\r\nonly-headers-no-blank-line"
    broken = warc._record(
        [
            (b"WARC-Type", b"response"),
            (b"WARC-Target-URI", b"http://bad/"),
            (b"WARC-Date", b"2024-01-01T00:00:00Z"),
        ],
        payload,
    )
    good = warc._record(
        [
            (b"WARC-Type", b"response"),
            (b"WARC-Target-URI", b"http://good/"),
            (b"WARC-Date", b"2024-01-01T00:00:00Z"),
        ],
        b"HTTP/1.1 200 OK\r\n\r\n<p>fine</p>",
    )
    blob = broken + good
    with pytest.raises(ValueError):
        list(warc._parse_segment("s", blob, strict=True))
    kept = list(warc._parse_segment("s", blob, strict=False))
    assert [r["url"] for r in kept] == ["http://good/"]
    assert bytes(kept[0]["html"]) == b"<p>fine</p>"


def test_microsecond_timestamp_roundtrip():
    ts = datetime(2024, 1, 1, 0, 0, 0, 123456)
    blob = warc.render_warc_segment([("http://x/", ts, b"z")], "s")
    out = list(warc._parse_segment("s", blob, strict=True))
    assert out[0]["warc_ts"] == ts
    # whole-second stamps keep the classic WARC 1.0 form (byte stability)
    blob2 = warc.render_warc_segment(
        [("http://x/", datetime(2024, 1, 1), b"z")], "s"
    )
    assert b"2024-01-01T00:00:00Z" in blob2


def test_stream_warc_exactly_once(spark, tmp_path):
    # segment files arriving in a watched dir are each parsed exactly once
    # across restarts (checkpointed file-source offsets), matching batch
    # parse values
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_seg(name, urls):
        recs = [(u, datetime(2024, 1, 1), f"<p>{u}</p>".encode()) for u in urls]
        (seg_dir / name).write_bytes(
            warc.render_warc_segment(recs, name, gzip_members=name.endswith(".gz"))
        )

    write_seg("a.warc", ["http://x/1", "http://x/2"])
    write_seg("b.warc.gz", ["http://y/1"])

    def drain():
        q = (
            warc.stream_warc(spark, str(seg_dir))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(300)
        finally:
            q.stop()

    drain()
    got = spark.read.parquet(out)
    assert {r["url"] for r in got.collect()} == {
        "http://x/1", "http://x/2", "http://y/1"
    }

    # a third file arrives; restart the stream on the same checkpoint:
    # only the new segment's rows append, nothing re-parsed
    write_seg("c.warc", ["http://z/1"])
    drain()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4
    assert sorted(r["url"] for r in rows) == [
        "http://x/1", "http://x/2", "http://y/1", "http://z/1"
    ]
    # segment_id is the file name, so provenance survives ingest
    assert {r["segment_id"] for r in rows} == {"a.warc", "b.warc.gz", "c.warc"}


def test_stream_warc_picks_up_old_mtime_files(spark, tmp_path):
    # a segment copied in with an old preserved mtime (rsync -a /
    # object-store copy) must still ingest: the file source's 7-day
    # maxFileAge default would silently skip it (stream_warc overrides it)
    import os
    import time

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def write_seg(name, url, mtime=None):
        p = seg_dir / name
        p.write_bytes(warc.render_warc_segment(
            [(url, datetime(2024, 1, 1), b"x")], name))
        if mtime is not None:
            os.utime(p, (mtime, mtime))

    def drain():
        q = (
            warc.stream_warc(spark, str(seg_dir))
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        try:
            assert q.awaitTermination(300)
        finally:
            q.stop()

    write_seg("fresh.warc", "http://fresh/")
    drain()
    write_seg("old.warc", "http://old/", mtime=time.time() - 30 * 86400)
    drain()
    assert {r["url"] for r in spark.read.parquet(out).collect()} == {
        "http://fresh/", "http://old/"
    }
    # in-progress temp names stay invisible to the default glob
    (seg_dir / "partial.warc.tmp").write_bytes(b"garbage not a record")
    drain()
    assert spark.read.parquet(out).count() == 2
