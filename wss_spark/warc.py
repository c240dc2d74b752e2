"""WARC segment egress + ingest for Common-Crawl-style pages.

The reference fetches pages live over HTTP (独立版/WeiboCommentScrapy.py:70's
requests.get loop); at web scale the corpus arrives instead as Common Crawl
WARC segments. This module closes that ingestion boundary both ways:

- ``pages_to_warc`` packs the pages table into WARC/1.0 segment blobs —
  one ``response`` record per fetched page, a leading ``warcinfo`` record
  per segment, optional per-record gzip members exactly like Common Crawl's
  ``.warc.gz`` layout (each record its own gzip member, so a reader can
  seek to a record offset and decompress just that member).
- ``parse_warc`` re-derives the pages-table shape (url, warc_ts, html)
  from raw segment bytes, skipping non-response records.

Both directions are Arrow-batched (applyInPandas / mapInPandas): binary
record framing is genuinely inexpressible with built-in SQL functions, so
this is the sanctioned Pandas-UDF slow path, scoped to the format boundary
only — everything downstream of ``parse_warc`` is plain DataFrame ops.

Scale notes (100 TB): segments are self-contained blobs, so parsing is
embarrassingly parallel — ``mapInPandas`` over whatever partitioning the
blob store gives, no shuffle, and the scan's only read columns are
(segment_id, data). Packing has exactly one hash shuffle (groupBy
segment_id) which replaces the final-write repartition any bulk export
needs anyway; record order within a segment is pinned (warc_ts, url) so
output bytes are deterministic under any input partitioning.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from datetime import datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_SOFTWARE = b"wss_spark.warc/1.0"

PARSED_SCHEMA = (
    "segment_id string, url string, warc_ts timestamp, html binary, "
    "http_status int, content_type string"
)

SEGMENT_SCHEMA = "segment_id string, n_records long, data binary"


def _iso(ts: datetime) -> bytes:
    # Sub-second precision is preserved (WARC 1.1-style fractional date)
    # whenever present, so pages -> WARC -> pages is an identity on warc_ts
    # for real microsecond fetch times; whole-second stamps keep the classic
    # WARC 1.0 form so existing byte fixtures are unchanged.
    if ts.microsecond:
        return ts.strftime("%Y-%m-%dT%H:%M:%S.%fZ").encode("ascii")
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode("ascii")


def _parse_iso(s: str) -> datetime:
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    return datetime.strptime(s, fmt)


def _hval(v: bytes) -> bytes:
    # Header values are externally controlled (crawled urls). CR/LF would
    # inject header lines or end the block early and desync segment framing,
    # so escape them percent-style; all other bytes pass through verbatim.
    # (One-way backstop for internal headers; the WARC-Target-URI uses the
    # REVERSIBLE :func:`_escape_uri` so distinct urls can never collide.)
    if b"\r" in v or b"\n" in v:
        v = v.replace(b"\r", b"%0D").replace(b"\n", b"%0A")
    return v


def _escape_uri(v: bytes) -> tuple[bytes, bool]:
    """Reversible CR/LF escaping for the WARC-Target-URI (ADVICE r04 #1):
    '%' is escaped FIRST ('%25'), so a url legitimately containing the
    literal text '%0D'/'%0A' can no longer render identical bytes to a url
    containing real CR/LF — the encoding is injective and
    :func:`_unescape_uri` inverts it exactly. Applied ONLY when the value
    actually carries CR/LF (raw CR/LF is invalid in an RFC 3986 URI, so
    this is the hostile-input path); ordinary urls — including every
    percent-encoded one — render verbatim, keeping foreign-WARC byte
    compatibility. Returns (escaped, was_escaped)."""
    if b"\r" not in v and b"\n" not in v:
        return v, False
    v = v.replace(b"%", b"%25").replace(b"\r", b"%0D").replace(b"\n", b"%0A")
    return v, True


def _unescape_uri(s: str) -> str:
    """Exact inverse of :func:`_escape_uri` (CR/LF first, then '%25' — the
    reverse substitution order makes the round trip an identity). Applied
    on parse ONLY when the record carries the ``WSS-URI-Escaped`` marker
    our packer writes, so foreign WARC segments — whose target URIs
    routinely contain legitimate percent-encodings like '%25'/'%0D' — are
    never corrupted by a spurious unescape."""
    return s.replace("%0D", "\r").replace("%0A", "\n").replace("%25", "%")


def _record(headers: list[tuple[bytes, bytes]], payload: bytes) -> bytes:
    head = b"WARC/1.0" + _CRLF
    head += b"".join(k + b": " + _hval(v) + _CRLF for k, v in headers)
    head += b"Content-Length: " + str(len(payload)).encode("ascii") + _CRLF
    return head + _CRLF + payload + _CRLF + _CRLF


def _gzip_member(raw: bytes) -> bytes:
    # mtime=0 → byte-deterministic members (gzip stamps wall time otherwise)
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(raw)
    return buf.getvalue()


def render_warc_segment(
    records: list[tuple[str, datetime, bytes]],
    segment_id: str,
    gzip_members: bool = False,
) -> bytes:
    """Render one WARC/1.0 segment: a warcinfo record, then one response
    record per (url, warc_ts, html) tuple, in the given order. Pure
    function — shared by the Spark packer and the tests' byte fixtures."""
    info_ts = min((ts for _, ts, _ in records), default=datetime(1970, 1, 1))
    info_payload = (
        b"software: " + _SOFTWARE + _CRLF + b"format: WARC File Format 1.0" + _CRLF
    )
    out = [
        _record(
            [
                (b"WARC-Type", b"warcinfo"),
                (b"WARC-Date", _iso(info_ts)),
                (b"WARC-Filename", segment_id.encode("utf-8")),
                (b"WARC-Record-ID", _rid(segment_id.encode("utf-8"))),
                (b"Content-Type", b"application/warc-fields"),
            ],
            info_payload,
        )
    ]
    for url, ts, html in records:
        http = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: text/html; charset=UTF-8" + _CRLF
            + b"Content-Length: " + str(len(html)).encode("ascii") + _CRLF
            + _CRLF + html
        )
        uri, escaped = _escape_uri(url.encode("utf-8"))
        headers = [
            (b"WARC-Type", b"response"),
            (b"WARC-Target-URI", uri),
            (b"WARC-Date", _iso(ts)),
            (b"WARC-Record-ID", _rid(url.encode("utf-8") + _iso(ts))),
            (b"Content-Type", b"application/http; msgtype=response"),
        ]
        if escaped:
            # extension field marking a reversibly-escaped URI; the parser
            # unescapes ONLY when it sees this, so foreign WARCs are safe
            headers.append((b"WSS-URI-Escaped", b"percent"))
        out.append(_record(headers, http))
    if gzip_members:
        return b"".join(_gzip_member(r) for r in out)
    return b"".join(out)


def _rid(key: bytes) -> bytes:
    return b"<urn:md5:" + hashlib.md5(key).hexdigest().encode("ascii") + b">"


def pages_to_warc(
    pages: DataFrame,
    n_segments: int,
    gzip_members: bool = False,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """Pack a pages table into WARC segment blobs:
    ``(segment_id string, n_records long, data binary)``.

    Segment assignment is a deterministic hash of the url (crc32 % n), so
    the same input yields the same segments under any partitioning; records
    within a segment are ordered (warc_ts, url). One shuffle (the groupBy),
    then each segment renders map-side in one Arrow batch.

    Header-value safety: CR/LF bytes in a url (externally controlled) are
    reversibly percent-escaped in the rendered WARC-Target-URI ('%' first,
    so the encoding is injective — ADVICE r04 #1), the record is tagged
    ``WSS-URI-Escaped: percent``, and :func:`parse_warc` inverts it — so
    pages → WARC → pages is an identity on EVERY url, hostile ones
    included, and two distinct input urls can never collide. Urls without
    CR/LF (every valid RFC 3986 URI) render byte-verbatim.
    """
    width = len(str(max(n_segments - 1, 1)))
    gz = bool(gzip_members)

    tagged = pages.select(
        F.format_string(
            f"segment-%0{width}d.warc" + (".gz" if gz else ""),
            (F.crc32(F.col(url_col).cast("string")) % n_segments).cast("int"),
        ).alias("segment_id"),
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
        F.col(html_col).alias("html"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["warc_ts", "url"], kind="mergesort")
        recs = [
            (u, ts.to_pydatetime(), bytes(h))
            for u, ts, h in zip(pdf["url"], pdf["warc_ts"], pdf["html"])
        ]
        sid = pdf["segment_id"].iloc[0]
        blob = render_warc_segment(recs, sid, gzip_members=gz)
        return pd.DataFrame(
            {"segment_id": [sid], "n_records": [len(recs)], "data": [blob]}
        )

    return tagged.groupBy("segment_id").applyInPandas(pack, schema=SEGMENT_SCHEMA)


def _split_members(blob: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip blob, or pass through raw
    WARC bytes."""
    if blob[:2] == b"\x1f\x8b":
        return gzip.decompress(blob)  # handles concatenated members
    return blob


def _parse_segment(segment_id: str, blob: bytes, strict: bool) -> Iterator[dict]:
    data = _split_members(blob)
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 5] != b"WARC/":
            if strict:
                raise ValueError(
                    f"{segment_id}: bad record framing at offset {pos}"
                )
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            if strict:
                raise ValueError(f"{segment_id}: unterminated header block")
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii").lower()] = v.strip().decode(
                "utf-8", "replace"
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError(
                    f"{segment_id}: missing or malformed Content-Length "
                    f"at offset {pos}"
                ) from None
            break  # framing unrecoverable without a length — keep the prefix
        body_start = hdr_end + 4
        payload = data[body_start:body_start + length]
        if len(payload) != length:
            if strict:
                raise ValueError(f"{segment_id}: truncated record payload")
            break
        pos = body_start + length + 4  # skip the \r\n\r\n record separator
        if headers.get("warc-type") != "response":
            continue
        http_end = payload.find(_CRLF + _CRLF)
        if http_end < 0:
            # Framing is intact (Content-Length consumed), so this is a
            # payload-level defect: strict rejects, lax skips just this record.
            if strict:
                raise ValueError(
                    f"{segment_id}: response payload has no HTTP header/body "
                    f"separator at offset {body_start}"
                )
            continue
        status_line = payload[:payload.find(_CRLF)].split(b" ")
        status = (
            int(status_line[1])
            if len(status_line) > 1 and status_line[1].isdigit()
            else None
        )
        ctype = None
        for line in payload[:http_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-type":
                ctype = v.strip().decode("ascii", "replace")
        uri = headers.get("warc-target-uri")
        if uri is not None and headers.get("wss-uri-escaped") == "percent":
            uri = _unescape_uri(uri)
        yield {
            "segment_id": segment_id,
            "url": uri,
            "warc_ts": _parse_iso(headers["warc-date"]),
            "html": payload[http_end + 4:],
            "http_status": status,
            "content_type": ctype,
        }


def parse_warc(
    segments: DataFrame,
    data_col: str = "data",
    id_col: str = "segment_id",
    strict: bool = True,
) -> DataFrame:
    """WARC segment blobs → pages-shaped rows:
    ``(segment_id, url, warc_ts, html, http_status, content_type)``.

    Non-response records (warcinfo, request, metadata) are skipped. With
    ``strict`` (default) corrupt framing or a defective record payload
    raises; ``strict=False`` stops at the first framing defect of a segment
    keeping what parsed (the Common Crawl truncated-tail tolerance), and
    skips individual records whose HTTP payload lacks a header/body
    separator. No shuffle — pure mapInPandas over the input's own
    partitioning; only (id, data) columns are read."""
    src = segments.select(
        F.col(id_col).alias("segment_id"), F.col(data_col).alias("data")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "segment_id", "url", "warc_ts", "html", "http_status", "content_type",
        ]
        for pdf in batches:
            rows: list[dict] = []
            for sid, blob in zip(pdf["segment_id"], pdf["data"]):
                rows.extend(_parse_segment(sid, bytes(blob), strict))
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(gen, schema=PARSED_SCHEMA)


def stream_warc(spark, warc_dir: str, glob: str = "*.{warc,warc.gz}",
                strict: bool = True,
                max_files_per_trigger: int | None = None,
                max_file_age: str = "36500d") -> DataFrame:
    """Streaming WARC ingest: watch ``warc_dir`` for arriving segment files
    (the shape of a Common Crawl drop landing in object storage) and emit
    pages-shaped rows. Built on the ``binaryFile`` file source, so Spark's
    streaming file index gives exactly-once pickup per segment file across
    restarts (checkpointed source offsets) — no segment is parsed twice.
    ``parse_warc`` supplies the same zero-shuffle mapInPandas parse as the
    batch path; downstream compose the existing streaming stages
    (stream_extract_entities, foreach_batch_dedup_append).

    No-skip caveats a producer must respect:

    - Files must be placed ATOMICALLY (write elsewhere, then rename/move
      in). The file source never re-reads a seen path, so a half-copied
      file whose visible prefix parses cleanly would commit and lose its
      tail forever. The default ``glob`` matches only final ``.warc`` /
      ``.warc.gz`` names, so the write-to-temp-suffix-then-rename
      convention keeps in-progress files invisible.
    - ``max_file_age`` defaults to effectively-unbounded (100 years),
      overriding the file source's 7-day default which silently ignores
      late-arriving files with old preserved mtimes (rsync -a /
      object-store copies).

    ``max_files_per_trigger`` bounds per-microbatch work for steady-state
    backfill (a 100 TB drop arrives as ~10^5 segment files; unbounded, the
    first trigger would swallow them all)."""
    reader = (
        spark.readStream.format("binaryFile")
        # the binaryFile source's fixed schema, required explicitly when
        # streaming (no inference pass over a possibly-empty dir)
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", glob)
        .option("maxFileAge", max_file_age)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    seg = reader.load(warc_dir).select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("segment_id"),
        F.col("content").alias("data"),
    )
    return parse_warc(seg, strict=strict)
