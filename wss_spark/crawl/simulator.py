"""Single-threaded reference crawl simulator (crawl-order oracle).

A ~100-line plain-Python implementation of the reference's crawl semantics —
targets in config order, stages in program order (content → full-text →
album → comment pages → repost pages until empty → author profile;
`独立版/WeiboDeepAnalyzer.py:693-736`), URL-seen as an exact set, per-host
politeness budget per wave — with NO Spark. Equivalence tests
(SURVEY.md §5.3) assert the engine's visit order and final seen set equal
this simulator's, under the same seed list + budget.
"""

from __future__ import annotations

import re
from datetime import datetime

from wss_spark.extraction import kernel
from wss_spark.extraction.kernel import ANCHOR

_HOST = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]+)")


def canonicalize(url: str) -> str:
    """Mirror of functions.urls.canonicalize_url (kept independent on purpose:
    two implementations cross-check each other in tests)."""
    url = re.sub(r"#.*$", "", url)
    m = re.match(r"^([a-z][a-z0-9+.-]*://[^/?#]+)(.*)$", url)
    scheme_host, rest = m.group(1).lower(), m.group(2)
    rest = re.sub(r"\?page=1$", "", rest)
    rest = re.sub(r"\?$", "", rest)
    if rest == "":
        rest = "/"
    if len(rest) > 1 and rest.endswith("/"):
        rest = rest.rstrip("/") or "/"  # all trailing slashes (fixpoint)
    return scheme_host + rest


def _host(url: str) -> str:
    return _HOST.match(url).group(1)


def _discover(url: str, html: bytes, now: datetime,
              frontier_page: int = 1) -> list[tuple[int, int, str]]:
    """(stage, page, url) children of one fetched page — the reference's
    program-order expansion, same rules as crawl.discover.

    ``frontier_page`` is the fetched row's own frontier page: hotflow cursor
    URLs don't carry a page number, so the chain depth lives in the frontier
    (mirrors discover()'s ``_src_page + 1``)."""
    root = kernel.parse_html(html)
    kind, rid, page = kernel.classify_url(url)
    if kind == "api_comments":
        page = frontier_page
    host = _host(url)
    out: list[tuple[int, int, str]] = []
    if kind == "comment" and page == 1:
        w = kernel.extract_weibo_from_page(root, now, rid or "")
        if w is not None:
            if w["fulltext_href"]:
                href = w["fulltext_href"]
                if not href.startswith("http"):
                    href = f"https://{host}{href}"
                out.append((1, 1, href))
            if w["album_href"]:
                href = w["album_href"]
                if not href.startswith("http"):
                    href = f"https://{host}{href}"
                out.append((2, 1, href))
            for p in range(2, w["total_comment_pages"] + 1):
                out.append((3, p, f"https://{host}/comment/{rid}?page={p}"))
            out.append((4, 1, f"https://{host}/repost/{rid}?page=1"))
            if w["user_id"]:
                out.append((5, 1, f"https://{host}/{w['user_id']}/info"))
    elif kind == "repost":
        if kernel.extract_reposts_from_page(root, now):
            out.append((4, page + 1, f"https://{host}/repost/{rid}?page={page + 1}"))
    elif kind == "search":
        hits = kernel.extract_search_from_page(root, now)
        for h in hits:
            if h["album_href"]:
                href = h["album_href"]
                if not href.startswith("http"):
                    href = f"https://{host}{href}"
                out.append((2, 1, href))
            if h["publisher_uid"] and h["publisher_href"]:
                phost = _host(h["publisher_href"])
                out.append((5, 1, f"https://{phost}/{h['publisher_uid']}/info"))
        if hits:
            # continuation keeps the FULL query string (advanced windows send
            # advancedfilter/starttime/endtime on every page,
            # `独立版/WeiboTopicScrapy.py:438-446`); only the page param moves
            if re.search(r"[?&]page=\d+", url):
                nurl = re.sub(r"([?&]page=)\d+", rf"\g<1>{page + 1}", url)
            else:
                nurl = f"{url}&page={page + 1}"
            out.append((6, page + 1, nurl))
    elif kind == "api_comments":
        cur = kernel.parse_api_comments(html)["max_id"]
        if cur is not None and cur != "0":
            out.append((7, page + 1,
                        f"https://{host}/comments/hotflow?id={rid}&mid={rid}"
                        f"&max_id={cur}&max_id_type=0"))
    elif kind == "supertopic":
        st = kernel.parse_supertopic(html)
        if st["photos"] and st["since_id"] is not None:
            # resend the same params with page incremented in place and
            # since_id replaced/appended (`WeiboSuperTopicActiveUserSpider
            # .py:150-155`); empty album page stops the chain (`:122-125`)
            nurl = re.sub(r"([?&]page=)\d+", rf"\g<1>{page + 1}", url)
            if re.search(r"[?&]since_id=[^&]*", nurl):
                nurl = re.sub(r"([?&]since_id=)[^&]*", rf"\g<1>{st['since_id']}", nurl)
            else:
                nurl = f"{nurl}&since_id={st['since_id']}"
            out.append((8, page + 1, nurl))
    return out


def simulate(
    pages: dict[str, bytes],
    seed_urls: list[str],
    budget: int,
    max_waves: int = 200,
    robots_blocked_prefixes: list[tuple[str, str]] | None = None,
    now: datetime = ANCHOR,
    log: list[dict] | None = None,
    crawl_delays: dict[str, float] | None = None,
    wave_seconds: float = 30.0,
) -> tuple[list[str], set[str]]:
    """→ (visit order of canon urls, final seen set). ``pages`` maps the
    exact url → html bytes (fetch is by literal url, like the reference).

    Pass ``log=[]`` to also record one dict per admitted url
    (canon_url, host, wave, rank_in_wave, stage, page, status) — the
    engine's fetch-log shape, used as the crawl_fetch_log oracle.

    ``crawl_delays`` maps host → declared robots crawl_delay: that host's
    per-wave cap becomes min(budget, max(1, floor(wave_seconds / delay))),
    and a delay LONGER than a wave additionally gates the host to waves
    where ``wave % ceil(delay / wave_seconds) == 0`` — the same rules as
    politeness.host_budgets/per_host_topk, kept independent so the two
    implementations cross-check each other."""
    import math

    blocked_rules = robots_blocked_prefixes or []
    delays = crawl_delays or {}
    has_periods = any(
        d and d > 0 and math.ceil(d / wave_seconds) > 1 for d in delays.values()
    )

    def host_cap(h: str, wave: int) -> int:
        d = delays.get(h)
        if d is None or d <= 0:  # absent / null / "Crawl-delay: 0" = no cap
            return budget
        period = max(1, math.ceil(d / wave_seconds))
        if period > 1 and wave % period != 0:
            return 0  # off-wave: the host's urls defer to the next wave
        return min(budget, max(1, int(wave_seconds // d)))

    def is_blocked(canon: str) -> bool:
        h = _host(canon)
        path = re.sub(r"^[a-z][a-z0-9+.-]*://[^/]+", "", canon)
        return any(h == bh and path.startswith(bp) for bh, bp in blocked_rules)

    # frontier rows: (priority, seed_order, stage, page, canon, url)
    frontier = [
        (0.0, i, 0, 1, canonicalize(u), u) for i, u in enumerate(seed_urls)
    ]
    seen: set[str] = set()
    order: list[str] = []
    wave = 0
    while frontier and wave < max_waves:
        # in-wave dedup keep-best; ``url`` is the final tiebreak, matching
        # frontier._dedup_in_wave (two distinct urls can share a canon form
        # with identical ordering keys — the kept representative must agree)
        best: dict[str, tuple] = {}
        for row in frontier:
            c = row[4]
            if c not in best or row[:4] + (c, row[5]) < best[c][:4] + (c, best[c][5]):
                best[c] = row
        new = [r for r in best.values() if r[4] not in seen]
        allowed = []
        for r in new:
            if is_blocked(r[4]):
                seen.add(r[4])
            else:
                allowed.append(r)
        allowed.sort(key=lambda r: (r[0], r[1], r[2], r[3], r[4]))
        taken_per_host: dict[str, int] = {}
        admitted, deferred = [], []
        for r in allowed:
            h = _host(r[4])
            if taken_per_host.get(h, 0) < host_cap(h, wave):
                taken_per_host[h] = taken_per_host.get(h, 0) + 1
                admitted.append(r)
            else:
                deferred.append(r)
        nxt: list[tuple] = []
        rank_per_host: dict[str, int] = {}
        for r in admitted:
            prio, seed_order, stage, page, canon, url = r
            seen.add(canon)
            order.append(canon)
            html = pages.get(url)
            if log is not None:
                h = _host(canon)
                rank_per_host[h] = rank_per_host.get(h, 0) + 1
                log.append(
                    {
                        "canon_url": canon,
                        "host": h,
                        "wave": wave,
                        "rank_in_wave": rank_per_host[h],
                        "stage": stage,
                        "page": page,
                        "status": 200 if html is not None else 404,
                    }
                )
            if html is None:
                continue
            for cstage, cpage, curl in _discover(url, html, now, frontier_page=page):
                nxt.append((prio, seed_order, cstage, cpage, canonicalize(curl), curl))
        frontier = deferred + nxt
        if not admitted and deferred and not has_periods:
            # with period-gated hosts an all-deferred wave just means every
            # remaining host is off-wave — tick forward (bounded by
            # max_waves) until the next on-wave
            break
        wave += 1
    return order, seen


# ---------------------------------------------------------------------------
# single-threaded cuckoo-filter replica (oracle for the cuckoo_membership
# gate) — same published spec as crawl/cuckoo.py (Fan et al. 2014 + the
# splitmix64 finalizer), implemented independently: plain-int math and
# list-of-lists rows here vs the engine's vectorized numpy tables.
# ---------------------------------------------------------------------------

_U64 = (1 << 64) - 1


def splitmix64(x: int) -> int:
    """Public-domain splitmix64 finalizer on unsigned 64-bit ints."""
    x &= _U64
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _U64
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _U64
    return x ^ (x >> 31)


def _cuckoo_addr(url_hash: int, n_slots: int):
    """(fp, row1, row2) per the shared spec: fp = top 16 bits of the remixed
    hash (0 remapped to 1), partner row via the odd fp-keyed xor offset."""
    mix = splitmix64(url_hash)
    fp = mix >> 48
    if fp == 0:
        fp = 1
    i1 = mix & (n_slots - 1)
    off = ((fp * 0x5BD1E995) & (n_slots - 1)) | 1
    return fp, i1, i1 ^ off


def simulate_cuckoo(keys, insert_ids, delete_ids, n_slots: int, width: int,
                    max_kicks: int):
    """Replay insert → delete → probe over ``keys`` =
    [(key_id, bucket, url_hash)]; returns [(key_id, maybe_seen)] for every
    key. Inserts and deletes are applied in url_hash order within each
    bucket — the engine's partition-invariance rule — and the victim-slot
    walk is (fp + kick) % width, starting the eviction chain at row2."""
    buckets: dict[int, dict] = {}

    def bucket_state(b):
        if b not in buckets:
            buckets[b] = {"rows": [[0] * width for _ in range(n_slots)],
                          "stash": []}
        return buckets[b]

    def insert(st, h):
        fp, i1, i2 = _cuckoo_addr(h, n_slots)
        for i in (i1, i2):
            row = st["rows"][i]
            for j in range(width):
                if row[j] == 0:
                    row[j] = fp
                    return
        i, f = i2, fp
        for kick in range(max_kicks):
            j = (f + kick) % width
            f, st["rows"][i][j] = st["rows"][i][j], f
            i = i ^ ((((f * 0x5BD1E995) & (n_slots - 1)) | 1))
            row = st["rows"][i]
            for jj in range(width):
                if row[jj] == 0:
                    row[jj] = f
                    return
        st["stash"].append((i << 16) | f)

    def delete(st, h):
        fp, i1, i2 = _cuckoo_addr(h, n_slots)
        for i in (i1, i2):
            row = st["rows"][i]
            for j in range(width):
                if row[j] == fp:
                    row[j] = 0
                    return
        for i in (i1, i2):
            ent = (i << 16) | fp
            if ent in st["stash"]:
                st["stash"].remove(ent)
                return

    def probe(st, h):
        fp, i1, i2 = _cuckoo_addr(h, n_slots)
        if fp in st["rows"][i1] or fp in st["rows"][i2]:
            return True
        return ((i1 << 16) | fp) in st["stash"] or (
            (i2 << 16) | fp) in st["stash"]

    by_id = {k[0]: k for k in keys}
    for phase, ids in (("ins", insert_ids), ("del", delete_ids)):
        per_bucket: dict[int, list] = {}
        for kid in ids:
            _kid, b, h = by_id[kid]
            per_bucket.setdefault(b, []).append(h)
        for b, hashes in per_bucket.items():
            st = bucket_state(b)
            # the engine sorts int64 hashes (np.sort on a signed dtype), so
            # the replica applies the same SIGNED order; addressing masks
            # to 64 bits inside splitmix64 either way
            for h in sorted(hashes):
                (insert if phase == "ins" else delete)(st, h)
    out = []
    for kid, b, h in keys:
        st = bucket_state(b)
        out.append((kid, probe(st, h)))
    return out
