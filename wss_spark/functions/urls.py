"""URL canonicalization, salted hashing, and family classification.

All JVM-side Column expressions (whole-stage-codegen friendly) — no Python in
the hot path. The salted-hash partitioning is the north-rule skew killer: the
reference's world is one host (weibo.cn ≈ 100% of traffic), so partitioning a
10^10-row frontier by host would collapse to one task; partitioning by
``xxhash64(canon_url, salt)`` spreads uniformly regardless of host skew.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SALT = 0x5EED_CAFE
DEFAULT_BUCKETS = 1024  # seen-filter state buckets; at 10^10 urls → ~10M urls/bucket


def host_of(url: Column | str) -> Column:
    """scheme://HOST/... → host (politeness grouping key, W3)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form for the URL-seen set:

    - lowercase scheme+host
    - strip fragment
    - drop a trailing ``?`` / trailing ``/`` on non-root paths
    - treat explicit ``?page=1`` as the bare page (the reference fetches
      ``/comment/W`` and ``/comment/W?page=1`` as distinct requests but they
      are the same resource; dedup must see one URL)
    """
    c = F.col(url) if isinstance(url, str) else url
    c = F.regexp_replace(c, r"#.*$", "")
    scheme_host = F.lower(F.regexp_extract(c, r"^([a-z][a-z0-9+.-]*://[^/?#]+)", 1))
    rest = F.regexp_replace(c, r"^[a-z][a-z0-9+.-]*://[^/?#]+", "")
    rest = F.regexp_replace(rest, r"\?page=1$", "")
    rest = F.regexp_replace(rest, r"\?$", "")
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    # ALL trailing slashes, not one per application: the seen key must be a
    # fixpoint (re-canonicalizing a checkpointed canonical url is a no-op) —
    # hypothesis found '/XY//' → '/XY/' → '/XY' under the single-strip form
    rest = F.regexp_replace(rest, r"(.+?)/+$", "$1")
    return F.concat(scheme_host, rest)


def url_hash(canon: Column | str, salt: int = DEFAULT_SALT) -> Column:
    """Salted 64-bit hash of the canonical url (xxhash64, JVM-side)."""
    c = F.col(canon) if isinstance(canon, str) else canon
    return F.xxhash64(c, F.lit(salt))


def bucket_of(hash_col: Column | str, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    c = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    return F.pmod(c, F.lit(n_buckets)).cast("int")


def classify_url_cols(url: Column | str) -> dict[str, Column]:
    """URL family columns (FIXTURES.md §1 families) — pure regex, JVM-side."""
    c = F.col(url) if isinstance(url, str) else url
    kind = (
        F.when(c.rlike(r"^https?://[^/]+/comment/"), F.lit("comment"))
        .when(c.rlike(r"^https?://[^/]+/repost/"), F.lit("repost"))
        .when(c.rlike(r"^https?://[^/]+/mblog/picAll/"), F.lit("album"))
        .when(c.rlike(r"^https?://[^/]+/\d+/info"), F.lit("info"))
        .otherwise(F.lit("other"))
    )
    wid = F.regexp_extract(c, r"^https?://[^/]+/(?:comment|repost|mblog/picAll)/([^/?#]+)", 1)
    uid = F.regexp_extract(c, r"^https?://[^/]+/(\d+)/info", 1)
    page = F.coalesce(
        F.nullif(F.regexp_extract(c, r"[?&]page=(\d+)", 1), F.lit("")).cast("int"),
        F.lit(1),
    )
    return {"kind": kind, "wid": wid, "uid": uid, "page": page}
