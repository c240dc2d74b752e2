"""Property-based tests (hypothesis) for the pure-function layer.

These pin INVARIANTS rather than examples: the base62 codec's roundtrip
domain (the reference's unpadded-JS grouping algorithm,
`独立版/WeiboSuperCommentScrapy.py:40-112`, only aligns when every
non-leading 7-digit group renders to exactly 4 base62 chars — real weibo
ids satisfy this by construction), and URL canonicalization idempotence
(the seen-set key must be a fixpoint: canonicalizing twice must never
produce a third form, or the exact seen anti-join would re-admit urls).
Spark-backed properties batch all examples into ONE job per test — a
per-example Spark action would be 100x slower for the same coverage.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from wss_spark.functions.base62 import (
    STR62,
    id_to_mid,
    int10to62,
    mid_to_id,
    str62to10,
)

# a 7-digit group that renders to exactly 4 base62 chars: >= 62^3
_aligned_group = st.integers(min_value=62**3, max_value=9_999_999)
# leading group: any positive value with no leading-zero render
_lead_group = st.integers(min_value=1, max_value=9_999_999)


@st.composite
def aligned_ids(draw):
    """Decimal id strings in the codec's alignment-safe domain (1-4 groups,
    i.e. up to 28 digits — wider than real 16-17 digit weibo ids)."""
    tail = draw(st.lists(_aligned_group, min_size=0, max_size=3))
    lead = draw(_lead_group)
    return str(lead) + "".join(f"{g:07d}" for g in tail)


@given(aligned_ids())
@settings(max_examples=300, deadline=None)
def test_base62_roundtrip_on_aligned_domain(weibo_id):
    assert mid_to_id(id_to_mid(weibo_id)) == weibo_id


@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=300, deadline=None)
def test_int62_codec_inverse_and_charset(n):
    s = int10to62(n)
    assert str62to10(s) == n
    assert all(c in STR62 for c in s)
    # canonical render: no leading zero digit (0 renders empty, JS parity)
    assert s == "" if n == 0 else not s.startswith("0")


@given(st.lists(_aligned_group, min_size=1, max_size=4))
@settings(max_examples=200, deadline=None)
def test_base62_group_render_width(groups):
    # every aligned group renders to EXACTLY 4 chars — the alignment
    # invariant the decoder's fixed 4-char regrouping depends on
    for g in groups:
        assert len(int10to62(g)) == 4


# ---------------------------------------------------------------------------
# Spark-backed properties: one batch per test


_urlish = st.one_of(
    # realistic crawl-space urls
    st.builds(
        lambda host, path, page, frag: f"https://{host}/{path}"
        + (f"?page={page}" if page else "")
        + (f"#{frag}" if frag else ""),
        st.sampled_from(["weibo.cn", "Weibo.CN", "m.weibo.cn", "a.example"]),
        st.text(alphabet="abcXYZ019/_-", min_size=0, max_size=20),
        st.integers(min_value=0, max_value=3),
        st.text(alphabet="abc", min_size=0, max_size=3),
    ),
    # adversarial junk (no scheme, unicode, empties)
    st.text(min_size=0, max_size=30),
)


def test_canonicalize_idempotent_and_bucket_range(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) and the salted
    bucket always lands in [0, n_buckets) — over a hypothesis-generated
    corpus evaluated in ONE Spark job."""
    from pyspark.sql import functions as F

    from wss_spark.functions import urls as U

    examples: list[str] = []
    seen = set()

    @given(_urlish)
    @settings(max_examples=400, deadline=None, database=None)
    def collect(u):
        if u not in seen:
            seen.add(u)
            examples.append(u)

    collect()
    df = spark.createDataFrame([(u,) for u in examples], "url string")
    once = U.canonicalize_url(F.col("url"))
    out = df.select(
        "url",
        once.alias("c1"),
        U.canonicalize_url(once).alias("c2"),
        U.bucket_of(U.url_hash(once), 64).alias("bkt"),
    ).collect()
    non_idem = [(r["url"], r["c1"], r["c2"]) for r in out if r["c1"] != r["c2"]]
    assert not non_idem, f"canonicalize not idempotent: {non_idem[:5]}"
    assert all(0 <= r["bkt"] < 64 for r in out)


def test_canonicalize_merges_same_resource_forms(spark):
    """The equivalence classes the seen set depends on: fragment-stripped,
    ?page=1-stripped, and trailing-slash forms of the same resource all
    canonicalize to one key; page>=2 stays distinct."""
    from pyspark.sql import functions as F

    from wss_spark.functions import urls as U

    base = "https://weibo.cn/comment/Abc123"
    forms = [base, base + "#frag", base + "?page=1", base + "/"]
    df = spark.createDataFrame([(u,) for u in forms + [base + "?page=2"]],
                               "url string")
    got = [r[0] for r in df.select(U.canonicalize_url(F.col("url"))).collect()]
    assert len(set(got[:4])) == 1
    assert got[4] != got[0]


def test_scrub_pii_total_and_idempotent(spark):
    """scrub_pii is a total function over arbitrary unicode (never raises,
    row count preserved) and a FIXPOINT: scrubbing twice equals scrubbing
    once — masks contain no digits, so a second pass can find nothing new.
    Seeded fuzz corpus; all examples batch into ONE Spark job."""
    import random

    from wss_spark.operators import corpus

    rng = random.Random(20260818)
    alphabet = "ab9@.+-() <>\t\n\\[]{}^$*?|/:;表情😀é "
    samples = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(81)))
               for _ in range(120)]
    # salt with adversarial hand-picks the fuzzer rarely produces
    samples += [
        "a@b.co9876543210", "++++1 (555) 010-0042", "(((((", "\\d+ [0-9]",
        "1.2.3.4.5.6.7.8", "+000000000000000000000", "  \t\r\n  ",
        "@@@@", "e@e.ee e@e.ee e@e.ee", "255.255.255.255.255",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(samples)], "doc_id long, text string"
    )
    once = corpus.scrub_pii(docs).select("doc_id", "text")
    twice = corpus.scrub_pii(once).select("doc_id", "text")
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert len(a) == len(samples)
    diffs = {k: (a[k], b[k]) for k in a if a[k] != b[k]}
    assert not diffs, f"scrub not a fixpoint: {list(diffs.items())[:3]}"


def test_pack_sequences_gapless_under_arbitrary_docs(spark):
    """pack_sequences offsets form a gapless concatenation stream per group
    for ARBITRARY documents — empty, whitespace-only, giant — and the bin
    law holds everywhere. Seeded fuzz; one Spark job for the whole corpus."""
    import random

    from wss_spark.operators import corpus

    rng = random.Random(42)
    rows = []
    for i in range(150):
        n_words = rng.randrange(41) if i % 3 else 0   # plenty of empties
        rows.append((i, " ".join(["w"] * n_words)))
    rows.append((998, "   \t  "))
    rows.append((999, ""))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = corpus.pack_sequences(docs, max_tokens=7, n_groups=5).collect()
    assert len(out) == len(rows)
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    for grp, rs in by_grp.items():
        # zero-token docs share their neighbor's offset: sort them after the
        # token-bearing doc at the same offset and track the stream frontier
        # as a running max so they can't clobber it
        expect = 0
        ordered = sorted(rs, key=lambda r: (r["start_offset"],
                                            -r["n_tokens"], r["doc_id"]))
        for r in ordered:
            assert r["start_offset"] == expect or r["n_tokens"] == 0, (grp, r)
            assert r["bin"] == r["start_offset"] // 7
            expect = max(expect, r["start_offset"] + r["n_tokens"])
        assert expect == sum(r["n_tokens"] for r in rs)   # stream covers all
