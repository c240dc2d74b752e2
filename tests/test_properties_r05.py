"""Property-based tests (hypothesis) for the round-5 pure layer: the BPE
sentinel-string encoding, the scale-aware SRP operating point, and the
text→embedding featurizer.

Same conventions as test_properties.py: pure-Python properties run
per-example; Spark-backed properties batch every hypothesis example into
ONE job (a per-example Spark action would be 100x slower for the same
coverage). Alphabets stay in the BMP and avoid locale-sensitive case
mappings (ASCII + CJK), so Python replicas mirror the JVM exactly — the
cross-engine contract itself is value-gated by the DuckDB oracles
(bpe_train_merges / dd_text_embedding_dedup), not by these replicas.
"""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from wss_spark.operators.similarity import srp_scaled_params
from wss_spark.operators.tokenize import EOW, SENT, merge_needle

# symbol alphabet: ASCII letters/digits + CJK — no space, no sentinels,
# no case-mapping surprises
_sym_chars = "abcxyzXYZ019一微博热评香港"
_word = st.text(alphabet=_sym_chars, min_size=1, max_size=8)


# ---------------------------------------------------------------------------
# BPE: the sentinel-string literal replace IS the reference list merge
# ---------------------------------------------------------------------------


def _render_syms(word: str) -> list[str]:
    """Reference initial symbols (Sennrich: chars, last carries </w>)."""
    syms = list(word)
    syms[-1] += EOW
    return syms


def _state_of(syms: list[str]) -> str:
    return "".join(SENT + s + " " for s in syms)


def _parse_state(state: str) -> list[str]:
    return [tok[1:] for tok in state.split(" ") if tok]


def _merge_list(syms: list[str], a: str, b: str) -> list[str]:
    """The reference merge: left-to-right, non-overlapping (the published
    BPE algorithm's pair substitution over the symbol sequence)."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@st.composite
def _word_and_merges(draw):
    """A word plus a chain of merges, each drawn from pairs ACTUALLY
    adjacent at that point (like real training rounds)."""
    word = draw(_word)
    syms = _render_syms(word)
    merges = []
    for _ in range(draw(st.integers(min_value=0, max_value=4))):
        if len(syms) < 2:
            break
        i = draw(st.integers(min_value=0, max_value=len(syms) - 2))
        a, b = syms[i], syms[i + 1]
        merges.append((a, b))
        syms = _merge_list(syms, a, b)
    return word, merges


@given(_word_and_merges())
@settings(max_examples=400, deadline=None)
def test_bpe_state_replace_equals_list_merge(word_and_merges):
    """str.replace on the sentinel-string state (the exact left-to-right
    non-overlapping scan SQL replace performs — what train_bpe/apply_merges
    execute) produces the SAME symbol sequence as the reference list-based
    pair merge, for every word and every chain of actually-adjacent merges
    — including consecutive-identical pairs (a a a a → aa aa), the case a
    naive space-delimited needle gets wrong."""
    word, merges = word_and_merges
    syms = _render_syms(word)
    state = _state_of(syms)
    for a, b in merges:
        needle, repl = merge_needle(a, b)
        state = state.replace(needle, repl)
        syms = _merge_list(syms, a, b)
        assert _parse_state(state) == syms, (word, merges, a, b)
    # the state string stays well-formed: concatenating symbols recovers
    # the rendered word regardless of merge history
    assert "".join(_parse_state(state)) == word + EOW


# ---------------------------------------------------------------------------
# srp_scaled_params: the scale rule's math contract
# ---------------------------------------------------------------------------


@given(
    st.integers(min_value=1, max_value=10**10),
    st.floats(min_value=0.05, max_value=0.99),
)
@settings(max_examples=400, deadline=None)
def test_srp_scaled_params_contract(n, threshold):
    b, tables = srp_scaled_params(n, threshold)
    assert 3 <= b <= 24 and 1 <= tables <= 64
    # gate fixed point: at and below the base operating region the rule
    # returns exactly the baked (3, 8) so sf0.01 oracles stay valid
    if n <= 200 * 2**3:
        assert (b, tables) == (3, 8)
    # planes are monotone non-decreasing in n (until the cap)
    b2, _ = srp_scaled_params(2 * n, threshold)
    assert b2 >= b
    # recall contract: pair-miss probability never exceeds the (3, 8)
    # base point's — guaranteed whenever the table cap is not active
    # (at the cap the documented trade is volume over recall headroom)
    if tables < 64 and b > 3:
        p1 = 1.0 - math.acos(threshold) / math.pi
        delta_base = (1.0 - p1**3) ** 8
        assert (1.0 - p1**b) ** tables <= delta_base + 1e-12


# ---------------------------------------------------------------------------
# Spark-backed: embed_text vs a pure-Python replica, one batched job
# ---------------------------------------------------------------------------

_ASCII_WS_RE = r"[ \t\n\x0B\f\r]+"
_textish = st.text(
    alphabet="abc XYZ01一微博热评香港\t\n\x0b\f\r.,!?-",
    min_size=0,
    max_size=40,
)


def _replica_embed(text: str, dim: int, n: int) -> list[float]:
    norm = re.sub(_ASCII_WS_RE, " ", (text or "").lower()).strip()
    vec = [0.0] * dim
    for off in range(len(norm) - n + 1):
        g = norm[off : off + n]
        h = int(hashlib.md5(("emb:" + g).encode("utf-8")).hexdigest()[:7], 16)
        vec[h % dim] += 1.0 if (h // dim) % 2 == 0 else -1.0
    return vec


def test_embed_text_matches_python_replica(spark):
    """The hashed signed char-n-gram projection is exactly the documented
    pure function of the text — over a hypothesis corpus (CJK, collapsed
    whitespace runs incl. \\x0B, shorter-than-n and empty strings)
    evaluated in ONE Spark job. Short/empty text must yield the all-zero
    vector, never bogus grams from a descending sequence()."""
    from wss_spark.operators.similarity import embed_text

    examples: list[str] = []
    seen = set()

    @given(_textish)
    @settings(max_examples=300, deadline=None, database=None)
    def collect(t):
        if t not in seen:
            seen.add(t)
            examples.append(t)

    collect()
    dim, n = 8, 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(examples)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["embedding"])
        for r in embed_text(df, dim=dim, n=n).collect()
    }
    assert set(got) == set(range(len(examples)))
    bad = [
        (t, got[i], _replica_embed(t, dim, n))
        for i, t in enumerate(examples)
        if got[i] != _replica_embed(t, dim, n)
    ]
    assert not bad, f"embed_text diverged from replica: {bad[:3]}"


def test_pretokens_chunk_invariants(spark):
    """_pretokens (the BPE pre-tokenizer): every emitted word is non-empty,
    carries no whitespace/sentinel bytes, respects max_word_len, and the
    concatenation of words equals the normalized text with spaces removed
    (chunking splits, never drops or reorders) — one batched Spark job."""
    from pyspark.sql import functions as F

    from wss_spark.operators.dedup import normalize_text
    from wss_spark.operators.tokenize import _pretokens

    examples: list[str] = []
    seen = set()

    @given(
        st.text(
            alphabet="ab 香港微博\x01\x02\t\n\x0b",
            min_size=0,
            max_size=30,
        )
    )
    @settings(max_examples=300, deadline=None, database=None)
    def collect(t):
        if t not in seen:
            seen.add(t)
            examples.append(t)

    collect()
    # tiny max_word_len so chunking actually fires on the CJK runs
    wlen = 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(examples)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id",
        _pretokens(F.col("text"), wlen).alias("words"),
        normalize_text(F.col("text")).alias("norm"),
    ).collect()
    for r in rows:
        words = list(r["words"])
        assert all(w and len(w) <= wlen for w in words), (r["doc_id"], words)
        assert all(
            not re.search(r"[ \t\n\x0B\f\r\x01\x02]", w) for w in words
        ), words
        assert "".join(words) == re.sub(
            "[ \x01\x02]", "", r["norm"] or ""
        ), (r["norm"], words)


# ---------------------------------------------------------------------------
# cuckoo filter pure layer (crawl/cuckoo.py vs simulator.simulate_cuckoo)
# ---------------------------------------------------------------------------

@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
             min_size=1, max_size=120, unique=True),
    st.data(),
)
@settings(max_examples=200, deadline=None)
def test_cuckoo_numpy_layer_equals_replica(hashes, data):
    """The engine's vectorized fingerprint/row math and insert/delete walk
    (numpy, crawl/cuckoo.py) must agree with the independent plain-int
    replica (simulator.simulate_cuckoo) on random key sets with a random
    delete subset, at an UNDERSIZED table so eviction chains and the stash
    are exercised — membership flags identical for every key."""
    import numpy as np

    from wss_spark.crawl import cuckoo
    from wss_spark.crawl.simulator import simulate_cuckoo

    n_slots, width, kicks = 8, 2, 6
    n_del = data.draw(st.integers(min_value=0, max_value=len(hashes)))
    dels = hashes[:n_del]

    # engine pure layer: replicate update()'s inner merge on one bucket
    tbl = np.zeros((n_slots, width), dtype=np.uint16)
    stash: list = []
    srt = np.sort(np.array(hashes, dtype=np.int64))
    fp, i1, i2 = cuckoo._fp_rows(srt, n_slots)
    for f, a, b in zip(fp.tolist(), i1.tolist(), i2.tolist()):
        cuckoo._insert_one(tbl, stash, f, a, b, n_slots, width, kicks)
    # delete via the same scan order delete() uses
    dsrt = np.sort(np.array(dels, dtype=np.int64)) if dels else np.array([], dtype=np.int64)
    dfp, di1, di2 = cuckoo._fp_rows(dsrt, n_slots)
    for f, a, b in zip(dfp.tolist(), di1.tolist(), di2.tolist()):
        removed = False
        for i in (a, b):
            row = tbl[i]
            for j in range(width):
                if row[j] == f:
                    row[j] = 0
                    removed = True
                    break
            if removed:
                break
        if not removed:
            for i in (a, b):
                key = (i << 16) | f
                if key in stash:
                    stash.remove(key)
                    break

    # engine probe (vectorized)
    probe = np.array(hashes, dtype=np.int64)
    pfp, pi1, pi2 = cuckoo._fp_rows(probe, n_slots)
    pi1 = pi1.astype(np.int64)
    pi2 = pi2.astype(np.int64)
    maybe = (tbl[pi1] == pfp[:, None].astype(np.uint16)).any(axis=1) | (
        tbl[pi2] == pfp[:, None].astype(np.uint16)).any(axis=1)
    if stash:
        sarr = np.asarray(stash, dtype=np.uint64)
        maybe |= np.isin((pi1.astype(np.uint64) << np.uint64(16)) | pfp, sarr)
        maybe |= np.isin((pi2.astype(np.uint64) << np.uint64(16)) | pfp, sarr)

    keys = [(i, 0, h) for i, h in enumerate(hashes)]
    want = dict(simulate_cuckoo(
        keys, list(range(len(hashes))),
        list(range(n_del)), n_slots, width, kicks))
    got = {i: bool(m) for i, m in enumerate(maybe.tolist())}
    assert got == want
    # no false negatives for keys that remain (inserted once, deleted ≤ once)
    for i in range(n_del, len(hashes)):
        assert got[i]
