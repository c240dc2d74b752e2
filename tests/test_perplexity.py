"""CCNet-style bigram-LM perplexity (corpus.train_bigram_lm /
score_perplexity / perplexity_filter).

The gate `llm_perplexity` value-oracles train+score end-to-end against a
DuckDB CTE replay; these tests pin the semantics the oracle can't see:
an independent imperative replica on a tiny corpus (OOV → <unk>, empty
and null text score finitely), partition invariance, and the filter's
schema-preserving keep set.
"""

import math
from collections import Counter

import pytest

from wss_spark.operators import corpus


TRAIN = ["the cat sat", "the cat ran", "a dog sat"]


def _replica():
    toks = [d.split() for d in TRAIN]
    uni = Counter(w for t in toks for w in t)
    vocab = {w for w, c in uni.items() if c >= 2}
    v = len(vocab) + 2

    def mapped(words):
        return ["<s>"] + [w if w in vocab else "<unk>" for w in words] + ["</s>"]

    bic = Counter()
    for t in toks:
        m = mapped(t)
        for a, b in zip(m, m[1:]):
            bic[(a, b)] += 1
    ctx = Counter()
    for (a, _), c in bic.items():
        ctx[a] += c

    def ppl(text):
        m = mapped(text.split() if text else [])
        lps = [
            math.log((bic.get((a, b), 0) + 1.0) / (ctx.get(a, 0) + v))
            for a, b in zip(m, m[1:])
        ]
        return math.exp(-sum(lps) / len(lps))

    return v, ppl


@pytest.fixture(scope="module")
def lm(spark):
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], "doc_id long, text string"
    )
    lm = corpus.train_bigram_lm(train, min_count=2, alpha=1.0)
    yield lm
    lm.unpersist()


def test_matches_imperative_replica(spark, lm):
    v, ppl = _replica()
    assert lm.v == v
    score = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zebra zebra"), (12, ""), (13, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["ppl"] for r in corpus.score_perplexity(score, lm).collect()}
    want = {10: ppl("the cat sat"), 11: ppl("zebra zebra"), 12: ppl(""), 13: ppl("")}
    assert set(got) == set(want)  # null/empty text still scores
    for k, w in want.items():
        assert got[k] == pytest.approx(w, abs=1e-12)
    # in-vocab fluent text beats all-OOV text beats empty text
    assert got[10] < got[11] < got[12]


def test_partition_invariance(spark, lm):
    score = spark.createDataFrame(
        [(i, f"the cat sat {'x' * (i % 3)}") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted((r["doc_id"], round(r["ppl"], 12))
               for r in corpus.score_perplexity(score, lm).collect())
    b = sorted((r["doc_id"], round(r["ppl"], 12))
               for r in corpus.score_perplexity(score.repartition(11), lm).collect())
    assert a == b


def test_filter_keeps_fluent_schema_preserving(spark, lm):
    _, ppl = _replica()
    score = spark.createDataFrame(
        [(10, "the cat sat"), (11, "zebra zebra zebra")],
        "doc_id long, text string",
    )
    cut = (ppl("the cat sat") + ppl("zebra zebra zebra")) / 2
    kept = corpus.perplexity_filter(score, lm, max_ppl=cut)
    assert kept.columns == score.columns
    assert [r["doc_id"] for r in kept.collect()] == [10]


def test_char_unit_matches_replica_on_cjk(spark):
    train_texts = ["猫坐下", "猫跑了", "狗坐下"]
    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    lm = corpus.train_bigram_lm(train, min_count=2, alpha=1.0, unit="char")
    assert lm.unit == "char"

    uni = Counter(ch for t in train_texts for ch in t)
    vocab = {ch for ch, c in uni.items() if c >= 2}
    v = len(vocab) + 2
    assert lm.v == v

    def mapped(text):
        return ["<s>"] + [c if c in vocab else "<unk>" for c in text] + ["</s>"]

    bic = Counter()
    for t in train_texts:
        m = mapped(t)
        for a, b in zip(m, m[1:]):
            bic[(a, b)] += 1
    ctx = Counter()
    for (a, _), c in bic.items():
        ctx[a] += c

    def ppl(text):
        m = mapped(text)
        lps = [
            math.log((bic.get((a, b), 0) + 1.0) / (ctx.get(a, 0) + v))
            for a, b in zip(m, m[1:])
        ]
        return math.exp(-sum(lps) / len(lps))

    score = spark.createDataFrame(
        [(10, "猫坐下"), (11, "马马"), (12, "猫 坐")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["ppl"] for r in corpus.score_perplexity(score, lm).collect()}
    # doc 12: the space is not a token — same chars as "猫坐" contiguous
    want = {10: ppl("猫坐下"), 11: ppl("马马"), 12: ppl("猫坐")}
    for k, w in want.items():
        assert got[k] == pytest.approx(w, abs=1e-12)
    assert got[10] < got[11]  # fluent beats OOV
    lm.unpersist()


def test_literal_sentinel_tokens_map_to_unk(spark, lm):
    # adversarial text containing literal '<s>'/'</s>' must score exactly
    # like the same text with those tokens replaced by any OOV word — the
    # literals map to <unk> and never masquerade as sentence boundaries
    _, ppl = _replica()
    score = spark.createDataFrame(
        [(20, "the <s> cat </s> sat"), (21, "the zzz cat qqq sat")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["ppl"]
           for r in corpus.score_perplexity(score, lm).collect()}
    assert got[20] == pytest.approx(got[21], abs=1e-12)
    assert got[20] == pytest.approx(ppl("the zzz cat qqq sat"), abs=1e-12)


def test_literal_sentinels_in_training_text(spark):
    # a training doc carrying literal sentinels trains the same LM as one
    # carrying an OOV word in the same positions (both collapse to <unk>)
    a = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the cat sat"), (2, "<s> the </s>")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the cat sat"), (2, "xxx the yyy")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(9, "the cat sat")], "doc_id long, text string"
    )
    lma = corpus.train_bigram_lm(a, min_count=2, alpha=1.0)
    lmb = corpus.train_bigram_lm(b, min_count=2, alpha=1.0)
    try:
        pa = corpus.score_perplexity(score, lma).collect()[0]["ppl"]
        pb = corpus.score_perplexity(score, lmb).collect()[0]["ppl"]
        assert pa == pytest.approx(pb, abs=1e-12)
    finally:
        lma.unpersist()
        lmb.unpersist()
