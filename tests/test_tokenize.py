"""Trainable BPE tokenizer + CJK-aware token accounting (VERDICT r04 #1).

The training assertions compare tokenize.train_bpe against an INDEPENDENT
in-test replica of the published algorithm (Sennrich, Haddow & Birch 2016):
symbol tuples + dict counting, no shared code with the engine's
string-state/literal-replace representation — so a representation bug on
either side shows up as a mismatch, not a self-confirming pass.
"""
from collections import Counter
import re

import pytest
from pyspark.sql import functions as F

from wss_spark import catalog
from wss_spark.operators import corpus, textstats, tokenize

SENT = tokenize.SENT


# --------------------------------------------------------------------------
# independent replica (tuples + Counters — the reference recipe verbatim)
# --------------------------------------------------------------------------

def _replica_pretokens(t: str, max_word_len: int) -> list[str]:
    t = re.sub(r"[ \t\n\x0B\f\r]+", " ", t.lower()).strip(" ")
    t = re.sub(r"[\x01\x02]", "", t)
    t = re.sub(r"([^ ]{%d})" % max_word_len, r"\1 ", t)
    return [w for w in t.split(" ") if w]


def _replica_bpe(docs, n_merges, min_freq, max_word_len):
    wf = Counter()
    for _, t in docs:
        wf.update(_replica_pretokens(t, max_word_len))
    state = {tuple(list(w[:-1]) + [w[-1] + "</w>"]): f for w, f in wf.items()}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for syms, f in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0] + SENT + kv[0][1])
        )
        if c < min_freq:
            break
        merges.append((rank, a, b, c))
        new = {}
        for syms, f in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + f
        state = new
    return merges, state


def _replica_encode(text, merges, max_word_len):
    toks = []
    for w in _replica_pretokens(text, max_word_len):
        syms = list(w[:-1]) + [w[-1] + "</w>"]
        for _, a, b, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


# --------------------------------------------------------------------------
# training parity
# --------------------------------------------------------------------------

def test_train_bpe_matches_independent_replica(spark):
    docs = catalog._bpe_fixture_df(spark)
    got = tokenize.train_bpe(
        docs, n_merges=catalog._BPE_MERGES,
        min_pair_freq=catalog._BPE_MIN_FREQ,
        max_word_len=catalog._BPE_WLEN,
    )
    want, _ = _replica_bpe(
        catalog._BPE_DOCS, catalog._BPE_MERGES,
        catalog._BPE_MIN_FREQ, catalog._BPE_WLEN,
    )
    assert got == want
    # the fixture must keep every round firing: the catalog oracle's m{i}
    # CTEs would go empty (and the gate diverge) if a round dried up
    assert len(got) == catalog._BPE_MERGES
    # ...and it must actually learn Chinese merges (the CJK evidence)
    assert any(re.search(r"[一-鿿]", a + b) for _, a, b, _ in got)


def test_train_bpe_partition_invariant(spark):
    rows = catalog._BPE_DOCS
    one = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    many = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    kw = dict(n_merges=6, min_pair_freq=2, max_word_len=32)
    assert tokenize.train_bpe(one, **kw) == tokenize.train_bpe(many, **kw)


def test_train_bpe_early_stop_on_singleton_pairs(spark):
    # every pair unique → nothing reaches min_pair_freq=2 → empty merge list
    docs = spark.createDataFrame([(1, "abc"), (2, "xyz")],
                                 "doc_id long, text string")
    assert tokenize.train_bpe(docs, n_merges=4, min_pair_freq=2) == []


def test_train_bpe_rejects_nonpositive_rounds(spark):
    docs = spark.createDataFrame([(1, "aa aa")], "doc_id long, text string")
    with pytest.raises(ValueError):
        tokenize.train_bpe(docs, n_merges=0)


def test_consecutive_identical_pair_merges_left_to_right(spark):
    # 'aaaaa' renders as a a a a a</w>: merging (a,a) left-to-right and
    # non-overlapping must give aa aa a</w> — NOT aa a aa (overlap) and
    # NOT a aa aa (right-to-left). The sentinel representation guarantees
    # the scan rematches at the character after a replacement (see
    # tokenize module docstring); the naive ' a b ' needle misses the
    # second aa because the two occurrences share a delimiter space.
    docs = spark.createDataFrame([(1, "aaaaa aaaaa")], "doc_id long, text string")
    merges = tokenize.train_bpe(docs, n_merges=1, min_pair_freq=2)
    assert [(m[1], m[2]) for m in merges] == [("a", "a")]
    toks = tokenize.bpe_word_tokens(spark, merges, ["aaaaa", "aaaa"])
    assert toks["aaaaa"] == ["aa", "aa", "a</w>"]
    assert toks["aaaa"] == ["aa", "a", "a</w>"]


# --------------------------------------------------------------------------
# encoding parity
# --------------------------------------------------------------------------

def test_bpe_token_counts_match_replica_and_handle_empty_docs(spark):
    fixture = catalog._BPE_DOCS
    merges = tokenize.train_bpe(
        catalog._bpe_fixture_df(spark), n_merges=8, min_pair_freq=2,
        max_word_len=32,
    )
    extra = [(1, ""), (2, "   \t\n "), (3, None), (4, "the newest dog 香港")]
    docs = spark.createDataFrame(list(fixture) + extra,
                                 "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in tokenize.bpe_token_counts(docs, merges).collect()
    }
    for d, t in fixture + extra:
        want = 0 if t is None else len(_replica_encode(t, merges, 32))
        assert got[d] == want, (d, t)
    assert got[1] == 0 and got[2] == 0 and got[3] == 0


def test_bpe_word_tokens_roundtrip_concat(spark):
    merges = tokenize.train_bpe(
        catalog._bpe_fixture_df(spark), n_merges=catalog._BPE_MERGES,
        min_pair_freq=2, max_word_len=32,
    )
    toks = tokenize.bpe_word_tokens(
        spark, merges, ["lowest", "香港特别行政区欢迎你", "newest"]
    )
    for w, ts in toks.items():
        assert "".join(ts) == w + "</w>"
        assert all(t for t in ts)


def test_max_word_len_chunks_unbroken_cjk_run(spark):
    run = "字" * 100  # whitespace-free: one 100-char "word" pre-chunking
    docs = spark.createDataFrame([(1, run)], "doc_id long, text string")
    wf = tokenize.word_freq_table(docs, max_word_len=32).collect()
    got = sorted(
        (sum(1 for tok in r["state"].split(" ") if tok), r["freq"])
        for r in wf
    )
    # 100 = 32+32+32+4: three identical 32-char chunks collapse to ONE
    # distinct word with freq 3 — the Zipf concentration the training
    # state's scale story rests on — plus the 4-char remainder
    assert got == [(4, 1), (32, 3)]


# --------------------------------------------------------------------------
# canonical CJK-aware token unit (textstats.token_count)
# --------------------------------------------------------------------------

def test_token_count_units(spark):
    rows = [
        (1, "the quick brown fox"),          # latin: mixed == ws == 4
        (2, "香港特别行政区"),                  # unspaced CJK: ws=1, mixed=7
        (3, "weibo 超级话题 stream"),          # mixed script
        (4, "  \t "),                         # whitespace-only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["ws"], r["mixed"], r["ch"])
        for r in df.select(
            "doc_id",
            textstats.token_count(F.col("text"), "ws").alias("ws"),
            textstats.token_count(F.col("text"), "mixed").alias("mixed"),
            textstats.token_count(F.col("text"), "char").alias("ch"),
        ).collect()
    }
    assert got[1] == (4, 4, 16)
    assert got[2] == (1, 7, 7)
    assert got[3] == (3, 6, 15)  # 'weibo' + 4 CJK chars + 'stream'
    assert got[4] == (0, 0, 0)
    with pytest.raises(ValueError):
        textstats.token_count(F.col("text"), "bpe")


def test_token_counts_cjk_column_nondegenerate(spark):
    df = catalog._bpe_fixture_df(spark)
    rows = textstats.token_counts(df).collect()
    by_id = {r["doc_id"]: r for r in rows}
    r = by_id[9000002]  # 微博超级话题的热门评论和转发 — 14 unspaced chars
    assert r["ws_tokens"] == 1
    assert r["cjk_tokens"] == 14
    lat = by_id[9000004]  # pure latin: mixed == ws
    assert lat["cjk_tokens"] == lat["ws_tokens"]


# --------------------------------------------------------------------------
# the unit wired through the corpus operators (pack / budget / manifest)
# --------------------------------------------------------------------------

def test_pack_sequences_cjk_nondegenerate(spark):
    # 20 docs of 50 unspaced CJK chars: whitespace packing sees 1 token
    # per doc (everything lands in bin 0 of its group); the mixed unit
    # packs by real length and must cut multiple bins
    rows = [(i, "很" * 25 + "好" * 25) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ws = corpus.pack_sequences(df, max_tokens=64, n_groups=2, unit="ws")
    mixed = corpus.pack_sequences(df, max_tokens=64, n_groups=2, unit="mixed")
    assert {r["n_tokens"] for r in ws.collect()} == {1}
    got = mixed.collect()
    assert {r["n_tokens"] for r in got} == {50}
    assert max(r["bin"] for r in got) >= 1  # the budget actually bites
    assert max(r["bin"] for r in ws.collect()) == 0


def test_token_budget_cjk_nondegenerate(spark):
    # equal quality → admission is doc_id-prefix order; with ws counting
    # every doc is 1 token and the 100-token budget keeps all 30 docs —
    # with the mixed unit each doc is 40 tokens and only 2 fit
    rows = [(i, 1.0, "数" * 40) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, quality double, text string")
    ann = df.select(
        "doc_id", "quality",
        textstats.token_count(F.col("text"), "mixed").alias("n_tokens"),
        textstats.token_count(F.col("text"), "ws").alias("ws_tokens"),
    )
    mixed = corpus.select_by_token_budget(ann, 100, tokens_col="n_tokens")
    ws = corpus.select_by_token_budget(ann, 100, tokens_col="ws_tokens")
    assert sorted(r["doc_id"] for r in mixed.collect()) == [0, 1]
    assert ws.count() == 30


def test_release_manifest_counts_cjk_tokens(spark, tmp_path):
    rows = [(1, "香港特别行政区"), (2, "plain latin text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    _, manifest = corpus.release_shards(df, n_shards=1)
    m = manifest.collect()[0]
    assert m["n_tokens"] == 7 + 4
    # unit stays an explicit knob for latin-only deployments
    _, ws_manifest = corpus.release_shards(df, n_shards=1, unit="ws")
    assert ws_manifest.collect()[0]["n_tokens"] == 1 + 4


def test_gopher_words_cjk_nondegenerate(spark):
    # an unspaced 80-char Chinese doc: the old whitespace split made it ONE
    # 80-char "word" (failing max-mean-word-length for the wrong reason);
    # mixed words see 80 1-char words
    text = "микро" if False else "数据" * 40
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = textstats.word_repetition(df).collect()[0]
    assert r["n_words"] == 80


# ---------------------------------------------------------------------------
# unigram-LM tokenizer (operators/unigram.py)
# ---------------------------------------------------------------------------


def _ug_fixture(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps again and again"),
            (3, "香港特别行政区欢迎你 香港的天气很好"),
            (4, "lower lowest newer newest lower lowest"),
        ],
        "doc_id long, text string",
    )


def test_unigram_viterbi_matches_python_replica(spark):
    """The engine's JVM-fold Viterbi (packed integer costs, longest-piece
    backtrace) must agree with a direct pure-Python DP over the same piece
    costs — segmentation, piece count, and total cost per word."""
    from wss_spark.operators import unigram as ug

    docs = _ug_fixture(spark)
    words = ug.word_table(docs)
    pieces = ug.seed_pieces(words, vocab_size=40)
    costs = {r["piece"]: r["cc"] for r in ug.piece_costs(pieces).collect()}
    got = {
        r["word"]: (list(r["toks"]), r["total_cc"])
        for r in ug.segment_words(words, ug.piece_costs(pieces)).collect()
    }

    def replica(word, K=4):
        L = len(word)
        INF = float("inf")
        dp = [0] + [INF] * L
        for p in range(1, L + 1):
            best = INF
            for l in range(1, min(K, p) + 1):
                sub = word[p - l:p]
                cc = costs.get(sub)
                if cc is None:
                    if l != 1:
                        continue
                    cc = ug.UNK_MICRO * ug.COUNT_BASE + 1
                cand = dp[p - l] + cc
                if cand < best:
                    best = cand
            dp[p] = best
        toks, pos = [], L
        while pos > 0:
            chosen = 1
            for l in range(K, 1, -1):
                sub = word[pos - l:pos]
                cc = costs.get(sub)
                if pos >= l and cc is not None and dp[pos - l] + cc == dp[pos]:
                    chosen = l
                    break
            toks.insert(0, word[pos - chosen:pos])
            pos -= chosen
        return toks, dp[L]

    assert len(got) > 10
    for word, (toks, total) in got.items():
        rtoks, rtotal = replica(word)
        assert (toks, total) == (rtoks, rtotal), word


def test_unigram_train_and_encode_properties(spark):
    """Training keeps every single char, prunes unused multi-char pieces,
    and is partition-invariant; encode counts are bounded by char counts
    and unknown characters still segment (finite unk cost)."""
    from wss_spark.operators import unigram as ug

    docs = _ug_fixture(spark)
    pieces = ug.train_unigram(docs, vocab_size=50, rounds=2)
    rows = pieces.collect()
    chars = {r["piece"] for r in rows if len(r["piece"]) == 1}
    corpus_chars = set("".join(
        t for _id, t in docs.collect() if t).replace(" ", ""))
    assert corpus_chars <= chars  # coverage: all single chars kept
    assert all(r["cnt"] >= 1 for r in rows)  # add-one smoothing

    a = sorted(map(tuple, ug.train_unigram(
        docs.repartition(1), vocab_size=50, rounds=2).collect()))
    b = sorted(map(tuple, ug.train_unigram(
        docs.repartition(7), vocab_size=50, rounds=2).collect()))
    assert a == b

    out = {r["doc_id"]: r for r in
           ug.unigram_token_counts(docs, pieces).collect()}
    for _id, text in docs.collect():
        n_chars = len(text.replace(" ", ""))
        assert 1 <= out[_id]["n_pieces"] <= n_chars
        assert out[_id]["nll_micro"] > 0

    # unknown chars (never in training) cost UNK but still segment
    probe = spark.createDataFrame([(9, "zzqqxx 你好")],
                                  "doc_id long, text string")
    got = ug.unigram_token_counts(probe, pieces).collect()[0]
    assert got["n_pieces"] >= 2
    assert got["nll_micro"] >= ug.UNK_MICRO  # at least one unk charged


def test_unigram_multichar_pieces_win_over_chars(spark):
    """A frequent word must encode as few pieces, not char-by-char — the
    point of the learned inventory (e.g. 'the' → 1 piece here)."""
    from wss_spark.operators import unigram as ug

    docs = _ug_fixture(spark)
    pieces = ug.train_unigram(docs, vocab_size=50, rounds=2)
    seg = {r["word"]: list(r["toks"]) for r in ug.segment_words(
        ug.word_table(docs), ug.piece_costs(pieces)).collect()}
    assert seg["the"] == ["the"]
    assert len(seg["quick"]) <= 3
