"""In-engine trainable unigram-LM subword tokenizer (Kudo 2018 family) —
the Viterbi sibling of the BPE trainer in ``tokenize.py``, completing the
"BPE or unigram" pair: seed a piece inventory from substring statistics,
re-estimate piece scores by hard-EM (Viterbi-segment the vocabulary, count
piece usage, re-score), and encode documents as the min-cost segmentation
under the learned piece costs.

Algorithm (the published unigram-LM recipe, hard-EM variant):

1. one corpus pass builds the distinct-word frequency table (the same
   training-state trick as BPE: every later step costs a vocabulary-sized
   job, never a corpus-sized one);
2. seed pieces = all substrings up to ``max_piece_len`` ranked by
   freq-weighted occurrence count (tie-break count desc, piece asc);
   every single character is always kept (coverage);
3. per hard-EM round: piece cost = -ln(count/total), each distinct word is
   Viterbi-segmented under the current costs, piece usage (weighted by
   word freq) becomes the next round's count (+1 smoothing); multi-char
   pieces with zero usage are pruned;
4. encode = the same Viterbi applied to a corpus' distinct words, then a
   broadcast join back to documents.

Cross-engine determinism (the value-oracle contract): Viterbi compares
INTEGER costs only. A piece's cost is the micro-nll
``round(-ln(cnt/total) * 1e6)`` (both engines round half-up on positives),
and the per-piece DP contribution is ``micro * 64 + 1`` — minimizing the
total therefore minimizes (sum of nll, then piece count) lexicographically,
so ``n_pieces = total % 64`` and ``nll_micro = total div 64`` are unique
min-values, independent of which equal-cost path a backtrace would pick.
The backtrace itself (needed for usage counts in training) breaks ties by
LONGEST piece at each boundary, scanned max_piece_len..1 — the same rule
the DuckDB oracle's recursive-CTE replay applies. Unknown single
characters cost ``UNK_MICRO`` (finite, dwarfing any real piece), so any
word segments.

Scale shape (100 TB story): the corpus is touched once (word-frequency
aggregation, map-side combined); the DP is pure JVM expressions — ONE
``F.aggregate`` fold over character positions per DISTINCT word with the
piece costs attached as a broadcast one-row map column (no per-row Python,
no join in the DP); training rounds are vocabulary-sized aggregations
localCheckpoint-flattened like the BPE loop. Encoding joins the per-word
results back to documents by word — broadcast when the dictionary is small,
plain equi-join otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from wss_spark.operators.tokenize import _pretokens

#: micro-nll charged per unknown single character: -ln(p) = 25 → p ≈ 1.4e-11
UNK_MICRO = 25_000_000
#: lexicographic packing base for (nll, piece-count): > max pieces per word
COUNT_BASE = 64


def word_table(docs: DataFrame, text_col: str = "text",
               max_word_len: int = 16) -> DataFrame:
    """(word, freq): the distinct-word training state (one corpus pass,
    map-side combined). Words are BPE-identical pretokens (dedup-canonical
    text, whitespace split, long runs chunked at ``max_word_len`` — which
    also bounds the DP length and the oracle's recursion depth)."""
    words = docs.select(
        F.explode(_pretokens(F.col(text_col), max_word_len)).alias("word")
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def seed_pieces(words: DataFrame, vocab_size: int = 200,
                max_piece_len: int = 4) -> DataFrame:
    """(piece, cnt): the seed inventory — every single character, plus the
    ``vocab_size`` highest-scoring multi-char substrings (freq-weighted
    occurrence count; tie-break count desc then piece asc — a pure function
    of data). The rank window runs over the candidate-piece table (a
    bounded dictionary, not the corpus)."""
    w = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda s: F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.lit(max_piece_len)),
                    lambda l: F.when(
                        s + l - 1 <= F.length(w), w.substr(s, l)
                    ),
                ),
                lambda x: x.isNotNull(),
            ),
        )
    )
    cand = (
        words.select("freq", F.explode(subs).alias("piece"))
        .groupBy("piece").agg(F.sum("freq").alias("cnt"))
    )
    chars = cand.filter(F.length("piece") == 1)
    multi = (
        cand.filter(F.length("piece") > 1)
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("piece").asc())
            ),
        )
        .filter(F.col("_rk") <= vocab_size)
        .drop("_rk")
    )
    return chars.unionByName(multi)


def piece_costs(pieces: DataFrame) -> DataFrame:
    """(piece, cc): packed DP cost per piece —
    ``round(-ln(cnt/total) * 1e6) * COUNT_BASE + 1``. Integer end to end
    after the one rounded log, so every DP comparison is exact."""
    total = pieces.agg(F.sum("cnt").alias("_tot"))
    micro = F.round(
        -F.log(F.col("cnt").cast("double") / F.col("_tot").cast("double"))
        * F.lit(1e6)
    ).cast("long")
    return (
        pieces.crossJoin(F.broadcast(total))
        .select("piece", (micro * COUNT_BASE + 1).alias("cc"))
    )


def _with_cost_map(df: DataFrame, costs: DataFrame) -> DataFrame:
    """Attach the piece→cc map as a broadcast one-row map column ``_pm``."""
    m = costs.agg(
        F.map_from_entries(
            F.collect_list(F.struct("piece", "cc"))
        ).alias("_pm")
    )
    return df.crossJoin(F.broadcast(m))


_UNK_CC = UNK_MICRO * COUNT_BASE + 1


def _dp_costs(word: Column, pm: Column, max_piece_len: int) -> Column:
    """Viterbi forward pass: array of packed min-costs, index p+1 = cost of
    the best segmentation of the first p characters (index 1 = 0). One
    JVM fold over positions; candidates at each position are the ≤
    ``max_piece_len`` suffix pieces (missing multi-char pieces are NULL and
    ``least`` skips them; a missing single char costs ``_UNK_CC``)."""
    def step(acc: Column, p: Column) -> Column:
        cands = []
        for l in range(1, max_piece_len + 1):
            cc = F.element_at(pm, word.substr(p - l + 1, F.lit(l)))
            if l == 1:
                cands.append(
                    F.element_at(acc, p) + F.coalesce(cc, F.lit(_UNK_CC))
                )
            else:
                cands.append(
                    F.when(p >= l, F.element_at(acc, p - l + 1) + cc)
                )
        return F.concat(acc, F.array(F.least(*cands)))

    return F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.array(F.lit(0).cast("long")),
        step,
    )


def _backtrace(word: Column, costs: Column, pm: Column,
               max_piece_len: int) -> Column:
    """Recover the chosen pieces from the forward costs: walk positions
    right-to-left, at each boundary taking the LONGEST piece whose cost
    closes the DP equality (scan max_piece_len..1) — the deterministic
    tie-break the oracle mirrors. Returns the piece array in word order."""
    init = F.struct(
        F.length(word).alias("pos"),
        F.array().cast("array<string>").alias("toks"),
    )

    def step(st: Column, _i: Column) -> Column:
        pos = st["pos"]
        lexpr = F.lit(1)
        for l in range(2, max_piece_len + 1):
            cc = F.element_at(pm, word.substr(pos - l + 1, F.lit(l)))
            cond = (pos >= l) & (
                F.element_at(costs, pos - l + 1) + cc
                == F.element_at(costs, pos + 1)
            )
            lexpr = F.when(cond, F.lit(l)).otherwise(lexpr)
        piece = word.substr(pos - lexpr + 1, lexpr)
        return F.when(pos <= 0, st).otherwise(
            F.struct(
                (pos - lexpr).alias("pos"),
                F.concat(F.array(piece), st["toks"]).alias("toks"),
            )
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.length(word)), init, step
    )["toks"]


def segment_words(words: DataFrame, costs: DataFrame,
                  max_piece_len: int = 4) -> DataFrame:
    """(word, freq, toks, total_cc): Viterbi segmentation of every distinct
    word under ``costs``. ``total_cc`` unpacks as
    ``n_pieces = total_cc % COUNT_BASE``,
    ``nll_micro = total_cc div COUNT_BASE``."""
    w = F.col("word")
    pm = F.col("_pm")
    staged = _with_cost_map(words, costs).select(
        "word", "freq", pm.alias("_pm"),
        _dp_costs(w, pm, max_piece_len).alias("_dp"),
    )
    return staged.select(
        "word", "freq",
        _backtrace(w, F.col("_dp"), F.col("_pm"), max_piece_len).alias("toks"),
        F.element_at(F.col("_dp"), F.length(w) + 1).alias("total_cc"),
    )


def train_unigram(docs: DataFrame, vocab_size: int = 200, rounds: int = 2,
                  max_piece_len: int = 4, text_col: str = "text",
                  max_word_len: int = 16) -> DataFrame:
    """Learn the piece inventory: seed from substring statistics, then
    ``rounds`` hard-EM re-estimations (Viterbi usage counts + add-one
    smoothing; zero-usage multi-char pieces pruned). Returns the final
    (piece, cnt) table — feed to :func:`piece_costs` /
    :func:`unigram_token_counts`."""
    words = word_table(docs, text_col, max_word_len).localCheckpoint()
    pieces = seed_pieces(words, vocab_size, max_piece_len)
    for _r in range(rounds):
        seg = segment_words(words, piece_costs(pieces), max_piece_len)
        usage = (
            seg.select("freq", F.explode("toks").alias("piece"))
            .groupBy("piece").agg(F.sum("freq").alias("_use"))
        )
        pieces = (
            pieces.select("piece", F.length("piece").alias("_len"))
            .join(usage, "piece", "left")
            .filter((F.col("_len") == 1) | F.col("_use").isNotNull())
            .select("piece",
                    (F.coalesce(F.col("_use"), F.lit(0)) + 1).alias("cnt"))
            .localCheckpoint()  # flatten the per-round plan (BPE precedent)
        )
    return pieces


def unigram_token_counts(docs: DataFrame, pieces: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         max_piece_len: int = 4, max_word_len: int = 16,
                         broadcast_words: bool = True) -> DataFrame:
    """(doc_id, n_pieces, nll_micro): per-document token count and total
    micro-nll under the learned pieces — the unigram analog of
    tokenize.bpe_token_counts. The DP runs once per DISTINCT word of the
    encode corpus; documents join the per-word results by word (broadcast
    by default — the dictionary is bounded; pass False at dictionary
    scales where AQE should pick)."""
    doc_words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_pretokens(F.col(text_col), max_word_len)).alias("word"),
    )
    uniq = doc_words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    seg = segment_words(uniq, piece_costs(pieces), max_piece_len).select(
        "word",
        (F.col("total_cc") % COUNT_BASE).alias("_np"),
        (F.col("total_cc") / COUNT_BASE).cast("long").alias("_nll"),
    )
    if broadcast_words:
        seg = F.broadcast(seg)
    return (
        doc_words.join(seg, "word")
        .groupBy("doc_id")
        .agg(F.sum("_np").alias("n_pieces"),
             F.sum("_nll").alias("nll_micro"))
    )
