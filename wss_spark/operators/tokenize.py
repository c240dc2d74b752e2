"""In-engine trainable subword tokenizer: byte-pair-encoding merges learned
DataFrame-natively (VERDICT r04 next #1 — the ``ivf_train_centroids`` /
``train_logreg`` in-engine-training precedent applied to tokenization), plus
the encode path that turns documents into subword token counts.

Algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of
Rare Words with Subword Units" — the published BPE recipe):

1. pre-tokenize the corpus into words and count word frequencies — the
   DISTINCT-WORD table is the training state, so every merge round costs
   one aggregation over the vocabulary, never over the corpus;
2. represent each word as its character sequence, the last character
   carrying the ``</w>`` end-of-word marker (the original's
   ``word[:-1] + (word[-1]+'</w>',)``);
3. per round: count adjacent symbol pairs weighted by word frequency, pick
   the most frequent (deterministic tie-break: count desc, then pair text
   asc — a pure function of data, so training is partition- and
   run-invariant), merge that pair everywhere, repeat.

Pre-tokenization is CJK-correct by construction: words come from a
whitespace split of dedup-canonical text, so a Chinese sentence (no
whitespace) stays ONE multi-char word and BPE learns character merges from
it — exactly what the reference's domain needs (`GUI/topic/香港.csv`
fixtures are whitespace-free Chinese); runs longer than ``max_word_len``
are deterministically chunked so a pathological unbroken run cannot blow
up the per-word state.

Cross-engine replayability (the value-oracle contract): the per-word symbol
state is ONE STRING — every symbol rendered as ``\\x01<sym>`` followed by a
space — and a merge of pair (a, b) is a literal ``replace`` of
``"\\x01a \\x01b "`` with ``"\\x01ab "``. Because each token carries its own
leading sentinel and trailing space, SQL ``replace``'s left-to-right
non-overlapping scan is EXACTLY the reference implementation's merge
semantics (re.sub with zero-width boundary lookarounds), including the
consecutive-identical-pair case ``a a a a → aa aa`` — the naive
space-delimited needle ``" a b "`` gets that wrong because the shared
delimiter breaks rematch adjacency. The DuckDB oracle
(catalog._bpe_train_sql) replays every round as unrolled CTEs.

Scale shape (100 TB story): the corpus is touched ONCE (the word-frequency
aggregation — map-side combined, shuffle carries distinct words); every
merge round then runs on the distinct-word table (a vocabulary, bounded and
~Zipf-concentrated — millions of rows, not corpus-sized), as one pair-count
aggregation + one literal-replace projection, localCheckpoint-flattened per
round like ``dedup.dup_clusters``. The argmax row collected per round is
control-plane (1 row). Encoding is a zero-join projection: explode words,
apply the merge list as a chain of literal replaces, aggregate counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wss_spark.operators.dedup import normalize_text
from wss_spark.operators.textstats import ASCII_WS

#: symbol sentinel — prefixes every symbol in the word-state string. Input
#: control bytes \x01/\x02 are stripped in pre-tokenization so document
#: text can never forge a symbol boundary.
SENT = "\x01"
EOW = "</w>"


def _pretokens(t: Column, max_word_len: int) -> Column:
    """Whitespace words of dedup-canonical text, long runs chunked: the BPE
    pre-tokenizer. Chunking inserts a space after every ``max_word_len``
    consecutive non-space chars — one regex, same spelling on both engines
    — so a whitespace-free CJK run becomes bounded multi-char words instead
    of one unbounded state string."""
    norm = F.regexp_replace(normalize_text(t), "[\x01\x02]", "")
    chunked = F.regexp_replace(norm, "([^ ]{%d})" % max_word_len, "$1 ")
    return F.filter(F.split(chunked, " "), lambda x: x != "")


def render_word(word: Column) -> Column:
    """Word → initial BPE state string: every char becomes ``\\x01c `` and
    the last char carries the ``</w>`` marker (``cat`` →
    ``"\\x01c \\x01a \\x01t</w> "``). Two regexes, both RE2/Java-portable."""
    chars = F.regexp_replace(word, "(.)", SENT + "$1 ")
    return F.regexp_replace(chars, "([^ ]+) $", "$1" + EOW + " ")


def _symbols(state: Column) -> Column:
    """State string → symbol array (strips the per-symbol sentinel)."""
    return F.transform(
        F.filter(F.split(state, " "), lambda x: x != ""),
        lambda x: x.substr(F.lit(2), F.length(x)),
    )


def word_freq_table(docs: DataFrame, text_col: str = "text",
                    max_word_len: int = 64) -> DataFrame:
    """(state, freq): the distinct-word training state — the ONE corpus
    pass of BPE training (map-side combined count per word)."""
    words = docs.select(
        F.explode(_pretokens(F.col(text_col), max_word_len)).alias("word")
    )
    return (
        words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
        .select(render_word(F.col("word")).alias("state"), "freq")
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(pair, c): adjacent-symbol pair counts weighted by word frequency —
    within-word multiplicity counts (the reference get_stats semantics).
    Pair key = ``left + \\x01 + right`` (the sentinel cannot appear inside
    a symbol, so the key is unambiguous). Two-projection staging: the
    symbol array is materialized before the zip_with references it (no CSE
    across lambda boundaries — PLANS.md)."""
    staged = words.select("freq", _symbols(F.col("state")).alias("_s"))
    s = F.col("_s")
    nm1 = F.greatest(F.size(s) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(s, 1, nm1), F.slice(s, 2, nm1),
        lambda a, b: F.concat(a, F.lit(SENT), b),
    )
    return (
        staged.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair").agg(F.sum("freq").alias("c"))
    )


def merge_needle(left: str, right: str) -> tuple[str, str]:
    """(needle, replacement) literal strings for merging pair (left, right)
    in a state string — shared by training, encoding, and the tests'
    independent replica assertions."""
    return (
        f"{SENT}{left} {SENT}{right} ",
        f"{SENT}{left}{right} ",
    )


def train_bpe(docs: DataFrame, n_merges: int = 32, text_col: str = "text",
              min_pair_freq: int = 2,
              max_word_len: int = 64) -> list[tuple[int, str, str, int]]:
    """Learn a BPE merge list in-engine: ``[(rank, left, right, pair_count)]``
    ordered by rank. Deterministic and partition-invariant: counts are exact
    integer sums and the per-round argmax tie-break is (count desc, pair
    asc). Stops early when no remaining pair reaches ``min_pair_freq``
    (merging a singleton pair generalizes to nothing).

    This function is EAGER (the merge list is plain Python, like
    ``train_logreg``'s weights): the word table is persisted internally and
    unpersisted before returning; each round's merged state is
    localCheckpoint-flattened so the plan stays O(1) across rounds."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be > 0, got {n_merges}")
    words = word_freq_table(docs, text_col, max_word_len)
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(n_merges):
            top = (
                _pair_counts(words)
                .orderBy(F.col("c").desc(), F.col("pair").asc())
                .limit(1)
                .collect()
            )
            if not top or top[0]["c"] < min_pair_freq:
                break
            left, _, right = top[0]["pair"].partition(SENT)
            merges.append((rank, left, right, int(top[0]["c"])))
            needle, repl = merge_needle(left, right)
            new = words.select(
                F.replace(F.col("state"), F.lit(needle), F.lit(repl))
                .alias("state"),
                "freq",
            ).localCheckpoint(eager=True)
            words = new
        return merges
    finally:
        words.unpersist()


def apply_merges(state: Column, merges: "list[tuple[int, str, str, int]]"
                 ) -> Column:
    """Chain the learned merges (in rank order) over a state column as
    nested literal replaces — one zero-shuffle projection regardless of
    merge count."""
    for _, left, right, _ in merges:
        needle, repl = merge_needle(left, right)
        state = F.replace(state, F.lit(needle), F.lit(repl))
    return state


def bpe_token_counts(docs: DataFrame,
                     merges: "list[tuple[int, str, str, int]]",
                     id_col: str = "doc_id", text_col: str = "text",
                     max_word_len: int = 64) -> DataFrame:
    """(doc_id, n_bpe_tokens): encode every document with a trained merge
    list and count its subword tokens. Merges apply per word — exactly the
    training granularity, so cross-word merges are structurally impossible.
    One explode + one aggregation (map-side combined), the replaces ride
    the projection; no joins, no Python."""
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_pretokens(F.col(text_col), max_word_len)).alias("word"),
    )
    state = apply_merges(render_word(F.col("word")), merges)
    # token count = number of symbol sentinels left in the merged state
    n = F.length(state) - F.length(F.replace(state, F.lit(SENT), F.lit("")))
    per_word = staged.select("doc_id", n.alias("_n"))
    counted = per_word.groupBy("doc_id").agg(
        F.sum("_n").cast("long").alias("n_bpe_tokens")
    )
    # empty/whitespace-only docs explode to zero words: count them as 0
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(counted, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_bpe_tokens"), F.lit(0).cast("long"))
        .alias("n_bpe_tokens"),
    )


def bpe_word_tokens(spark, merges: "list[tuple[int, str, str, int]]",
                    words: "list[str]") -> "dict[str, list[str]]":
    """Driver-side convenience for tests/inspection: encode a few words
    through the SAME Spark expressions the corpus path uses and return
    their token lists. Not a corpus operator (bounded input)."""
    df = spark.createDataFrame([(w,) for w in words], "word string")
    rows = df.select(
        "word",
        _symbols(apply_merges(render_word(F.col("word")), merges))
        .alias("toks"),
    ).collect()
    return {r["word"]: list(r["toks"]) for r in rows}
