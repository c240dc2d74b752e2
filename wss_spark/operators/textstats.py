"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, fingerprinting. All expressions are portable ANSI-ish string
math (replace-trick occurrence counts, md5 fingerprints) so the DuckDB
oracles replay them exactly. JVM-side only — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language → marker stopwords (padded with spaces; counted by replace-trick)
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " la "],
    "es": [" el ", " y ", " los "],
    "zh": ["的", "了", "是"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]  # deterministic tie-break precedence


def _padded_lower(text: Column) -> Column:
    return F.concat(F.lit(" "), F.lower(text), F.lit(" "))


def occurrence_count(text: Column, needle: str) -> Column:
    """Non-overlapping occurrences of ``needle`` via the replace trick —
    identical semantics in any SQL engine."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def lang_scores(text: Column) -> dict[str, Column]:
    t = _padded_lower(text)
    return {
        lang: sum(
            (occurrence_count(t, m) for m in markers), start=F.lit(0)
        )
        for lang, markers in LANG_MARKERS.items()
    }


def lang_argmax() -> tuple[Column, Column]:
    """(pred, best) argmax expressions over the staged ``_s_<lang>`` score
    columns — earlier LANG_ORDER languages win ties (strict > against the
    running best); 'und' when no marker hits. Callers must first project
    the :func:`lang_scores` columns as ``_s_<lang>`` (see :func:`lang_id`
    for why the two-projection form matters)."""
    best = F.lit(0)
    pred = F.lit("und")
    for lang in LANG_ORDER:
        s = F.col(f"_s_{lang}")
        pred = F.when(s > best, F.lit(lang)).otherwise(pred)
        best = F.when(s > best, s).otherwise(best)
    return pred, best


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax marker-count heuristic with a
    fixed precedence tie-break; 'und' when no marker hits.

    The per-language scores are materialized as their own projection before
    the argmax when-chain: inlining them makes the running-max expression
    tree re-embed every earlier score twice per step (the tree doubles per
    language), so each row re-runs the full-text replace counts dozens of
    times — measured ~5× slower than the two-projection form."""
    scores = lang_scores(F.col(text_col))
    sdf = docs.select(
        F.col(id_col).alias("doc_id"),
        *[scores[lang].alias(f"_s_{lang}") for lang in LANG_ORDER],
    )
    pred, best = lang_argmax()
    return sdf.select(
        "doc_id",
        pred.alias("lang_pred"),
        best.cast("int").alias("lang_score"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, word_tokens, n_chars): whitespace tokens and
    BPE-ish word tokens (alnum runs)."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    words = F.size(F.filter(F.split(t, r"[^a-zA-Z0-9]+"), lambda x: x != ""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"),
        words.alias("word_tokens"),
        F.length(t).alias("n_chars"),
    )


def quality_parts(t: Column) -> tuple[Column, Column, Column]:
    """(q_len, q_word, q_stop) component expressions over a text column —
    length saturation, mean word length sanity, stopword presence. The
    combined score is ``round(q_len*0.4 + q_word*0.3 + q_stop*0.3, 6)``."""
    n_chars = F.length(t)
    n_ws = F.size(F.filter(F.split(t, r"\s+"), lambda x: x != ""))
    mean_wl = n_chars / F.greatest(n_ws, F.lit(1))
    stop_hits = sum(
        (occurrence_count(_padded_lower(t), m) for m in LANG_MARKERS["en"]),
        start=F.lit(0),
    )
    q_len = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    q_word = F.when((mean_wl >= 3) & (mean_wl <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    q_stop = F.least(stop_hits / F.lit(5.0), F.lit(1.0))
    return q_len, q_word, q_stop


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, q_len, q_word, q_stop, quality): deterministic [0,1] quality
    components — length saturation, mean word length sanity, stopword
    presence — rounded to 6 dp for cross-engine comparability."""
    q_len, q_word, q_stop = quality_parts(F.col(text_col))
    quality = F.round(q_len * 0.4 + q_word * 0.3 + q_stop * 0.3, 6)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(q_len, 6).alias("q_len"),
        q_word.alias("q_word"),
        F.round(q_stop, 6).alias("q_stop"),
        quality.alias("quality"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, fp): md5 of normalized text — the exact-dedup key, also
    usable as a stable shard key for content-addressed storage."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.select(F.col(id_col).alias("doc_id"), F.md5(norm).alias("fp"))
