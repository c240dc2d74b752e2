"""End-to-end engine chain: synthetic web pages → extraction → corpus
cleaning (annotate → filter → exact dedup → near-dedup) → deterministic
split. One flow through every tier a training-data user composes; asserts
invariants (containment, dedup soundness, determinism) rather than fixture
values — those are pinned by the per-operator gates."""

from pyspark.sql import functions as F

from wss_spark.extraction import extract_entities
from wss_spark.operators import corpus, dedup
from wss_spark.synth import build_pages_df


def test_pages_to_training_corpus(spark):
    pages = build_pages_df(spark, 12, seed=42).cache()
    comments = extract_entities(pages)["comments"]
    docs = comments.select(
        F.col("comment_id").alias("doc_id"), F.col("content").alias("text")
    ).cache()
    n_docs = docs.count()
    assert n_docs > 50

    cleaned = corpus.clean_corpus(
        docs, langs=("zh", "en", "und"), min_quality=0.0,
        n=2, k=8, threshold=0.5,
    ).cache()
    kept_ids = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert kept_ids <= all_ids and kept_ids

    # dedup soundness: no two survivors share normalized content
    n_kept = len(kept_ids)
    n_distinct = (
        cleaned.select(dedup.normalize_text("text").alias("nt"))
        .distinct().count()
    )
    assert n_distinct == n_kept

    # survivors carry annotations with valid domains
    bad = cleaned.filter(
        ~F.col("lang_pred").isin("zh", "en", "und")
        | (F.col("quality") < 0) | (F.col("quality") > 1)
    ).count()
    assert bad == 0

    # deterministic split composes on string ids and is layout-independent
    split1 = {r["doc_id"]: r["split"]
              for r in corpus.split_by_hash(cleaned).collect()}
    split2 = {r["doc_id"]: r["split"]
              for r in corpus.split_by_hash(cleaned.repartition(13)).collect()}
    assert split1 == split2 and set(split1) == kept_ids
    assert set(split1.values()) <= {"train", "val", "test"}

    docs.unpersist(); pages.unpersist(); cleaned.unpersist()
