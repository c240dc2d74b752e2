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


def test_release_pipeline_decontaminate_scrub_mix_split(spark):
    """The release tail of the training-data pipeline: cleaned docs →
    benchmark decontamination → PII scrub → temperature-flattened source
    mixing → deterministic split. Asserts stage invariants (containment,
    zero residual overlap, no unmasked PII, mix determinism, split
    partition) — fixture values are pinned by the per-operator gates."""
    rows = []
    for i in range(120):
        src = "src0" if i % 4 else "src1"    # 90/30 skew: flattening must bite
        txt = (f"document {i} body with shared phrase alpha beta gamma"
               if i % 10 == 0 else
               f"document {i} unique body mail u{i}@ex.com at 10.0.{i % 200}.9")
        rows.append((i, txt, src))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    bench = spark.createDataFrame(
        [(900, "eval question on the shared phrase alpha beta gamma end")],
        "doc_id long, text string",
    )

    # 1. decontaminate: every doc carrying the benchmark 3-gram drops
    clean = dedup.decontaminate(docs, bench, n=3).cache()
    n_clean = clean.count()
    assert n_clean == docs.count() - 12          # the i % 10 == 0 docs
    assert dedup.contamination_hits(clean, bench, n=3).count() == 0

    # 2. scrub: no email/IP survives; counts flagged the scrubbed rows
    scrubbed = corpus.scrub_pii(clean).cache()
    assert scrubbed.count() == n_clean
    assert scrubbed.filter(F.col("text").contains("@")).count() == 0
    assert scrubbed.filter(
        (F.col("n_email") > 0) & ~F.col("text").contains("<EMAIL>")
    ).count() == 0

    # 3. mix: rates planned from observed counts, typo-guarded, deterministic
    counts = {r["source"]: r["n"] for r in
              scrubbed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    rates = corpus.temperature_rates(counts, temperature=5.0)
    mixed = corpus.sample_by_source(scrubbed, rates,
                                    known_sources=set(counts)).cache()
    again = corpus.sample_by_source(scrubbed.repartition(7), rates,
                                    known_sources=set(counts))
    assert ({r["doc_id"] for r in mixed.select("doc_id").collect()}
            == {r["doc_id"] for r in again.select("doc_id").collect()})
    # flattening must actually bite: the majority source's rate is < 1 on
    # this 3:1 skew, so it is STRICTLY downsampled; the minority capped at
    # 1.0 keeps everything
    maj = max(counts, key=counts.get)
    mnr = min(counts, key=counts.get)
    assert rates[maj] < 1.0 and rates[mnr] == 1.0
    mixed_counts = {r["source"]: r["n"] for r in
                    mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert mixed_counts.get(maj, 0) < counts[maj]
    assert mixed_counts.get(mnr, 0) == counts[mnr]

    # 4. split: labels partition the mixed corpus deterministically
    split = corpus.split_by_hash(mixed)
    got = {r["doc_id"]: r["split"] for r in split.collect()}
    assert set(got) == {r["doc_id"] for r in mixed.select("doc_id").collect()}
    assert set(got.values()) <= {"train", "val", "test"}

    clean.unpersist(); scrubbed.unpersist(); mixed.unpersist()


def test_run_stages_checkpoint_resume(spark, tmp_path):
    """Stage-checkpointed pipeline driver: committed stages are never
    re-planned on resume; deleting the last marker re-runs ONLY that stage;
    results equal the fresh run byte-for-byte."""
    import json
    import os

    docs = spark.createDataFrame(
        [(i, f"doc {i} body mail u{i}@ex.com word " * 3, f"s{i % 2}")
         for i in range(40)],
        "doc_id long, text string, source string",
    )
    calls = {"scrub": 0, "mix": 0, "split": 0}

    def stage(name, fn):
        def run(d):
            calls[name] += 1
            return fn(d)
        return (name, run)

    stages = [
        stage("scrub", corpus.scrub_pii),
        stage("mix", lambda d: corpus.sample_by_source(d, {"s0": 0.5})),
        stage("split", corpus.split_by_hash),
    ]
    out_dir = str(tmp_path / "pipe")
    first = {tuple(r) for r in
             corpus.run_stages(spark, docs, out_dir, stages).collect()}
    assert calls == {"scrub": 1, "mix": 1, "split": 1}
    # every stage committed with a row count
    for i, name in enumerate(["scrub", "mix", "split"]):
        m = json.load(open(os.path.join(out_dir, f"{i:02d}_{name}",
                                        "_COMMIT.json")))
        assert m["stage"] == name and m["rows"] > 0

    # full resume: zero stage callables re-run, identical result
    again = {tuple(r) for r in
             corpus.run_stages(spark, docs, out_dir, stages).collect()}
    assert calls == {"scrub": 1, "mix": 1, "split": 1}
    assert again == first

    # crash-before-commit on the LAST stage: only it re-runs
    os.remove(os.path.join(out_dir, "02_split", "_COMMIT.json"))
    third = {tuple(r) for r in
             corpus.run_stages(spark, docs, out_dir, stages).collect()}
    assert calls == {"scrub": 1, "mix": 1, "split": 2}
    assert third == first

    # invalidating a MID stage cascades: split must not serve output
    # derived from the replaced mix artifact
    os.remove(os.path.join(out_dir, "01_mix", "_COMMIT.json"))
    fourth = {tuple(r) for r in
              corpus.run_stages(spark, docs, out_dir, stages).collect()}
    assert calls == {"scrub": 1, "mix": 2, "split": 3}
    assert fourth == first


def test_warc_to_perplexity_filtered_corpus(spark, tmp_path):
    """The full crawl-to-corpus boundary chain: WARC segment bytes →
    parse → extraction → bigram-LM perplexity filter. Extraction over
    WARC-round-tripped pages must equal extraction over the originals
    (byte-identical html in, identical rows out), and the filter output
    must be a deterministic, containment-sound fluent subset."""
    from wss_spark import warc

    pages = build_pages_df(spark, 10, seed=11).cache()
    segs = warc.pages_to_warc(pages, n_segments=3, gzip_members=True)
    rehydrated = warc.parse_warc(segs).select("url", "warc_ts", "html").cache()
    assert rehydrated.count() == pages.count()

    def comment_rows(p):
        return sorted(
            tuple(r) for r in extract_entities(p)["comments"]
            .select("comment_id", "content", "like_count").collect()
        )

    assert comment_rows(rehydrated) == comment_rows(pages)

    docs = (
        extract_entities(rehydrated)["comments"]
        .select(F.col("comment_id").alias("doc_id"),
                F.col("content").alias("text"))
        # comments surface on both the main page and the comment pages —
        # one doc per comment id for the keyed scoring below
        .dropDuplicates(["doc_id"])
        .cache()
    )
    # char unit: the comments are Chinese — whitespace tokenization would
    # collapse each doc to one opaque token and every score would tie
    lm = corpus.train_bigram_lm(docs, min_count=2, alpha=1.0, unit="char")
    scored = corpus.score_perplexity(docs, lm).cache()
    n_docs, n_scored = docs.count(), scored.count()
    assert n_scored == n_docs  # every doc scores, even empty text
    # cut strictly below the worst score → guaranteed strict fluent subset
    # (a quantile cut can tie across most of a small corpus)
    lo, hi = scored.agg(F.min("ppl"), F.max("ppl")).first()
    assert lo < hi
    cut = scored.where(F.col("ppl") < hi).agg(F.max("ppl")).first()[0]
    kept = corpus.perplexity_filter(docs, lm, max_ppl=cut).cache()
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert kept_ids and kept_ids < all_ids  # nonempty strict fluent subset
    # determinism under layout
    kept2 = {
        r["doc_id"]
        for r in corpus.perplexity_filter(
            docs.repartition(7), lm, max_ppl=cut
        ).select("doc_id").collect()
    }
    assert kept2 == kept_ids
    lm.unpersist()
    for df in (pages, rehydrated, docs, scored):
        df.unpersist()
    # terminal egress: the filtered corpus ships as a verified release —
    # WARC bytes in, checksummed shards out, nothing lost in between
    rel = str(tmp_path / "rel")
    corpus.write_release(kept, rel, n_shards=4)
    assert corpus.verify_release(spark, rel).count() == 0
    back = spark.read.parquet(f"{rel}/data")
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == kept_ids
    kept.unpersist()
