"""sf1 bench point for the non-crawl (dedup/corpus/ANN) tier — VERDICT r04 #7.

The driver bench runs at sf0.1 (5k docs / 2k embeddings), where several
walls are job-overhead-bound and a plan pathology (an accidental O(n²)
stage, a shuffle that should be map-side, a cache that serializes) can hide
inside the ~0.3 s floor. This tool measures the same headline operators at
10× the documents/embeddings volume so super-linear growth has a place to
show up, and reports the growth factor per query against the ≤2×-linear
criterion (t_10x ≤ 2 · 10 · t_1x; overhead-bound queries land far below).

Input: /root/testdata is read-only, so the 10× tables are DERIVED
deterministically from sf0.1 (no external data, seed-free — pure column
functions):

- documents ×10: replica 0 is verbatim; replica r>0 keeps the same word
  multiset but permutes word order by sorting on xxhash64(word, position,
  r). 3-word shingles are order-sensitive, so a permuted replica is NOT a
  near-duplicate of its original or of other replicas (cross-rep jaccard
  ~0), while two docs that were exact duplicates of each other stay exact
  duplicates within every replica — the corpus keeps sf0.1's duplicate
  STRUCTURE at 10× volume instead of degenerating into 10-member clusters.
- embeddings ×10: replica r rotates each vector left by r positions —
  norm-preserving and applied uniformly per replica, so within-replica
  cosine structure (and thus near-dup/ANN workload shape) is identical to
  sf0.1's, while cross-replica similarities are uncorrelated.

Usage: python tools/bench_sf1.py [n_runs] [cpus]
Prints one JSON line; the table lands in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
N_REPS = 10

# documents/embeddings-only headliners (the sf1 dir carries just those two
# tables; TPC-shape queries stay on the driver bench)
QUERIES = [
    "dd_exact_groups",
    "dd_minhash_signatures",
    "dd_lsh_candidates",
    "dd_near_dedup",
    "dd_substring_dedup",
    "dd_simhash_pairs",
    "ts_quality",
    "ts_lang_id",
    "bpe_token_counts",
    "llm_corpus_split",
    "llm_corpus_clean",
    "dd_text_embedding_dedup",
    "dd_embedding_dedup",
    "dd_embedding_dedup_ivf",
    "ann_ivf_topk",
]


def build_sf1(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    n_docs = docs.count()
    reps = spark.range(N_REPS).select(F.col("id").cast("int").alias("rep"))
    words = F.split(F.col("text"), " ")
    # per-replica deterministic permutation: sort words by a keyed hash of
    # (word, original position, replica). Exact-dup pairs share (words,
    # positions) so they permute identically — dup structure preserved.
    permuted = F.array_join(
        F.transform(
            F.array_sort(
                F.zip_with(
                    words,
                    F.sequence(F.lit(0), F.size(words) - 1),
                    lambda w, i: F.struct(
                        F.xxhash64(w, i, F.col("rep")).alias("k"), w.alias("w")
                    ),
                )
            ),
            lambda s: s["w"],
        ),
        " ",
    )
    big_docs = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep").cast("long") * n_docs).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text")).otherwise(permuted).alias("text"),
            "lang",
            "source",
            "rep",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("rep")
    )
    big_docs.repartition(16).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    n_vec = emb.count()
    dim = F.size("embedding")
    rotated = F.concat(
        F.slice(F.col("embedding"), F.col("rep") + 1, dim - F.col("rep")),
        F.slice(F.col("embedding"), 1, F.col("rep")),
    )
    big_emb = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep").cast("long") * n_vec).alias("vec_id"),
        F.when(F.col("rep") == 0, F.col("embedding"))
        .otherwise(rotated)
        .alias("embedding"),
        "label",
    )
    big_emb.repartition(16).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out_dir = os.environ.get("WSS_SF1_DIR", "/tmp/wss_sf1x10")

    from wss_spark import catalog
    from wss_spark.session import get_spark

    spark = get_spark(
        app_name="wss_bench_sf1", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(f"{out_dir}/documents.parquet"):
        shutil.rmtree(out_dir, ignore_errors=True)
        build_sf1(spark, out_dir)

    def _materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm-up (JVM/codegen/Arrow) off the clock
    _materialize(catalog.QUERIES["ts_quality"].fn(spark, SF01))

    results: dict[str, dict] = {}
    for name in QUERIES:
        q = catalog.QUERIES[name]
        row: dict = {}
        for label, sf_dir in (("t_sf01", SF01), ("t_10x", out_dir)):
            best = float("inf")
            for _ in range(n_runs):
                t0 = time.time()
                _materialize(q.fn(spark, sf_dir))
                best = min(best, time.time() - t0)
            row[label] = round(best, 3)
        row["growth"] = round(row["t_10x"] / row["t_sf01"], 2)
        row["within_2x_linear"] = row["t_10x"] <= 2 * N_REPS * row["t_sf01"]
        results[name] = row
        print(f"# {name}: {row}", file=sys.stderr)

    out = {
        "metric": "sf1_growth_check",
        "n_reps": N_REPS,
        "n_runs": n_runs,
        "cpus": cpus,
        "queries": results,
        "all_within_2x_linear": all(r["within_2x_linear"] for r in results.values()),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
