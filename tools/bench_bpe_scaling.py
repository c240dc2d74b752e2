"""Two-parallelism scaling evidence for the BPE tokenizer's corpus-scale
path (round 5).

Same protocol as tools/bench_scaling.py / bench_dedup_scaling.py (one JVM
per level, N-core leg pinned with taskset, tmpfs scratch, min-of-N
alternating runs), applied to subword tokenization:

- TRAIN (reported, not the headline): ``tokenize.train_bpe`` on a
  deterministic corpus sample. At 100 TB the trainer runs once on a
  bounded sample and each merge round is a small vocabulary aggregation —
  per-round fixed job cost dominates at bench scale, exactly like the
  crawl's per-wave orchestration, so its wall is recorded for honesty but
  the scaling claim is not made on it.
- ENCODE (the headline): ``tokenize.bpe_token_counts`` over the full
  corpus — explode words → chained literal replaces → one map-side
  combined aggregation. This is the operator a 100 TB release manifest /
  packing pass runs per document; it is embarrassingly parallel and must
  scale.

Reports docs encoded/sec and BPE tokens/sec at each level, the encode
scaling efficiency (target ≥ 0.8), and whether the full per-document
token-count table is IDENTICAL at both levels (the count is a pure
function of text + merge list; the merge list itself is partition-
invariant by construction and its equality across levels is asserted).

Usage:
  python tools/bench_bpe_scaling.py [n_targets] [repeats] [lo_cores]
  (defaults 60000, 1, 2 — lo/hi = N and 4N cores)
Prints one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import hashlib, json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
if os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/wss_bpebench", exist_ok=True)
    os.environ.setdefault("WSS_LOCAL_DIR", "/dev/shm/wss_bpebench/sparktmp")
    tempfile.tempdir = "/dev/shm/wss_bpebench"
os.environ.setdefault("WSS_DRIVER_MEM", "48g")
from pyspark.sql import functions as F
from wss_spark.operators.tokenize import bpe_token_counts, train_bpe
from wss_spark.session import get_spark
from wss_spark.synth import build_pages_df

cores = int(sys.argv[1]); n_targets = int(sys.argv[2])
n_merges = int(sys.argv[3]); sample_mod = int(sys.argv[4])
spark = get_spark(app_name=f"bpescale{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

docs = build_pages_df(spark, n_targets, seed=42).select(
    F.col("url").alias("doc_id"), "text"
).persist()
n_docs = docs.count()

# deterministic training sample: content-hash mod — same rows at any
# parallelism, grows with the corpus like a real pipeline's sample would
sample = docs.filter(F.abs(F.xxhash64("doc_id")) % sample_mod == 0)
t0 = time.time()
merges = train_bpe(sample, n_merges=n_merges, min_pair_freq=2)
train_wall = time.time() - t0

t0 = time.time()
counts = bpe_token_counts(docs, merges)
agg = counts.agg(
    F.sum("n_bpe_tokens").alias("tok"),
    F.sum(F.conv(F.substring(F.md5(F.concat_ws(":", "doc_id", "n_bpe_tokens")),
                             1, 15), 16, 10).cast("decimal(38,0)")).alias("s"),
    F.count(F.lit(1)).alias("n"),
).first()
encode_wall = time.time() - t0
print(json.dumps({{
    "cores": cores, "n_docs": int(n_docs),
    "train_wall_s": round(train_wall, 2),
    "n_merges_learned": len(merges),
    "merges_sha": hashlib.md5(json.dumps(merges).encode()).hexdigest()[:12],
    "encode_wall_s": round(encode_wall, 2),
    "n_counted": int(agg["n"]), "n_bpe_tokens": int(agg["tok"]),
    "docs_per_sec": round(n_docs / encode_wall, 2),
    "tokens_per_sec": round(int(agg["tok"]) / encode_wall, 2),
    "counts_sha": str(agg["s"]),
}}))
spark.stop()
shutil.rmtree("/dev/shm/wss_bpebench", ignore_errors=True)
"""


def run_level(cores: int, n_targets: int, n_merges: int, sample_mod: int) -> dict:
    script = WORKER.format(repo=REPO)
    prefix = ["taskset", "-c", f"0-{cores - 1}"] if cores < os.cpu_count() else []
    out = subprocess.run(
        prefix + [sys.executable, "-c", script, str(cores), str(n_targets),
                  str(n_merges), str(sample_mod)],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker[{cores}] failed:\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    n_targets = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    lo_cores = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_merges = int(sys.argv[4]) if len(sys.argv) > 4 else 24
    sample_mod = int(sys.argv[5]) if len(sys.argv) > 5 else 20
    hi_cores = 4 * lo_cores
    lo_runs, hi_runs = [], []
    for _ in range(repeats):
        lo_runs.append(run_level(lo_cores, n_targets, n_merges, sample_mod))
        hi_runs.append(run_level(hi_cores, n_targets, n_merges, sample_mod))
    lo = min(lo_runs, key=lambda r: r["encode_wall_s"])
    hi = min(hi_runs, key=lambda r: r["encode_wall_s"])
    if repeats > 1:
        lo["all_encode_walls"] = [r["encode_wall_s"] for r in lo_runs]
        hi["all_encode_walls"] = [r["encode_wall_s"] for r in hi_runs]
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4
    print(json.dumps({
        "mode": "bpe_encode", "n_targets": n_targets, "n_merges": n_merges,
        f"local{lo_cores}": lo, f"local{hi_cores}": hi,
        "encode_scaling_efficiency": round(eff, 3),
        "identical_merges": lo["merges_sha"] == hi["merges_sha"],
        "identical_counts": lo["counts_sha"] == hi["counts_sha"]
        and lo["n_bpe_tokens"] == hi["n_bpe_tokens"],
    }))


if __name__ == "__main__":
    main()
