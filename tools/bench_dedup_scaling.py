"""Two-parallelism scaling evidence for the LLM dedup tier.

Same protocol as tools/bench_scaling.py (one JVM per level, N-core leg
pinned with taskset, tmpfs scratch, min-of-N alternating runs), applied to
the training-data near-dedup pipeline instead of the crawl:

    docs → shingles → minhash (wide) → LSH bands → candidate pairs →
    exact Jaccard on candidates → connected components → keep-first set

i.e. ``wss_spark.operators.dedup.dedup_near`` — the end-to-end operator a
100 TB corpus clean runs. Reports docs deduped/sec at each level, the
scaling efficiency (T_N / T_4N / 4, target ≥ 0.8), and whether the kept
document set is IDENTICAL at both levels (keep-first is min-id per
component — a pure function of data, never of partition layout).

Corpus: deterministic synthetic page texts (wss_spark.synth) with an
injected near-duplicate slice — every 10th document is re-emitted with a
one-token suffix under a derived id, so the pipeline has real non-trivial
components to resolve, deterministically.

Usage:
  python tools/bench_dedup_scaling.py [n_targets] [repeats] [lo_cores]
  (defaults 20000, 1, 2 — lo/hi = N and 4N cores)
Prints one JSON line; results recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
if os.path.isdir("/dev/shm"):
    os.makedirs("/dev/shm/wss_ddbench", exist_ok=True)
    os.environ.setdefault("WSS_LOCAL_DIR", "/dev/shm/wss_ddbench/sparktmp")
    tempfile.tempdir = "/dev/shm/wss_ddbench"
os.environ.setdefault("WSS_DRIVER_MEM", "48g")
from pyspark.sql import functions as F
from wss_spark.operators.dedup import dedup_near
from wss_spark.session import get_spark
from wss_spark.synth import build_pages_df

cores = int(sys.argv[1]); n_targets = int(sys.argv[2])
spark = get_spark(app_name=f"ddscale{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

# corpus: page texts + a deterministic injected near-dup slice (every 10th
# doc re-emitted with a one-token suffix under a derived id)
base = build_pages_df(spark, n_targets, seed=42).select(
    F.col("url").alias("doc_id"), "text"
)
near = base.filter(F.abs(F.xxhash64("doc_id")) % 10 == 0).select(
    F.concat(F.col("doc_id"), F.lit("#dup")).alias("doc_id"),
    F.concat(F.col("text"), F.lit(" 转发")).alias("text"),
)
docs = base.unionByName(near).persist()
n_docs = docs.count()

t0 = time.time()
kept = dedup_near(docs, n=3, k=16, rows_per_band=2, threshold=0.8)
n_kept = kept.count()
# distributed order-insensitive hash of the kept ids (driver never sees them)
kept_sha = str(kept.select(
    F.sum(F.conv(F.substring(F.md5("doc_id"), 1, 15), 16, 10)
          .cast("decimal(38,0)")).alias("s")).first()[0])
wall = time.time() - t0
print(json.dumps({{
    "cores": cores, "wall_s": round(wall, 2), "n_docs": int(n_docs),
    "n_kept": int(n_kept), "docs_per_sec": round(n_docs / wall, 2),
    "kept_sha": kept_sha,
}}))
spark.stop()
shutil.rmtree("/dev/shm/wss_ddbench", ignore_errors=True)
"""


def run_level(cores: int, n_targets: int) -> dict:
    script = WORKER.format(repo=REPO)
    prefix = ["taskset", "-c", f"0-{cores - 1}"] if cores < os.cpu_count() else []
    out = subprocess.run(
        prefix + [sys.executable, "-c", script, str(cores), str(n_targets)],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker[{cores}] failed:\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    n_targets = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    lo_cores = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi_cores = 4 * lo_cores
    lo_runs, hi_runs = [], []
    for _ in range(repeats):
        lo_runs.append(run_level(lo_cores, n_targets))
        hi_runs.append(run_level(hi_cores, n_targets))
    lo = min(lo_runs, key=lambda r: r["wall_s"])
    hi = min(hi_runs, key=lambda r: r["wall_s"])
    if repeats > 1:
        lo["all_walls"] = [r["wall_s"] for r in lo_runs]
        hi["all_walls"] = [r["wall_s"] for r in hi_runs]
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4
    print(json.dumps({
        "mode": "dedup_near", "n_targets": n_targets,
        f"local{lo_cores}": lo, f"local{hi_cores}": hi,
        "scaling_efficiency": round(eff, 3),
        "identical_keep_set": lo["kept_sha"] == hi["kept_sha"],
    }))


if __name__ == "__main__":
    main()
