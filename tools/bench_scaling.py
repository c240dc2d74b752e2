"""Two-parallelism scaling evidence (BASELINE.md sandbox plan).

Runs the SAME crawl job on the SAME input at local[N] and local[4N]
(default 8 → 32 cores), in separate subprocesses (one JVM per master),
and reports:

- URLs fetched+deduped/sec at each level
- scaling efficiency = (T_4N / T_N) / 4  (target ≥ 0.8)
- whether the visit order and final seen set are identical at both levels
  (north rule: ordering is a pure function of data)

Usage: python tools/bench_scaling.py [n_targets] [budget]
Prints one JSON line; paste results into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import hashlib, json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
from wss_spark.crawl.frontier import CrawlConfig, run_crawl, visit_order
from wss_spark.session import get_spark
from wss_spark.synth import build_pages_df, seed_list

cores = int(sys.argv[1]); n_targets = int(sys.argv[2]); budget = int(sys.argv[3])
spark = get_spark(app_name=f"scale{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
pages = build_pages_df(spark, n_targets, seed=42).persist(); pages.count()
cfg = CrawlConfig(budget=(None if budget <= 0 else budget), n_buckets=64,
                  m_bits=1 << 20, checkpoint_every=4, defer_logs=True,
                  checkpoint_dir=tempfile.mkdtemp(prefix=f"wss_scale{{cores}}_"))
t0 = time.time()
res = run_crawl(spark, pages, seed_list(n_targets, seed=42), cfg)
wall = time.time() - t0
order = visit_order(res.fetch_log)
seen = sorted(r[0] for r in res.seen.select("canon_url").collect())
print(json.dumps({{
    "cores": cores, "wall_s": round(wall, 2), "n_urls": len(order),
    "urls_per_sec": round(len(order) / wall, 2), "waves": res.waves,
    "order_sha": hashlib.sha256("\n".join(order).encode()).hexdigest(),
    "seen_sha": hashlib.sha256("\n".join(seen).encode()).hexdigest(),
}}))
spark.stop()
"""


def run_level(cores: int, n_targets: int, budget: int) -> dict:
    script = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_targets), str(budget)],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker[{cores}] failed:\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    n_targets = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 0  # 0 = unbounded
    lo = run_level(8, n_targets, budget)
    hi = run_level(32, n_targets, budget)
    eff = (hi["urls_per_sec"] / lo["urls_per_sec"]) / 4
    print(
        json.dumps(
            {
                "n_targets": n_targets,
                "budget": budget,
                "local8": lo,
                "local32": hi,
                "scaling_efficiency": round(eff, 3),
                "identical_order": lo["order_sha"] == hi["order_sha"],
                "identical_seen_set": lo["seen_sha"] == hi["seen_sha"],
            }
        )
    )


if __name__ == "__main__":
    main()
