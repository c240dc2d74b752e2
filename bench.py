"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` plus the crawl-engine
throughput benchmark (the BASELINE.json metric: URLs fetched+deduped/sec),
and prints ONE JSON line.

Scaling evidence across parallelism levels lives in tools/bench_scaling.py
(results recorded in BASELINE.md) — this script measures one configuration.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "a1_pricing_summary",
    "a9_customer_order_profile",
    "w4_running_spend",
    "w5_sessionize",
    "j1_supplier_revenue",
    "j3_region_revenue",
    "dd_exact_groups",
    "dd_minhash_signatures",
    "dd_lsh_candidates",
    "dd_simhash",
    "ann_cosine_topk",
    "ts_quality",
    "ts_lang_id",
]

CRAWL_TARGETS_PER_SF = 1500  # sf0.1 → 150 targets ≈ 1.2k urls


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from wss_spark import catalog
    from wss_spark.crawl.frontier import CrawlConfig, run_crawl
    from wss_spark.session import get_spark
    from wss_spark.synth import build_pages_df, seed_list

    spark = get_spark(
        app_name="wss_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    t_total0 = time.time()
    # untimed warm-up: JVM/codegen/Arrow warm-up otherwise lands on whichever
    # query runs first and misreports it (VERDICT r01 §wrong-4)
    _materialize(catalog.QUERIES["a1_pricing_summary"].fn(spark, sf_dir))

    # min-of-N per query: this host's identical back-to-back runs vary up to
    # 3x (BASELINE.md hypervisor probe), so a single sample is hypervisor
    # noise, not engine signal (VERDICT r02 next-round #8)
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = catalog.QUERIES[name]
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.time()
            _materialize(q.fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # crawl throughput: URLs fetched+deduped/sec (BASELINE.json metric)
    n_targets = max(16, int(CRAWL_TARGETS_PER_SF * sf))
    pages = build_pages_df(spark, n_targets, seed=42).persist()
    pages.count()
    crawl_s = float("inf")
    for _ in range(n_runs):
        cfg = CrawlConfig(
            budget=None,  # throughput mode: politeness budget not binding
            n_buckets=64,
            m_bits=1 << 20,
            checkpoint_every=4,
            defer_logs=True,
            dedup_pages=False,  # synthetic pages table is canonical (unique url)
            checkpoint_dir=tempfile.mkdtemp(prefix="wss_bench_"),
        )
        t0 = time.time()
        res = run_crawl(spark, pages, seed_list(n_targets, seed=42), cfg)
        n_urls = res.fetch_log.count()
        crawl_s = min(crawl_s, time.time() - t0)
    timings["crawl_pipeline"] = round(crawl_s, 3)
    pages.unpersist()

    wall = time.time() - t_total0
    out = {
        # value = sum of per-query min-of-N times — a noise-resistant figure
        # no single run achieves (each addend may come from a different
        # run); the honest single-run number is wall_s. Named accordingly
        # since r04 (ADVICE r03 #3): r01/r02 'total_bench_seconds' was
        # single-run wall-per-query, r03's was min-of-N under the old name.
        "metric": "sum_best_of_n_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "n": n_runs,
        "wall_s": round(wall, 3),
        "crawl_urls": int(n_urls),
        "crawl_waves": res.waves,
        "crawl_urls_per_sec": round(n_urls / crawl_s, 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
