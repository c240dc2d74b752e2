"""spark-submit entrypoint (north-rule packaging).

Usage:
    python -c "from wss_spark.session import build_py_files_zip; \
               build_py_files_zip('/tmp/wss_spark.zip')"
    spark-submit --master local[8] --py-files /tmp/wss_spark.zip \
        tools/submit_main.py [n_targets] [budget]

Runs a small end-to-end crawl + analysis against a synthesized pages table
and prints one JSON summary line. The engine code arrives on the executors
only through the --py-files zip — this file imports ``wss_spark`` with no
sys.path manipulation.
"""

import json
import sys
import tempfile

from pyspark.sql import SparkSession

from wss_spark.crawl.frontier import CrawlConfig
from wss_spark.jobs import JobTracker, run_tracked_crawl
from wss_spark.synth import build_pages_df, seed_list


def main() -> None:
    n_targets = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    status_dir = sys.argv[3] if len(sys.argv) > 3 else tempfile.mkdtemp(
        prefix="wss_status_"
    )
    spark = SparkSession.builder.appName("wss_submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    pages = build_pages_df(spark, n_targets, seed=42).persist()
    cfg = CrawlConfig(
        budget=budget, n_buckets=8, m_bits=1 << 16,
        checkpoint_dir=tempfile.mkdtemp(prefix="wss_submit_"),
    )
    # full task lifecycle through the status table (the reference api
    # server's submit → progress → result, `WDA/api_server.py:226-327`);
    # any poller can read the same table from another session via
    # JobTracker(spark, status_dir).status(task_id)
    tracker = JobTracker(spark, status_dir)
    task_id = run_tracked_crawl(
        spark, tracker, pages, seed_list(n_targets, seed=42), cfg,
        {"n_targets": n_targets, "budget": budget},
    )
    print(json.dumps({"task_id": task_id, "status_dir": status_dir,
                      **tracker.result(task_id)}))
    spark.stop()


if __name__ == "__main__":
    main()
