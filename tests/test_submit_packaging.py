"""North-rule packaging: the engine ships as a ``spark-submit --py-files``
package (BASELINE.json north_rule: "run via spark-submit --py-files on a
multi-executor cluster"). This test proves the deployment path for real:
it builds the zip with ``session.build_py_files_zip``, then runs
``tools/submit_main.py`` through the actual ``spark-submit`` binary FROM A
DIFFERENT CWD — so ``wss_spark`` is importable on the driver and the
executors ONLY through the ``--py-files`` artifact (submit_main does no
sys.path manipulation; running from the repo root would hide a broken zip
behind cwd imports).

The submitted job is the full tracked-crawl lifecycle (synth pages →
run_crawl → JobTracker status table), so the zip must carry every
subpackage the engine touches — a missing module anywhere fails loudly.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess

import pytest

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT),
    reason="spark-submit binary not available",
)
def test_spark_submit_py_files_runs_tracked_crawl(tmp_path):
    from wss_spark.session import build_py_files_zip

    zip_path = build_py_files_zip(str(tmp_path / "wss_spark.zip"))
    status_dir = str(tmp_path / "status")
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_main.py"),
            "4", "5", status_dir,
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        capture_output=True,
        text=True,
        timeout=600,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert out.returncode == 0 and lines, out.stderr[-3000:]
    summary = json.loads(lines[-1])
    assert summary["status"] == "completed", summary
    res = summary["result"]
    # the crawl actually crawled: fetched == seen (no re-admission),
    # entities extracted, multiple waves ran under the politeness budget
    assert res["fetched"] == res["seen"] > 0
    assert res["entities"] > 0 and res["waves"] > 1

    # cross-session observability: the status table landed where the
    # caller pointed it (another session reading it is pinned in test_jobs)
    assert os.path.isdir(status_dir)
