"""Task-status surface (jobs.JobTracker): the reference api server's
submit → progress polling → result/cancel lifecycle
(`WeiboDeepAnalyzer/api_server.py:226-327`) as an append-only status table.
"""

import pytest

from wss_spark.crawl.frontier import CrawlConfig
from wss_spark.jobs import JobTracker, run_tracked_crawl


def _clock():
    # deterministic monotone clock
    _clock.t += 1
    return f"2026-01-01T00:00:{_clock.t:02d}+00:00"


_clock.t = 0


@pytest.fixture()
def tracker(spark, tmp_path):
    return JobTracker(spark, str(tmp_path / "status"), clock=_clock)


def test_submit_progress_result_lifecycle(spark, tmp_path, tracker, pages_small):
    from wss_spark.synth import seed_list

    cfg = CrawlConfig(budget=5, n_buckets=8, m_bits=1 << 16, max_waves=40,
                      checkpoint_dir=str(tmp_path / "crawl"))
    tid = run_tracked_crawl(
        spark, tracker, pages_small, seed_list(60, seed=42), cfg,
        {"n_targets": 60, "budget": 5}, task_id="job-1",
    )
    assert tid == "job-1"
    st = tracker.status(tid)
    assert st["status"] == "completed" and st["progress"] == 100
    res = tracker.result(tid)
    assert res["status"] == "completed"
    assert res["result"]["fetched"] > 60  # the crawl actually expanded
    assert res["result"]["waves"] >= 2
    # every wave appended a progress row a poller could have observed
    log = spark.read.parquet(tracker.status_dir)
    prog = log.filter("task_id = 'job-1' AND status = 'running'").count()
    assert prog >= res["result"]["waves"]
    # progress was monotone non-decreasing in seq order
    rows = (log.filter("task_id = 'job-1'").orderBy("seq")
            .select("progress").collect())
    vals = [r[0] for r in rows]
    assert vals == sorted(vals)


def test_poll_midflight_and_unknown_task(spark, tracker):
    tid = tracker.submit({"wid": "Qb1"}, task_id="job-2")
    assert tracker.status(tid)["status"] == "pending"
    tracker.update(tid, "running", 40, "wave 3")
    res = tracker.result(tid)
    assert res == {"status": "running", "progress": 40,
                   "message": "task still in progress"}
    with pytest.raises(KeyError):
        tracker.status("nope")
    with pytest.raises(KeyError):
        tracker.result("nope")


def test_cancel_semantics(spark, tracker):
    tid = tracker.submit({"wid": "Qb2"}, task_id="job-3")
    tracker.update(tid, "running", 10, "wave 0")
    tracker.cancel(tid)
    assert tracker.status(tid)["status"] == "cancelled"
    done = tracker.submit({"wid": "Qb3"}, task_id="job-4")
    tracker.complete(done, {"fetched": 1})
    with pytest.raises(ValueError):  # the reference's 400 branch
        tracker.cancel(done)
    with pytest.raises(KeyError):  # the reference's 404 branch
        tracker.cancel("nope")


def test_failed_task_and_list_filter(spark, tracker):
    ok = tracker.submit({"wid": "a"}, task_id="job-5")
    tracker.complete(ok, {"fetched": 2})
    bad = tracker.submit({"wid": "b"}, task_id="job-6")
    tracker.fail(bad, "ValueError: boom")
    assert tracker.result(bad) == {"status": "failed", "error": "ValueError: boom"}
    # current-state view: exactly one row per task, filters work
    cur = tracker.status_df()
    assert cur.filter("task_id = 'job-5'").count() == 1
    got = {r["task_id"] for r in tracker.list(status="completed").collect()}
    assert "job-5" in got and "job-6" not in got
    assert tracker.list(limit=1).count() == 1


def test_tracker_survives_restart(spark, tmp_path):
    """The reference loses its in-memory tasks dict on restart; the table
    does not — a fresh tracker over the same dir sees prior state and
    continues the seq chain."""
    d = str(tmp_path / "status")
    t1 = JobTracker(spark, d, clock=_clock)
    tid = t1.submit({"wid": "x"}, task_id="job-7")
    t1.update(tid, "running", 50, "wave 5")
    t2 = JobTracker(spark, d, clock=_clock)  # "restarted api server"
    assert t2.status(tid)["progress"] == 50
    t2.complete(tid, {"fetched": 9})
    assert t2.result(tid)["result"] == {"fetched": 9}
    rows = spark.read.parquet(d).filter("task_id = 'job-7'").orderBy("seq").collect()
    assert [r["seq"] for r in rows] == [1, 2, 3]


def test_health_and_sync_analyze(spark, tracker):
    from wss_spark.jobs import run_sync

    # empty table: healthy, zero active
    h0 = tracker.health()
    assert h0["status"] == "healthy" and h0["active_tasks"] == 0

    # sync run returns the payload directly AND records the full lifecycle
    out = run_sync(tracker, {"wid": "w1"}, lambda: {"total": 3})
    assert out["status"] == "completed" and out["result"] == {"total": 3}
    assert tracker.result(out["task_id"])["result"] == {"total": 3}

    # an in-flight async task counts as active
    tid = tracker.submit({"wid": "w2"})
    tracker.update(tid, "running", 10, "going")
    assert tracker.health()["active_tasks"] == 1

    # sync failure records failed and re-raises
    def boom():
        raise ValueError("nope")

    with pytest.raises(ValueError):
        run_sync(tracker, {"wid": "w3"}, boom)
    failed = [r["task_id"] for r in tracker.list(status="failed").collect()]
    assert len(failed) == 1
    assert tracker.result(failed[0])["status"] == "failed"


def test_status_table_compaction(spark, tmp_path):
    """compact() merges per-transition small files into one, preserves every
    transition (request/result payloads live on different rows), keeps all
    read answers identical, and is crash-safe: duplicated rows from a crash
    between merge-append and delete change no answer and are removed by the
    next compact()."""
    import glob
    import os
    import shutil

    from wss_spark.jobs import JobTracker

    d = str(tmp_path / "status_compact")
    tracker = JobTracker(spark, d, clock=_clock)
    t1 = tracker.submit({"wid": "a"}, task_id="t1")
    tracker.update(t1, "running", 40, "mid")
    tracker.complete(t1, {"n": 7})
    t2 = tracker.submit({"wid": "b"}, task_id="t2")
    tracker.update(t2, "running", 10, "going")

    def snapshot(tr):
        return (
            sorted(
                (r.asDict() for r in tr.status_df().collect()),
                key=lambda d: d["task_id"],
            ),
            tr.result("t1"),
            tr.status("t2"),
            tr.health()["active_tasks"],
        )

    before = snapshot(tracker)
    n_files = len(glob.glob(d + "/*.parquet"))
    assert n_files == 5  # one per transition

    assert tracker.compact() == n_files
    files_after = glob.glob(d + "/*.parquet")
    assert len(files_after) == 1
    assert snapshot(tracker) == before
    # full audit trail survives row-for-row
    assert spark.read.parquet(d).count() == 5

    # crash window: merged file appended but old files NOT yet deleted ≡
    # every row duplicated. Answers unchanged; re-compact removes the dupes.
    dup = files_after[0].replace(".parquet", "-dup.parquet")
    shutil.copyfile(files_after[0], dup)
    assert spark.read.parquet(d).count() == 10
    assert snapshot(tracker) == before
    assert tracker.compact() == 2
    assert spark.read.parquet(d).count() == 5
    assert snapshot(tracker) == before
    assert os.path.isdir(d)
