"""Async task-status surface: job status as an append-only metrics table.

The distributed analog of the reference's task API
(`WeiboDeepAnalyzer/api_server.py:226-327`): submit returns a task id
(POST /api/analyze → pending), pollers read progress
(GET /api/tasks/{id}), the result endpoint returns the finished payload or
the in-flight progress (GET /api/tasks/{id}/result), cancel marks a
still-running task (DELETE /api/tasks/{id} — the reference notes the
underlying work keeps running; same here), and list enumerates recent tasks
(GET /api/tasks?limit&status).

Spark-first shape (SURVEY.md §3.3): instead of a FastAPI process holding a
``tasks`` dict in memory, every state transition is ONE APPENDED ROW in a
parquet status table — the current state of a task is the row with the
highest ``seq`` per ``task_id`` (the W2 keep-first twin, reversed). That
makes the surface:

- durable (an api-server restart loses the reference's dict; the table
  survives),
- pollable from any session (the reader needs only the table path),
- write-contention-free at scale (writers append tiny files, never
  read-modify-write; compaction is a table-maintenance job, not a
  correctness requirement).

This is a control-plane table: O(tasks × transitions) rows, trivially small
next to the data plane — one file per transition is the right trade.
"""

from __future__ import annotations

import json
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

STATUS_SCHEMA = (
    "task_id string, seq int, status string, progress int, message string, "
    "request_json string, result_json string, error string, updated_at string"
)

_ACTIVE = ("pending", "running")
_TERMINAL = ("completed", "failed")


def _utcnow() -> str:
    return datetime.now(timezone.utc).isoformat()


class JobTracker:
    """Writer/reader over one status table directory.

    ``clock`` is injectable so tests stay deterministic; task ids can be
    supplied explicitly for the same reason (default uuid4, like the
    reference `api_server.py:243`).
    """

    def __init__(self, spark: SparkSession, status_dir: str, clock=None):
        self.spark = spark
        self.status_dir = status_dir
        self._clock = clock or _utcnow
        self._seq: dict[str, int] = {}

    # -- write side ---------------------------------------------------------

    def _append(self, row: tuple) -> None:
        self.spark.createDataFrame([row], STATUS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.status_dir)

    def _next_seq(self, task_id: str) -> int:
        if task_id not in self._seq:
            cur = self._current(task_id)
            self._seq[task_id] = 0 if cur is None else cur["seq"]
        self._seq[task_id] += 1
        return self._seq[task_id]

    def submit(self, request_info: dict, task_id: str | None = None) -> str:
        """POST /api/analyze (`api_server.py:227-260`): record the request,
        return the id in 'pending' state."""
        task_id = task_id or str(uuid.uuid4())
        self._append(
            (task_id, self._next_seq(task_id), "pending", 0,
             "task submitted; poll for progress",
             json.dumps(request_info, ensure_ascii=False, sort_keys=True),
             None, None, self._clock())
        )
        return task_id

    def update(self, task_id: str, status: str = "running",
               progress: int = 0, message: str = "") -> None:
        """Progress transition (the reference's `_update_task` writes into
        the dict; here it appends)."""
        self._append(
            (task_id, self._next_seq(task_id), status, int(progress),
             message, None, None, None, self._clock())
        )

    def complete(self, task_id: str, result: dict) -> None:
        self._append(
            (task_id, self._next_seq(task_id), "completed", 100, "done",
             None, json.dumps(result, ensure_ascii=False, sort_keys=True),
             None, self._clock())
        )

    def fail(self, task_id: str, error: str) -> None:
        self._append(
            (task_id, self._next_seq(task_id), "failed", 0, "failed",
             None, None, error, self._clock())
        )

    def compact(self) -> int:
        """Status-table small-file maintenance (VERDICT r04 wrong #2): merge
        the one-file-per-transition appends into a single file, preserving
        EVERY transition row (the audit trail — request_json lives only on
        the submit row, result_json only on the complete row; keep-latest
        row compaction would drop both).

        Crash-safe without a table format because the read side is
        keep-last-per-task over content rows: the merged file is APPENDED
        first and the pre-existing files deleted after, so a crash between
        the two steps leaves exact-duplicate rows — ties on (seq,
        updated_at) resolve to identical content, every read answer is
        unchanged, and the next compact() removes the duplicates (its merge
        re-reads everything and dropDuplicates collapses them). Returns the
        number of files merged away; call on whatever cadence keeps the
        directory listing cheap — same trade as the crawl seen store's
        segment compaction (crawl/checkpoint.compact_seen_keys).
        """
        import glob
        import os

        old = sorted(glob.glob(os.path.join(self.status_dir, "*.parquet")))
        if len(old) <= 1:
            return 0
        merged = (
            self.spark.read.schema(STATUS_SCHEMA)
            .parquet(*old)
            .dropDuplicates()
        )
        merged.coalesce(1).write.mode("append").parquet(self.status_dir)
        for f in old:
            os.remove(f)
        return len(old)

    def cancel(self, task_id: str) -> None:
        """DELETE /api/tasks/{id} (`api_server.py:306-327`): refuse on a
        terminal task (the 400 branch); otherwise mark cancelled — the
        in-flight computation is not interrupted, exactly like the
        reference."""
        cur = self._current(task_id)
        if cur is None:
            raise KeyError(task_id)
        if cur["status"] in _TERMINAL:
            raise ValueError("task already finished; cannot cancel")
        self.update(task_id, status="cancelled", progress=cur["progress"],
                    message="cancelled by user")

    # -- read side ----------------------------------------------------------

    def status_df(self) -> DataFrame:
        """Current state per task: keep-last per task_id by (seq, updated_at).

        seq is assigned by the writing tracker (driver-memory counter seeded
        from the table): the contract is SINGLE WRITER PER TASK — appends
        from many trackers coexist fine as long as no two update the same
        task_id concurrently. Should that contract be violated, tied seqs
        resolve deterministically by updated_at (latest wins) rather than
        leaving row_number to pick arbitrarily (ADVICE r03 #4)."""
        try:
            log = self.spark.read.schema(STATUS_SCHEMA).parquet(self.status_dir)
        except Exception:
            return self.spark.createDataFrame([], STATUS_SCHEMA)
        w = Window.partitionBy("task_id").orderBy(
            F.col("seq").desc(), F.col("updated_at").desc()
        )
        return (
            log.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _current(self, task_id: str):
        rows = self.status_df().filter(F.col("task_id") == task_id).collect()
        return rows[0] if rows else None

    def status(self, task_id: str) -> dict:
        """GET /api/tasks/{id} (`api_server.py:262-274`); KeyError = 404."""
        cur = self._current(task_id)
        if cur is None:
            raise KeyError(task_id)
        return {k: cur[k] for k in
                ("task_id", "status", "progress", "message", "updated_at")}

    def result(self, task_id: str) -> dict:
        """GET /api/tasks/{id}/result (`api_server.py:277-303`): completed →
        the payload, failed → the error, otherwise the in-flight progress."""
        cur = self._current(task_id)
        if cur is None:
            raise KeyError(task_id)
        if cur["status"] == "completed":
            return {"status": "completed", "result": json.loads(cur["result_json"])}
        if cur["status"] == "failed":
            return {"status": "failed", "error": cur["error"]}
        return {"status": cur["status"], "progress": cur["progress"],
                "message": "task still in progress"}

    def health(self) -> dict:
        """GET /health (`WeiboDeepAnalyzer/api_server.py:216-224`): liveness +
        active-task count — one aggregate over the status table (keep-last
        rows), like the reference counts its pending/running dict entries."""
        active = (
            self.status_df()
            .filter(F.col("status").isin(list(_ACTIVE)))
            .count()
        )
        return {
            "status": "healthy",
            "timestamp": self._clock(),
            "active_tasks": int(active),
        }

    def list(self, limit: int = 20, status: str | None = None) -> DataFrame:
        """GET /api/tasks (`api_server.py:330-343`): newest first by latest
        transition, optional status filter."""
        df = self.status_df()
        if status is not None:
            df = df.filter(F.col("status") == status)
        return df.orderBy(F.col("updated_at").desc(), F.col("task_id")).limit(limit)


def run_sync(tracker: JobTracker, request_info: dict, fn,
             task_id: str | None = None) -> dict:
    """POST /api/analyze/sync (`WeiboDeepAnalyzer/api_server.py:363-395`):
    run the analysis inline and return the full result payload directly —
    the reference's small-data variant that skips polling. The status table
    still records the complete lifecycle, so sync runs are auditable exactly
    like async ones. ``fn`` is a zero-arg callable returning the
    JSON-serializable result dict."""
    task_id = tracker.submit(request_info, task_id=task_id)
    tracker.update(task_id, "running", 50, "sync analysis running")
    try:
        result = fn()
        # inside the try: a non-JSON-serializable result makes complete()'s
        # json.dumps raise, and that too must land the task in 'failed'
        # rather than leaving it 'running' forever
        tracker.complete(task_id, result)
    except Exception as exc:  # the reference's HTTP-500 branch (`:384`)
        tracker.fail(task_id, f"{type(exc).__name__}: {exc}")
        raise
    return {"task_id": task_id, "status": "completed", "result": result}


def run_tracked_crawl(spark: SparkSession, tracker: JobTracker, pages,
                      seed_urls, config, request_info: dict,
                      task_id: str | None = None) -> str:
    """submit → per-wave progress → completed/failed, the full reference
    task lifecycle (`api_server.py:94-199` _run_analysis) over run_crawl's
    on_wave hook. Returns the task id."""
    from wss_spark.crawl.frontier import run_crawl

    task_id = tracker.submit(request_info, task_id=task_id)
    tracker.update(task_id, "running", 1, "crawl started")

    def on_wave(m: dict) -> None:
        # max_waves bounds the loop, so wave/max_waves is a monotone,
        # conservative progress fraction (the reference reports coarse
        # percentages per phase the same way, `api_server.py:118-160`)
        pct = min(99, int((m["wave"] + 1) * 100 / max(1, config.max_waves)))
        tracker.update(
            task_id, "running", pct,
            f"wave {m['wave']}: {m['n_admitted']} fetched, "
            f"{m['n_entities']} entities",
        )

    try:
        res = run_crawl(spark, pages, seed_urls, config, on_wave=on_wave)
        tracker.complete(
            task_id,
            {
                "fetched": res.fetch_log.count(),
                "waves": res.waves,
                "entities": res.entities.filter("kind <> 'page'").count(),
                "seen": res.seen.count(),
            },
        )
    except Exception as exc:  # the reference's failed branch (`:188-199`)
        tracker.fail(task_id, f"{type(exc).__name__}: {exc}")
        raise
    return task_id
