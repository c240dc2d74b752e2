"""Per-wave snapshot checkpointing + resume (north-rule resumability).

The reference checkpoints by rewriting ``user_page.json`` after every page and
flushing CSV every N pages (`独立版/(using)WeiboUserScrapy.py:511-537`). The
engine's equivalent is a snapshot per wave holding everything needed to resume
mid-crawl: the pending frontier, the exact seen set, the bloom state, plus
append-only per-wave logs (fetch lineage/metrics, extracted entities).

This sandbox has no Iceberg runtime jar, so snapshots are parquet directories
with an Iceberg-shaped commit protocol: all data files are written first, then
a tiny ``_COMMIT.json`` manifest is atomically renamed into place — a snapshot
exists iff its manifest does (exactly Iceberg's metadata-pointer-last rule).
On a real cluster the same layout maps 1:1 onto Iceberg tables
(``df.writeTo(tbl).append()`` / snapshot ids) with no engine change.

Layout::

    ckpt/
      snapshots/wave=00007/{frontier,seen,bloom}/   # full state to resume
      snapshots/wave=00007/_COMMIT.json             # manifest, written last
      logs/fetch_log/wave=00007/                    # append-only lineage
      logs/metrics/wave=00007/
      logs/entities/wave=00007/                     # tall PARSED rows
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def _wave_dir(root: str, wave: int) -> str:
    return os.path.join(root, "snapshots", f"wave={wave:05d}")


@dataclass
class Snapshot:
    wave: int
    manifest: dict


def write_snapshot(root: str, wave: int, frontier: DataFrame, seen: DataFrame,
                   bloom: DataFrame, stats: dict) -> Snapshot:
    d = _wave_dir(root, wave)
    frontier.write.mode("overwrite").parquet(os.path.join(d, "frontier"))
    seen.write.mode("overwrite").parquet(os.path.join(d, "seen"))
    bloom.write.mode("overwrite").parquet(os.path.join(d, "bloom"))
    manifest = {"wave": wave, "committed_at": time.time(), **stats}
    tmp = os.path.join(d, "_COMMIT.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(d, "_COMMIT.json"))  # commit point
    return Snapshot(wave, manifest)


def write_log(root: str, name: str, wave: int, df: DataFrame) -> None:
    """Append-only per-wave log (idempotent: re-running a wave overwrites its
    own directory, so a crash between logs and snapshot cannot duplicate)."""
    df.write.mode("overwrite").parquet(
        os.path.join(root, "logs", name, f"wave={wave:05d}")
    )


def latest_snapshot(root: str) -> Snapshot | None:
    snap_root = os.path.join(root, "snapshots")
    if not os.path.isdir(snap_root):
        return None
    best: Snapshot | None = None
    for entry in os.listdir(snap_root):
        mf = os.path.join(snap_root, entry, "_COMMIT.json")
        if entry.startswith("wave=") and os.path.exists(mf):
            with open(mf) as f:
                manifest = json.load(f)
            if best is None or manifest["wave"] > best.wave:
                best = Snapshot(manifest["wave"], manifest)
    return best


def read_state(spark: SparkSession, root: str, wave: int):
    d = _wave_dir(root, wave)
    return (
        spark.read.parquet(os.path.join(d, "frontier")),
        spark.read.parquet(os.path.join(d, "seen")),
        spark.read.parquet(os.path.join(d, "bloom")),
    )


def read_log(spark: SparkSession, root: str, name: str,
             up_to_wave: int | None = None) -> DataFrame | None:
    """Union of committed per-wave log dirs (≤ the resumed snapshot's wave,
    so logs from an uncommitted, crashed wave are ignored)."""
    log_root = os.path.join(root, "logs", name)
    if not os.path.isdir(log_root):
        return None
    dirs = []
    for entry in sorted(os.listdir(log_root)):
        if not entry.startswith("wave="):
            continue
        w = int(entry.split("=")[1])
        if up_to_wave is not None and w > up_to_wave:
            continue
        dirs.append(os.path.join(log_root, entry))
    if not dirs:
        return None
    return spark.read.parquet(*dirs)
