"""Shared filesystem commit primitives for the checkpoint/marker protocol.

One definition of the atomic JSON commit marker (write sidecar tmp, fsync,
rename into place) so a future change — marker schema, durability tweak —
lands everywhere at once instead of in per-module copies. POSIX-local by
design: `os.replace` atomicity is a local-filesystem property. On an object
store (s3a://, hdfs://) route markers through the Hadoop FileSystem API
instead; every consumer documents that constraint.
"""

from __future__ import annotations

import json
import os


def atomic_json_marker(marker_path: str, payload: dict) -> None:
    """Write ``payload`` as JSON to ``marker_path`` atomically: the marker
    either exists complete or not at all (the Iceberg-shaped commit point —
    data files first, marker rename last)."""
    tmp = marker_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, marker_path)
