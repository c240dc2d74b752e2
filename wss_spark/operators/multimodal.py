"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode step is STUBBED (this container ships no image/audio codecs —
see ``DecoderUnavailable``); everything Spark-side is real and tested:
schemas, batch shapes, partition sizing, and a deterministic fake decoder
used by tests to exercise the full pipeline. Swap ``fake_decode_image`` for a
Pillow/ffmpeg call on a real cluster and nothing else changes.

Scale notes: binary payloads dominate partition size — repartition by a
size-aware key before the decode pass so each Arrow batch stays within
executor memory (``target_batch_mb``), and keep metadata-only queries off the
binary column entirely (Parquet column pruning never reads it).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),     # image | audio | video
        StructField("payload", BinaryType(), True),   # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),    # typed metadata
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_bytes", IntegerType(), False),
        StructField("content_sha", StringType(), False),
        StructField("feat_dim", IntegerType(), False),
        StructField("feature_hash", LongType(), False),
    ]
)


class DecoderUnavailable(NotImplementedError):
    """Raised by the real decode path: no codec libraries in this container."""


def real_decode_image(payload: bytes):  # pragma: no cover - by design
    raise DecoderUnavailable(
        "image decoding requires Pillow/ffmpeg, not present in this sandbox; "
        "use fake_decode_image for pipeline tests"
    )


def fake_decode_image(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in decoder: a ``dim``-float feature from the
    payload's sha256 — stable across runs/partitions, so the Spark plumbing
    is fully testable without codecs."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def synth_media_df(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque media table (payload = seeded pseudo-bytes)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 9)
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "mime": {"image": "image/jpeg", "audio": "audio/ogg", "video": "video/mp4"}[kind],
                        "width": 64 + (i % 13) * 32 if kind != "audio" else None,
                        "height": 64 + (i % 7) * 32 if kind != "audio" else None,
                        "duration_ms": (i % 300) * 1000 if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA.fields])

    return spark.range(0, n, numPartitions=max(2, n // 512 + 1)).mapInPandas(gen, MEDIA)


def extract_features(media: DataFrame, dim: int = 16,
                     decoder=fake_decode_image) -> DataFrame:
    """Decode/feature-extract pass: one Arrow batch at a time, emitting a
    compact numeric feature row per media item (never re-emitting payloads —
    output stays narrow)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                feat = decoder(payload, dim)
                fh = int.from_bytes(
                    hashlib.sha256(",".join(f"{x:.6f}" for x in feat).encode()).digest()[:8],
                    "big",
                    signed=True,
                )
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "payload_bytes": len(payload),
                        "content_sha": hashlib.sha256(payload).hexdigest(),
                        "feat_dim": dim,
                        "feature_hash": fh,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES.fields])

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURES)


def size_aware_repartition(media: DataFrame, target_batch_mb: int = 64) -> DataFrame:
    """Repartition so each partition's payload bytes ≈ target — the knob that
    keeps decode batches inside executor memory at 100 TB."""
    stats = media.agg(
        F.sum(F.length("payload")).alias("total"), F.count("*").alias("n")
    ).first()
    total = stats["total"] or 0
    parts = max(2, int(total / (target_batch_mb * 1024 * 1024)) + 1)
    return media.repartition(parts, "media_id")


def binary_file_sink(media: DataFrame, out_dir: str,
                     already: DataFrame | None = None) -> int:
    """S9 binary/image sink (`独立版/(using)WeiboUserScrapy.py:555-591`):
    content-addressed files (md5-named, like the reference's md5 image names,
    `独立版/WeiboSuperTopicActiveUserSpider.py:110`), skip-if-exists via
    ``left_anti`` against the already-written set plus an executor-side
    existence check. Writes happen in ``foreachPartition`` — no payload ever
    passes through the driver."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    todo = media.select(
        F.md5(F.col("payload")).alias("name"), F.col("payload")
    ).dropDuplicates(["name"])
    if already is not None:
        todo = todo.join(already.select("name"), on="name", how="left_anti")

    def write_part(rows):
        for row in rows:
            path = os.path.join(out_dir, row["name"] + ".bin")
            if not os.path.exists(path):  # reference's skip-if-exists
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(bytes(row["payload"]))
                os.replace(tmp, path)

    count = todo.count()
    todo.foreachPartition(write_part)
    return count


def media_dedup(media: DataFrame) -> DataFrame:
    """Exact content dedup on payload hash — metadata-only output."""
    return (
        media.select("media_id", F.sha2(F.col("payload"), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(F.min("media_id").alias("keep_id"), F.count("*").alias("dup_count"))
    )


RESIZED = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("out_width", IntegerType(), False),
        StructField("out_height", IntegerType(), False),
        StructField("payload", BinaryType(), False),
        StructField("content_sha", StringType(), False),
    ]
)

FRAMES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("ts_ms", IntegerType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def fake_resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in resize: a pseudo-payload whose bytes are a
    pure function of (source payload, target dims), sized ~width×height/8
    — exercises the real batch/memory shape without codecs."""
    seed = hashlib.sha256((payload or b"") + f":{width}x{height}".encode()).digest()
    need = max(1, width * height // 8)
    return (seed * (need // len(seed) + 1))[:need]


def resize_images(media: DataFrame, width: int, height: int,
                  resizer=fake_resize_image) -> DataFrame:
    """Image resize pass (`media` → RESIZED rows), Arrow-batched
    mapInPandas. The real decoder is codec-gated exactly like
    real_decode_image (DecoderUnavailable in this sandbox); pass a real
    ``resizer`` in production. Only image rows are processed — the filter
    pushes to the scan, so audio/video payloads are never transferred."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload) if payload is not None else b""
                out = resizer(payload, width, height)
                rows.append(
                    {
                        "media_id": int(mid),
                        "out_width": width,
                        "out_height": height,
                        "payload": out,
                        "content_sha": hashlib.sha256(out).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED.fields])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, RESIZED)
    )


def fake_sample_frame(payload: bytes, ts_ms: int) -> bytes:
    """Deterministic stand-in frame grab at a timestamp."""
    return hashlib.sha256((payload or b"") + f"@{ts_ms}".encode()).digest() * 8


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8,
                  grabber=fake_sample_frame) -> DataFrame:
    """Video frame sampling (`media` → FRAMES rows, one per sampled
    timestamp): frames at 0, every_ms, 2·every_ms, … bounded by both the
    clip's duration_ms and ``max_frames``. Arrow-batched mapInPandas; only
    video rows transfer. The fan-out is bounded (max_frames) so a long
    video cannot blow up a batch — at 100 TB the output partitioning
    follows the input's size-aware repartition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"],
                                         pdf["duration_ms"]):
                payload = bytes(payload) if payload is not None else b""
                dur = int(dur) if pd.notna(dur) else 0
                n = min(max_frames, dur // every_ms + 1) if dur > 0 else 1
                for k in range(n):
                    ts = k * every_ms
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_index": k,
                            "ts_ms": ts,
                            "payload": grabber(payload, ts),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES.fields])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", "duration_ms")
        .mapInPandas(run, FRAMES)
    )
