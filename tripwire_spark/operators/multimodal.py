"""Multimodal columns: images/audio/video as opaque ``binary`` with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing here is REAL and tested: schemas, partitioning,
UDF signatures, batch shapes, and the deterministic fake feature
extractor.  The actual codec calls (Pillow/librosa/ffmpeg) are NOT in
this container, so the decode step is stubbed behind
``_decode_image_real`` raising ``NotImplementedError`` — swap that one
function when the libs exist; nothing else changes.

Pattern notes for 100 TB media tables:
- media stays in its own table keyed by content hash; pipelines join
  metadata first and only ship bytes into the UDF stage that needs
  them (column pruning keeps the scan light),
- ``mapInPandas`` (iterator form) processes one Arrow batch at a time,
  so peak memory is one batch of blobs per task, not one partition,
- ``spark.sql.files.maxPartitionBytes`` (or a repartition on the hash)
  bounds blob bytes per task.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, width int, height int, "
    "sample_rate int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"
THUMB_SCHEMA = "media_id long, thumb binary, thumb_w int, thumb_h int"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_ts_ms int"


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media blobs (content = seeded bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod("id", F.lit(3)) + 1).cast("int")).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("content"),
        (F.lit(64) + F.pmod("id", F.lit(64))).cast("int").alias("width"),
        (F.lit(48) + F.pmod("id", F.lit(48))).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.lit(1000) + (F.col("id") * 37)).cast("int").alias("duration_ms"),
    )


def _decode_image_real(content: bytes):  # pragma: no cover - stub
    """Real decode (Pillow) — library not present in this container."""
    raise NotImplementedError("image codec not available; deterministic fake used instead")


def _fake_feature(content: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature vector."""
    b = np.frombuffer(content or b"\x00", dtype=np.uint8)
    acc = np.array([b[i::dim].sum() % 997 for i in range(dim)], dtype=np.float32)
    return acc / 997.0


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Batch-shaped feature extraction over binary content."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_feature(c, dim).tolist() if c is not None else None
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_thumbnails(media: DataFrame, max_side: int = 16) -> DataFrame:
    """Resize plumbing: output dims = aspect-preserving clamp; thumb
    bytes from the deterministic fake (decode stubbed).

    Dimension math is vectorized numpy over the whole Arrow batch; the
    only per-element Python is the per-blob fake-thumb bytes (a real
    codec call would be per-blob anyway)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].to_numpy(dtype=np.float64)
            h = pdf["height"].to_numpy(dtype=np.float64)
            scale = max_side / np.maximum(w, h)
            tw = np.maximum(1, (w * scale).astype(np.int64))
            th = np.maximum(1, (h * scale).astype(np.int64))
            thumbs = [
                (_fake_feature(c, 4) * 255).astype(np.uint8).tobytes()
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "thumb": thumbs,
                    "thumb_w": tw.astype("int32"),
                    "thumb_h": th.astype("int32"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, schema=THUMB_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Frame sampling for video rows: pure column math (no decode) —
    one row per sampled timestamp."""
    vid = media.filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.floor(F.col("duration_ms") / every_ms).cast("int"))
    return vid.select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
        (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
    ).select("media_id", "frame_idx", F.col("frame_ts_ms").cast("int"))
