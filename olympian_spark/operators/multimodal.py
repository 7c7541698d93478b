"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly
batch iteration (mapInArrow), UDF signatures, batch shaping — while the
actual media decode is STUBBED (``decode_image``/``decode_audio`` raise
NotImplementedError; this container ships no codec libraries). A
deterministic fake feature extractor stands in so the distributed dataflow
(decode -> feature-extract -> resize/frame-sample schedule) can be executed
and property-tested end to end.

Schema convention:

    media(media_id long, kind string,            -- 'image' | 'audio' | 'video'
          payload binary,                        -- opaque encoded bytes
          meta struct<width int, height int, duration_ms int, codec string>)

Feature extraction runs as Arrow-batched ``mapInArrow`` (one pass per
partition, no per-row Python call overhead), emitting fixed-length float32
feature vectors — the shape a downstream embedding table expects.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary,"
    " meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_DIM = 16


def decode_image(payload: bytes, meta: dict) -> "np.ndarray":
    """Real decode requires an image codec (PIL/opencv) — not in this
    container. The dataflow uses :func:`_fake_features` instead."""
    raise NotImplementedError("image decode needs PIL/opencv; stubbed in sandbox")


def decode_audio(payload: bytes, meta: dict) -> "np.ndarray":
    raise NotImplementedError("audio decode needs soundfile/ffmpeg; stubbed in sandbox")


def _fake_features(payloads: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature extractor: a keyed hash of the payload
    bytes expanded to `dim` floats in [0,1). Replace with a real decoder +
    model on a cluster with codec libraries."""
    import hashlib

    out = np.empty((len(payloads), dim), dtype=np.float32)
    for i, p in enumerate(payloads):
        digest = b"".join(
            hashlib.md5(bytes(p) + bytes([j])).digest() for j in range((dim * 4) // 16 + 1)
        )
        h = np.frombuffer(digest[: dim * 4], dtype=np.uint32)
        out[i] = (h % 1_000_003).astype(np.float32) / np.float32(1_000_003.0)
    return out


def gen_fake_media(spark: SparkSession, n: int = 200, seed: int = 5) -> DataFrame:
    """Deterministic synthetic media table (opaque byte payloads)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8)
        rows.append(
            (
                i,
                kind,
                bytes(payload.tobytes()),
                (
                    int(rng.integers(16, 4096)) if kind == "image" else None,
                    int(rng.integers(16, 2160)) if kind == "image" else None,
                    int(rng.integers(100, 600000)) if kind != "image" else None,
                    {"image": "png", "audio": "flac", "video": "h264"}[kind],
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """media -> (media_id, kind, feature: array<float>) via mapInArrow.

    Batch shape: one Arrow batch in, one out; payload bytes never leave the
    worker; partitioning is preserved (narrow op — at 100 TB this pipelines
    straight out of the parquet scan with zero shuffles).
    """

    def op(batches):
        for batch in batches:
            ids = batch.column("media_id")
            kinds = batch.column("kind")
            payloads = batch.column("payload").to_pylist()
            feats = _fake_features(payloads, dim)
            yield pa.record_batch(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "feature": pa.array(list(feats), pa.list_(pa.float32())),
                }
            )

    return df.select("media_id", "kind", "payload").mapInArrow(
        op, "media_id long, kind string, feature array<float>"
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling schedule: one row per sampled frame timestamp —
    pure relational (sequence+explode), the decode itself being the stubbed
    step. Demonstrates the fan-out shape (row -> frames) used for video."""
    v = df.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
