"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payloads with a typed metadata struct —
the standard large-scale layout (payload stays columnar/compressed in
parquet; metadata is filterable without touching bytes, so Catalyst prunes
scans on ``kind``/``mime``/size without reading payloads).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode step is STUBBED two ways, both behind the same interface:

- ``decode_media(...)``          → raises NotImplementedError (the real
  hook; wire a codec here in production),
- ``fake_decode_features(...)``  → deterministic hash-derived feature
  vector, CLEARLY MARKED FAKE — it exists so the Spark-side plumbing
  (schema, Arrow batch shape, mapInPandas iterator contract,
  partition-preserving execution) is real and testable.

Everything Spark-side is ``mapInPandas`` (Arrow batch iterator — the
correct shape for bytes-heavy UDFs: one pass, no per-row Python, bounded
memory per batch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def decode_media(payload: bytes, mime: str) -> np.ndarray:
    """Real decode hook — NOT IMPLEMENTED in this container (no image/audio
    libs baked in). Production wires PIL/ffmpeg here; the surrounding
    Spark plumbing is unchanged."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "environment; use fake_decode_features for plumbing tests"
    )


def fake_decode_features(payload: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decode: sha256-derived unit vector. Stands in for
    a real embedding so schemas/batching/partitioning are exercised."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    v = raw / 65535.0
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def extract_features(
    media: DataFrame, use_real_decoder: bool = False
) -> DataFrame:
    """(media rows) → (media_id, kind, feature array<float>).

    mapInPandas: one Arrow batch in, one out — payload bytes never cross
    the JVM↔Python boundary row-at-a-time, and column pruning upstream
    means batches carry only (media_id, kind, mime, payload).
    """
    decoder = decode_media if use_real_decoder else None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder is not None:
                feats = [
                    decoder(p, m).tolist()
                    for p, m in zip(pdf["payload"], pdf["mime"])
                ]
            else:
                feats = [
                    fake_decode_features(bytes(p) if p is not None else None).tolist()
                    for p in pdf["payload"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    out_schema = "media_id long, kind string, feature array<float>"
    return media.select("media_id", "kind", "mime", "payload").mapInPandas(
        batches, out_schema
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode per-media frame timestamps from
    metadata (pure column ops — the decode of each frame is the stubbed
    step). Demonstrates how a 10^12-row frame table derives from metadata
    without touching payload bytes."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1)
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: passes payload through unchanged but rewrites metadata —
    the real implementation swaps ``fake`` for a codec call inside the same
    mapInPandas shape as ``extract_features``."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.n_bytes").alias("n_bytes"),
        ),
    )
