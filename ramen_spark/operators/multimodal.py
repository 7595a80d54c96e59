"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns next to typed metadata
structs; all heavy per-item work (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched ``mapInPandas`` so bytes never
round-trip through the driver and batches stay columnar end-to-end.

The decode kernels themselves are STUBS in this container (no
PIL/ffmpeg/librosa baked in — see the module-level ``HAS_*`` gates):
they either raise NotImplementedError (strict mode) or produce a
deterministic fake (test mode) — the Spark-side contract (schemas,
batch iteration, partitioning, UDF signatures) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not in this container
    import PIL.Image  # noqa: F401

    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False

# Schema of a media column: raw bytes + typed metadata. At 100 TB the
# binary payload dominates — keep media in their own parquet column
# chunks (automatic) and ALWAYS prune it out of plans that only touch
# metadata (Catalyst column pruning does this when you select narrow).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _fake_feature(payload: bytes | None, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: hash bytes
    into a unit-ish vector. Replace with the real kernel when the
    media libs are available."""
    if payload is None:
        return [0.0] * dim
    h = np.frombuffer(payload[: dim * 8].ljust(dim * 8, b"\0"), dtype=np.uint64)
    v = (h % 1000).astype(np.float64) / 1000.0
    return v[:dim].tolist()


def extract_features(df: DataFrame, strict: bool = False, dim: int = FEATURE_DIM) -> DataFrame:
    """Decode + feature-extract media bytes → array<double> features.

    ``mapInPandas``: Arrow batches in/out, one pass, no shuffle. In a
    real deployment the body calls the codec; here it is gated.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict and not HAS_PIL:
                raise NotImplementedError(
                    "media decode requires image/audio libs not present in this container"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [_fake_feature(b, dim) for b in pdf["content"]],
                }
            )

    return df.select("media_id", "kind", "content").mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, every_s: float = 1.0, strict: bool = False) -> DataFrame:
    """Frame-sample videos: one output row per sampled frame offset.

    Spark shape: compute n_frames from metadata (JVM-side), explode the
    offsets, and only then decode the needed frames in mapInPandas —
    so the expensive decode fan-out happens AFTER the cheap row
    explosion, partition-parallel."""
    # sequence() is integral-only: generate frame indices, scale to
    # seconds afterwards. dur=4s, every=1s → indices 0..3.
    n_frames = F.greatest(
        F.ceil(F.coalesce(F.col("meta.duration_s"), F.lit(0.0)) / F.lit(float(every_s))),
        F.lit(1),
    ).cast("long")
    with_n = df.withColumn(
        "_frame_idx", F.explode(F.sequence(F.lit(0).cast("long"), n_frames - 1))
    ).withColumn("frame_offset", F.col("_frame_idx") * F.lit(float(every_s)))
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_offset", T.DoubleType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                raise NotImplementedError("video decode not available in this container")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_offset": pdf["frame_offset"],
                    # deterministic fake frame: 8 bytes derived from id+offset
                    "frame": [
                        (int(m) * 1000003 + int(o * 1000)).to_bytes(8, "little")
                        for m, o in zip(pdf["media_id"], pdf["frame_offset"])
                    ],
                }
            )

    return with_n.select("media_id", "frame_offset", "content").mapInPandas(decode, out_schema)


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests (no real codecs)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        rows.append(
            (
                i,
                kind,
                bytes([(i * 7 + j) % 256 for j in range(128)]),
                {
                    "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    "width": 64 if kind == "image" else None,
                    "height": 64 if kind == "image" else None,
                    "duration_s": 4.0 if kind != "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
