"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side machinery is real and tested — schema, Arrow batch shape,
mapInPandas partitioning, metadata propagation.  The actual media decode
(image/audio libs are not installed in this container) is STUBBED behind
``decode_stub``: a deterministic fake that derives "features" from the
payload bytes, clearly marked.  Swapping in a real decoder changes only
the function body, not the pipeline.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * 4  # 128 bytes
        rows.append(
            (i, kinds[i % 3], bytearray(payload), 64, 48, 1000 + i)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_stub(payload: bytes, dim: int = 8) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features from payload bytes.

    A real deployment replaces this body with e.g. PIL/torchvision decode
    + model features; everything around it (Arrow batching, schema,
    partition shape) is production-shaped.  Raise NotImplementedError to
    opt into hard-stub mode instead of the deterministic fake."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks])


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow moves the binary column in batches; per-batch numpy work, no
    per-row Python UDF calls through the serializer."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p, dim).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp.

    The timestamp grid is computed JVM-side (sequence); actual frame
    decode is the same stub boundary as extract_features."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
