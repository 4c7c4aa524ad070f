"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery — schemas, Arrow-batched ``mapInPandas``
kernels, partition sizing — is real and tested; the media *decode* step
is stubbed (no image/audio libraries in this container) behind
``decoder=`` hooks with a deterministic fake, clearly marked. Swapping
in a real decoder (PIL/ffmpeg) changes one function, not the pipeline.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("payload", BinaryType(), True),  # opaque bytes
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real media decode: expands payload
    bytes into a fixed-length float32 'feature'. STUB — replace with a
    real decoder (PIL image tensor, audio PCM frames) in production."""
    if payload is None:
        return np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(payload[:64], dtype=np.uint8).astype(np.float32)
    out = np.zeros(8, dtype=np.float32)
    if arr.size:
        chunks = np.array_split(arr, 8)
        out[: len(chunks)] = [float(c.mean()) if c.size else 0.0 for c in chunks]
    return out / 255.0


def real_decode_unavailable(payload: bytes) -> np.ndarray:
    """The honest production hook: raises until a media library exists
    in the image."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; use decoder=fake_decode for plumbing tests"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_decode,
    batch_hint: int = 1024,
) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``: the
    decode runs per Arrow batch (vectorized transfer), never per row
    through pickled Python closures."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms)
    rows JVM-side from the duration metadata; the per-frame decode then
    rides ``extract_features``. Pure DataFrame — no Python."""
    return (
        media.where(F.col("kind") == "video")
        .where(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(((i * 37 + j * 11) % 251 for j in range(96)))
        rows.append(
            (
                i,
                kind,
                f"application/x-fake-{kind}",
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                3000 + i * 10 if kind == "video" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
