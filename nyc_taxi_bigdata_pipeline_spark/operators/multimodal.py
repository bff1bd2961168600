"""Multimodal column plumbing (training-data pipeline extension).

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata structs. The Spark-side machinery — schema,
partition-size-aware batching, Arrow-batched Pandas UDF signatures —
is real and tested; the codec work itself (PIL/librosa/ffmpeg) is NOT
available in this container, so the decode kernels are stubbed behind
``decoder=`` injection points with a deterministic fake for tests.

Scale notes: binary payloads dominate partition size, so callers should
keep ``spark.sql.files.maxPartitionBytes`` at/below 128 MB and avoid
wide shuffles of the payload column — derive features first, then drop
the blob before any join/agg.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("format", StringType(), True),
    ]
)

FEATURE_DIM = 16


def default_fake_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decode+featurize kernel: folds
    the payload bytes into a FEATURE_DIM float vector. Replace with a
    real codec (PIL/librosa) where those libs exist."""
    if payload is None or len(payload) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.pad(arr, (0, pad))
    return arr.reshape(-1, FEATURE_DIM).mean(axis=0) / 255.0


def real_decoder_unavailable(payload: bytes) -> np.ndarray:
    """The production decode path — requires codec libraries this
    container doesn't ship."""
    raise NotImplementedError(
        "media codecs (PIL/librosa/ffmpeg) are not installed in this "
        "environment; inject a decoder or use default_fake_decoder"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = default_fake_decoder,
    batch_limit: int = 256,
) -> DataFrame:
    """binary content → FEATURE_DIM feature vector via mapInPandas.

    Arrow streams the binary column in bounded batches (``batch_limit``
    guards memory when payloads are large); the blob is dropped on
    output so downstream ops shuffle only features + metadata.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats = [decoder(p).tolist() for p in chunk["content"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "features": feats,
                    }
                )

    return media.mapInPandas(
        run, "media_id string, kind string, features array<double>"
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through untouched but rewrites
    the metadata the way a real resize kernel would — keeps pipelines
    runnable end-to-end without codecs."""
    return media.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp
    (the decode of each frame is the stubbed kernel). Demonstrates the
    explode-based fan-out shape used for real frame extraction."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "format")
    )
