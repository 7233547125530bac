"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The container has no image/audio codecs, so the *decode kernels* are
stubbed (deterministic fake or NotImplementedError), but the Spark-side
plumbing is real and tested: schemas, Arrow-batched ``mapInPandas``
pipelines, partition sizing, and batch shapes are exactly what a real
decoder would plug into.

Pipeline shape at 100 TB: media rows are large (MBs), so
``spark.sql.files.maxPartitionBytes`` and Arrow's maxRecordsPerBatch bound
executor memory; each mapInPandas batch holds tens of rows, not
thousands. Feature extraction emits fixed-size float arrays that become
the ``embedding`` column the similarity operators consume.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from fstd2pandas_spark.plans.partitioning import ensure_min_partitions

#: schema of a multimodal asset row
MEDIA_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
])

FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decoder: a real build would call PIL/ffmpeg here. Deterministic
    fake: md5-seeded byte histogram folded to FEATURE_DIM floats."""
    if payload is None:
        payload = b""
    digest = hashlib.md5(payload).digest()
    arr = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    return arr.reshape(FEATURE_DIM, -1).mean(axis=1) / 255.0


def extract_features(df: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real decode is stubbed (:func:`_fake_decode`); the mapInPandas batch
    shape, schema and memory profile are production-real.
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # bound working set: split oversized Arrow batches
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start:start + batch_rows]
                feats = [_fake_decode(p).tolist() for p in chunk["payload"]]
                yield pd.DataFrame({
                    "asset_id": chunk["asset_id"].values,
                    "kind": chunk["kind"].values,
                    "n_bytes": [len(p) if p is not None else 0
                                for p in chunk["payload"]],
                    "feature": feats,
                })

    return ensure_min_partitions(df).mapInPandas(_run, schema=_FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: image resize kernel. Raises on execution (no codec in this
    container); the plan-side contract (schema in = schema out with new
    width/height) is real."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image codecs unavailable in this container; plug PIL/opencv here"
        )
        yield  # pragma: no cover

    out_schema = df.schema
    resized = df.mapInPandas(_run, schema=out_schema)
    return resized.withColumn("width", F.lit(width)).withColumn("height", F.lit(height))


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB: frame sampling — one output row per sampled frame. The
    explode-shaped metadata computation (frame timestamps from
    duration_ms) is real; frame decode is the stubbed part."""
    frames = df.withColumn(
        "frame_ts",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )
    return frames.withColumn(
        "frame_payload",
        F.lit(None).cast("binary"),  # a real build decodes here
    )
