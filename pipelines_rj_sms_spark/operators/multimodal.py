"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque `binary` columns with a typed metadata struct, as a
100 TB training-data lake must: bytes never pass through the driver, and
per-item decode runs as Arrow-batched Pandas iterators (`mapInPandas`).

The actual codec work (PIL/ffmpeg/torchaudio) is NOT available in this
environment, so the decode kernels are stubbed: `decode_stub=True` (the
default) produces deterministic fake features from the byte content;
`decode_stub=False` raises NotImplementedError at the point where a real
decoder would be plugged in. The Spark-side plumbing — schema, batching,
partition sizing — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("content", BinaryType()),
    StructField("media_type", StringType()),     # image|audio|video
    StructField("format", StringType()),          # png|jpeg|wav|mp4|...
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("duration_ms", LongType()),
])

_FEATURE_DIM = 16

_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("features", ArrayType(FloatType())),
])


def read_media_dir(spark, path: str) -> DataFrame:
    """Ingest a directory of media files as binary rows with metadata.

    `binaryFile` keeps bytes on executors and exposes path/length/
    modificationTime for filtering (S11 semantics, utils/tasks.py:1212-1245).
    """
    return (
        spark.read.format("binaryFile").load(path)
        .select(
            F.xxhash64("path").alias("media_id"),
            F.col("content"),
            F.element_at(F.split(F.col("path"), r"\."), -1).alias("format"),
            F.col("length").alias("n_bytes"),
            F.col("modificationTime").alias("_modified_at"),
        )
    )


def _fake_features(content: bytes, dim: int = _FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decode+embed kernel: byte-histogram
    folded to `dim` buckets, L1-normalized. Replaced wholesale when real
    codecs are available."""
    if content is None:
        return [0.0] * dim
    buckets = [0] * dim
    for byte in content[:65536]:
        buckets[byte % dim] += 1
    total = sum(buckets) or 1
    return [b / total for b in buckets]


def extract_features(df: DataFrame, content_col: str = "content",
                     id_col: str = "media_id",
                     media_type_col: str | None = None,
                     decode_stub: bool = True) -> DataFrame:
    """Per-item feature extraction via mapInPandas (Arrow batches).

    Batch shape: the iterator yields one output frame per input Arrow
    batch, so peak executor memory is one batch of raw bytes + one of
    features — size batches with spark.sql.execution.arrow.maxRecordsPerBatch
    when items are large (e.g. 4K images -> set it to ~64).
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg — not present in this "
            "environment; plug the kernel into _fake_features's slot"
        )

    mt_col = media_type_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf[id_col],
                "media_type": pdf[mt_col] if mt_col else "unknown",
                "n_bytes": pdf[content_col].map(lambda b: len(b) if b is not None else 0),
                "features": pdf[content_col].map(_fake_features),
            })
            yield out

    cols = [id_col, content_col] + ([mt_col] if mt_col else [])
    return df.select(*cols).mapInPandas(kernel, _FEATURES_SCHEMA)


_RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("content", BinaryType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
])


def resize_images(df: DataFrame, width: int, height: int,
                  content_col: str = "content", id_col: str = "media_id",
                  decode_stub: bool = True) -> DataFrame:
    """Image resize via mapInPandas — same Arrow-batch contract as
    extract_features (one batch of bytes in flight per task).

    Stub kernel: passes bytes through and stamps the target dimensions
    (a real kernel decodes -> resizes -> re-encodes in the same slot).
    """
    if not decode_stub:
        raise NotImplementedError(
            "real image resize requires PIL — not present in this "
            "environment; plug the kernel into the stub's slot"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "content": pdf[content_col],
                "width": width,
                "height": height,
            })

    return df.select(id_col, content_col).mapInPandas(kernel, _RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  id_col: str = "media_id",
                  duration_col: str = "duration_ms") -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms).

    The timestamp fan-out is expression-only (sequence+explode); the
    actual frame grab is the stubbed decode kernel downstream.
    """
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col(duration_col).cast("long"),
                       F.lit(int(every_ms)).cast("long"))
        ).alias("frame_ts_ms"),
    )
