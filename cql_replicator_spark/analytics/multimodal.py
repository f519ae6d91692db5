"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side mechanics are real and tested — schema convention,
Arrow-batched mapInPandas pipelines, partition sizing — while the
actual media decoding is stubbed behind ``NotImplementedError`` (the
image/audio libraries are not in this container) with a deterministic
fake used by tests and the feature-extraction path.

Schema convention for a multimodal table:
    id BIGINT, media BINARY, media_type STRING,
    meta STRUCT<width INT, height INT, duration_ms INT, codec STRING>

Scale notes:
  * media bytes never leave the executor JVM except through Arrow
    batches into the pandas workers (mapInPandas) — no driver collect;
  * batch size is controlled by spark.sql.execution.arrow.maxRecordsPerBatch,
    which matters when rows are MBs: set it so batch_bytes ≈ 64 MB;
  * decode/extract output is a narrow numeric/feature frame — project
    away the binary column as early as possible so downstream stages
    shuffle features, not media.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("media", T.BinaryType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ])),
])

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
])


def decode_image(data: bytes) -> object:
    """Real decode — requires an image library (PIL/opencv), absent here."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; install one and replace this stub")


def decode_audio(data: bytes) -> object:
    raise NotImplementedError(
        "audio decoding requires soundfile/librosa; install one and replace this stub")


def sample_frames(data: bytes, every_ms: int = 1000) -> list[bytes]:
    raise NotImplementedError(
        "video frame sampling requires ffmpeg bindings; install and replace this stub")


def fake_features(data: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real feature extractor: dim doubles
    derived from the sha256 of the payload. Keeps the distributed
    pipeline (schema, batching, joins) fully testable."""
    h = hashlib.sha256(data).digest()
    return [int.from_bytes(h[4 * i: 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(df: DataFrame, use_fake: bool = True) -> DataFrame:
    """media binary -> feature vectors via Arrow-batched mapInPandas.

    The pandas function sees columnar batches; media decode happens
    per-cell inside the batch, feature output is narrow. With a real
    decoder, swap fake_features for decode_*+model inference.
    """
    if not use_fake:
        raise NotImplementedError("real extractors not available in this environment")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "id": pdf["id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["media"].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                "features": pdf["media"].map(
                    lambda b: fake_features(bytes(b)) if b is not None else None),
            })
            yield out

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def synthesize_media_table(spark, documents: DataFrame, media_type: str = "image") -> DataFrame:
    """Build a multimodal fixture from the documents table: the text
    bytes stand in for media payloads with plausible metadata."""
    return documents.select(
        F.col("doc_id").alias("id"),
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.lit(media_type).alias("media_type"),
        F.struct(
            (F.length("text") % 1920).cast("int").alias("width"),
            (F.length("text") % 1080).cast("int").alias("height"),
            (F.length("text") * 40).cast("int").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )
