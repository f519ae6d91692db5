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


# -- resize ------------------------------------------------------------------

def fake_resize(data: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resize: payload truncated/cycled
    to a size proportional to the target raster. Replace with
    decode_image + PIL resize + re-encode in production."""
    target = max(1, (width * height) // 100)
    if not data:
        data = b"\x00"
    reps = (target // len(data)) + 1
    return (data * reps)[:target]


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """Distributed media resize: mapInPandas batch pipeline that rewrites
    the media payload and patches meta.width/height. Output keeps the
    MEDIA_SCHEMA convention so resize composes with extract_features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pd.DataFrame({
                "width": [width] * len(pdf), "height": [height] * len(pdf),
                "duration_ms": [m["duration_ms"] if m else None for m in pdf["meta"]],
                "codec": [m["codec"] if m else None for m in pdf["meta"]],
            })
            yield pd.DataFrame({
                "id": pdf["id"],
                "media": pdf["media"].map(
                    lambda b: fake_resize(bytes(b), width, height)
                    if b is not None else None),
                "media_type": pdf["media_type"],
                "meta": meta.to_dict("records"),
            })

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


# -- frame sampling ----------------------------------------------------------

FRAME_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_ms", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def fake_frame(data: bytes, idx: int, n_frames: int) -> bytes:
    """Deterministic frame stand-in: the idx-th of n equal payload slices."""
    if not data:
        return b""
    step = max(1, len(data) // max(n_frames, 1))
    return data[idx * step:(idx + 1) * step] or data[-step:]


def sample_media_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """One row per sampled frame: the 1->N mapInPandas shape for video.

    Frame count comes from meta.duration_ms / every_ms; output is
    (id, frame_idx, ts_ms, frame) — the binary column is per-frame, so
    downstream per-frame feature extraction parallelizes past the
    per-video row boundary. Swap fake_frame for ffmpeg seeking in
    production (sample_frames stub above)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column-wise zip, not iterrows: iterrows builds a Series
            # per row (by far the slowest pandas iteration form); the
            # 1->N explode itself is per-cell work either way
            ids, idxs, tss, frames = [], [], [], []
            for rid, media, meta in zip(pdf["id"], pdf["media"], pdf["meta"]):
                duration = (meta["duration_ms"] or 0) if meta else 0
                n = max(1, duration // every_ms)
                data = bytes(media) if media is not None else b""
                ids.extend([rid] * n)
                idxs.extend(range(n))
                tss.extend(range(0, n * every_ms, every_ms))
                frames.extend(fake_frame(data, i, n) for i in range(n))
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames})

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
