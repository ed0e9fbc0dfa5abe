"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The decode kernels are STUBBED (this container has no image/audio codecs —
see `decode_image`): they produce deterministic fake features so the
Spark-side plumbing (schema, batching, partitioning, content-hash dedup) is
real and tested. Swapping in PIL/ffmpeg later changes one function body, no
plan shape.

Design for 100 TB of media:
- payloads never leave the JVM→Arrow batch path as Python objects per row;
- metadata (dims, duration, codec) lives in a struct column so filters on
  it prune parquet row groups without touching payload bytes;
- content-hash (xxhash64 of bytes) dedups payloads BEFORE any decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", LongType()),
                    StructField("height", LongType()),
                    StructField("duration_ms", LongType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)


def synth_media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table from the documents testdata: payload =
    UTF-8 bytes of the text (stands in for encoded media), metadata derived
    from content. Lets every downstream op run on real driver testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "UTF-8").cast(BinaryType()).alias("payload"),
        F.struct(
            (F.col("n_chars") % 640 + 1).cast("long").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("long").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def media_content_dedup(media: DataFrame) -> DataFrame:
    """Content-hash dedup BEFORE decode: group identical payloads by
    xxhash64(payload), keep min media_id. Shuffles (hash, id), not bytes."""
    from pyspark.sql import Window

    h = F.xxhash64(F.col("payload"))
    w = Window.partitionBy(h).orderBy(F.col("media_id").asc())
    return (
        media.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def decode_image(payload: bytes) -> np.ndarray:
    """STUB — real impl would be PIL/turbojpeg decode. Raises by contract;
    `fake_decode_features` is the deterministic test double."""
    raise NotImplementedError(
        "image decoding requires codec libraries not present in this "
        "container; use fake_decode_features for plumbing tests"
    )


def fake_decode_features(payload: bytes, n_features: int = 8) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: statistics of the
    payload bytes. Same signature/shape a real extractor would have."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros(n_features)
    return np.array(
        [
            arr.size,
            arr.mean(),
            arr.std(),
            arr.min(),
            arr.max(),
            np.median(arr),
            float(np.sum(arr > 127)) / arr.size,
            float(arr[:16].sum()),
        ][:n_features]
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(media: DataFrame, batch_decoder=fake_decode_features) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, payload column
    dropped on output (decoded features are ~KB where payloads are ~MB —
    never carry both through a shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [batch_decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize kernel (real impl:
    PIL/turbojpeg). Truncates/pads the payload to width·height bytes so the
    output size contract (payload length = target pixel count) is real."""
    target = max(int(width) * int(height), 1)
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size >= target:
        return arr[:target].tobytes()
    return np.pad(arr, (0, target - arr.size)).tobytes()


def resize_images(
    media: DataFrame, width: int, height: int, batch_resizer=fake_resize
) -> DataFrame:
    """mapInPandas image resize: Arrow batches of (id, payload) in, resized
    payload + updated meta out. Only image rows pass through the Python
    stage — the filter happens JVM-side before any byte crosses to Arrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [batch_resizer(p, width, height) for p in pdf["payload"]],
                    "width": np.full(len(pdf), width, dtype=np.int64),
                    "height": np.full(len(pdf), height, dtype=np.int64),
                }
            )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
        ]
    )
    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "kind", "payload")
        .mapInPandas(run, out_schema)
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (explode over the sample grid from metadata). Decode of each frame is
    the stubbed kernel; the row multiplication & partitioning are real."""
    # floor (not cast) — engine-portable truncation semantics
    n_frames = F.floor(F.col("meta.duration_ms") / every_ms)
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )
