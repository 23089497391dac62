"""Multimodal columns: binary payloads + typed metadata, Arrow-batched kernels.

Images/audio/video ride through the engine as opaque ``binary`` columns with a
typed metadata struct. The Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested; the actual media decode is
STUBBED (this container has no image/audio libraries): ``decode_image`` raises
NotImplementedError unless ``deterministic_fake=True``, in which case a
hash-derived fake feature vector is produced so the distributed pipeline can be
exercised end-to-end.

At 100 TB: binary payloads dominate row size, so ``spark.sql.files.maxPartitionBytes``
and ``maxRecordsPerBatch`` govern memory; the feature-extract step is mapInPandas
(streaming batches, never a whole partition in memory), and outputs are narrow
(doc_id + fixed-size vector) so downstream shuffles shed the payload immediately —
project the binary away BEFORE any wide transform.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("payload", StructType().add("bytes", "binary"), True),
    ]
)

FEATURE_DIM = 64

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def decode_image(payload: bytes, *, deterministic_fake: bool = False) -> np.ndarray:
    """STUB: real decode needs PIL/libjpeg (not in this container).

    With deterministic_fake=True, returns a hash-derived FEATURE_DIM vector —
    stable across runs/partitions, so tests can assert distributed-vs-local parity.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this container; "
            "run with deterministic_fake=True to exercise the pipeline"
        )
    h = hashlib.sha256(payload or b"").digest()
    seed = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    reps = int(np.ceil(FEATURE_DIM / seed.size))
    vec = np.tile(seed, reps)[:FEATURE_DIM]
    return (vec - 127.5) / 127.5


def extract_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """binary payload → fixed-size feature vector, streamed via mapInPandas.

    The narrow output schema means the heavy binary column never reaches a shuffle.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image(
                    bytes(p["bytes"]) if p is not None and p["bytes"] is not None else b"",
                    deterministic_fake=deterministic_fake,
                ).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(kernel, FEATURES_SCHEMA)


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table (payload = repeated hash bytes)."""
    df = spark.range(n)
    return df.select(
        F.concat(F.lit("m-"), F.col("id").cast("string")).alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        (F.col("id") * 1000).cast("long").alias("duration_ms"),
        F.struct(F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("bytes")).alias(
            "payload"
        ),
    )


def decode_image_2d(
    payload: bytes, width: int, height: int, *, deterministic_fake: bool = False
) -> np.ndarray:
    """STUB decode to a (height, width) grayscale array. Same discipline as
    :func:`decode_image`: raises without deterministic_fake; the fake is a
    hash-tiled array so resize math is exercised on real ndarray shapes."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this container; "
            "run with deterministic_fake=True to exercise the pipeline"
        )
    h = hashlib.sha256(payload or b"").digest()
    seed = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    n = int(width) * int(height)
    reps = int(np.ceil(n / seed.size))
    return np.tile(seed, reps)[:n].reshape(int(height), int(width))


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize — REAL numpy logic (index-map sampling), no
    imaging library needed; runs identically on the fake-decoded arrays."""
    in_h, in_w = img.shape
    rows = (np.arange(out_h) * in_h // out_h).clip(0, in_h - 1)
    cols = (np.arange(out_w) * in_w // out_w).clip(0, in_w - 1)
    return img[np.ix_(rows, cols)]


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("out_h", IntegerType(), False),
        StructField("out_w", IntegerType(), False),
        StructField("pixels", ArrayType(FloatType()), False),  # row-major out_h*out_w
    ]
)


def resize_images(
    media: DataFrame, out_h: int = 16, out_w: int = 16, deterministic_fake: bool = True
) -> DataFrame:
    """Image rows → resized pixel grids, streamed via mapInPandas. Output is
    narrow (out_h*out_w floats) — the binary payload is projected away before
    anything wide happens downstream."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                p = r["payload"]
                raw = bytes(p["bytes"]) if p is not None and p["bytes"] is not None else b""
                img = decode_image_2d(
                    raw, r["width"] or 1, r["height"] or 1, deterministic_fake=deterministic_fake
                )
                out.append(resize_image(img, out_h, out_w).reshape(-1).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_h": out_h,
                    "out_w": out_w,
                    "pixels": out,
                }
            )

    return media.filter(F.col("kind") == "image").select(
        "media_id", "width", "height", "payload"
    ).mapInPandas(kernel, RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("t_ms", LongType(), False),
        StructField("frame_key", StringType(), False),  # deterministic handle for the decode stub
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 32) -> DataFrame:
    """Video rows → one row per sampled timestamp (0, every_ms, 2·every_ms, …).

    The fan-out is PURE Spark (sequence + explode — no Python), bounded by
    ``max_frames`` so a pathological duration cannot explode a partition; the
    per-frame payload decode stays a downstream stubbed kernel keyed by
    ``frame_key`` (sha256(media_id:t_ms) — deterministic, join-stable). At
    100 TB the video binary itself is never replicated per frame: frames carry
    only (media_id, t_ms) until a decode kernel needs the bytes.
    """
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    n_frames = F.least(
        (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int") + 1,
        F.lit(int(max_frames)),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .select(
            "media_id",
            F.col("frame_idx").cast("int"),
            (F.col("frame_idx").cast("long") * every_ms).alias("t_ms"),
            F.sha2(
                F.concat_ws(":", "media_id", (F.col("frame_idx").cast("long") * every_ms)), 256
            ).alias("frame_key"),
        )
    )
