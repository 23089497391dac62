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
