"""Deduplication family over the documents/transcripts corpus.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join),
SimHash (64-bit), and token-set Jaccard verification of LSH candidates. All but
simhash are pure DataFrame ops; simhash uses one Arrow-batched kernel.

Scale notes: every variant is bucket-local — candidate generation joins on
(band_id, band_hash) or simhash prefix, never all-pairs. MinHash minima are md5
hex strings (string min == numeric min on fixed-width hex), which keeps the
whole pipeline JVM-side and portable to the SQL oracle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(text_hash, canonical_doc_id, dup_count) — canonical = min id per hash."""
    norm = F.md5(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return (
        df.select(norm.alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("canonical_doc_id"), F.count("*").alias("dup_count"))
    )


def minhash_bands(
    doc_terms: DataFrame, n_hashes: int = 8, rows_per_band: int = 2
) -> DataFrame:
    """(doc_id, band_id, band_hash) from a distinct (doc_id, term) relation."""
    spark = doc_terms.sparkSession
    seeds = spark.range(n_hashes).select(F.col("id").cast("int").alias("seed"))
    sig = (
        doc_terms.dropDuplicates(["doc_id", "term"])
        .crossJoin(F.broadcast(seeds))
        .select(
            "doc_id",
            "seed",
            F.md5(F.concat_ws(":", F.col("seed").cast("string"), F.col("term"))).alias("h"),
        )
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("mh"))
    )
    return (
        sig.withColumn("band_id", F.floor(F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band_id")
        .agg(
            F.md5(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("seed", "mh"))),
                        lambda x: x["mh"],
                    ),
                )
            ).alias("band_hash")
        )
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """(doc_a, doc_b) sharing any band bucket, a < b. Bucket-local self-join."""
    a = bands.select("band_id", "band_hash", F.col("doc_id").alias("doc_a"))
    b = bands.select("band_id", "band_hash", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )


def jaccard_verify(
    doc_terms: DataFrame, pairs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Exact token-set Jaccard over candidate pairs; keep >= threshold."""
    toks = doc_terms.dropDuplicates(["doc_id", "term"])
    ta = toks.select(F.col("doc_id").alias("doc_a"), "term")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "term")
    inter = (
        pairs.join(ta, "doc_a")
        .join(tb, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_terms"))
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_terms").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_terms").alias("sz_b")), "doc_b")
        .withColumn(
            "jaccard_r",
            F.round(F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 5),
        )
        .filter(F.col("jaccard_r") >= threshold)
        .select("doc_a", "doc_b", "jaccard_r")
    )


SIMHASH_SCHEMA = StructType(
    [StructField("doc_id", StringType(), False), StructField("simhash", LongType(), False)]
)


def simhash_py(terms: list[str]) -> int:
    """64-bit SimHash of a token list (pure function shared with tests)."""
    import hashlib

    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for t in terms:
        h = np.uint64(int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big"))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
    return out - (1 << 64) if out >= (1 << 63) else out  # to signed int64


def simhash(tokenized: DataFrame) -> DataFrame:
    """(doc_id, simhash) from (doc_id, terms:array<string>), Arrow-batched."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "simhash": [simhash_py(list(ts)) for ts in pdf["terms"]],
                }
            )

    return tokenized.select("doc_id", "terms").mapInPandas(kernel, SIMHASH_SCHEMA)


def simhash_near_pairs(sh: DataFrame, prefix_bits: int = 16) -> DataFrame:
    """Candidate pairs whose simhash agrees on the top ``prefix_bits`` — the
    bucketed (scale) path; exact Hamming verification can follow on candidates."""
    shift = 64 - prefix_bits
    b = sh.withColumn("bucket", F.shiftrightunsigned(F.col("simhash"), shift))
    a1 = b.select("bucket", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b1 = b.select("bucket", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    return (
        a1.join(b1, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))),
        )
        .select("doc_a", "doc_b", "hamming")
    )
