"""Deduplication family over the documents/transcripts corpus.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join),
SimHash (64-bit), and shingle-set Jaccard verification of LSH candidates. All but
simhash are pure DataFrame ops; simhash uses one Arrow-batched kernel.

Scale notes: every variant is bucket-local — candidate generation joins on
(band_id, band_hash) or simhash prefix, never all-pairs. MinHash minima are md5
hex strings (string min == numeric min on fixed-width hex), which keeps the
whole pipeline JVM-side and portable to the SQL oracle.

Parameterization (r2 — VERDICT r1 found the old 8-hash/unigram defaults emitted
82% of all possible pairs as candidates, a quadratic blowup inside hot buckets):

* **word 5-gram shingles** over the token SEQUENCE, not unigram sets — random
  docs share stopwords but almost never share 5-grams, so bucket collisions
  require real textual overlap;
* **128 hashes, b=16 bands × r=8 rows** — P(candidate) = 1−(1−j^8)^16: ≈0.9998
  at Jaccard 0.9, ≈0.006 at Jaccard 0.3 — a sharp threshold near j≈0.7;
* signatures are computed WITHOUT a 128× row blowup: each (doc, shingle) row
  carries the 128 hashes as independent columns and the signature is 128
  element-wise ``min`` aggregates — one shuffle keyed by doc_id, all JVM-side.
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


DEFAULT_N_HASHES = 128
DEFAULT_ROWS_PER_BAND = 8  # → 16 bands
DEFAULT_SHINGLE_N = 5


def shingles(tokenized: DataFrame, n: int = DEFAULT_SHINGLE_N) -> DataFrame:
    """(doc_id, shingle) distinct — word n-gram shingles over the ORDERED token
    sequence of ``tokenized`` (doc_id, terms: array<string>). Documents shorter
    than n tokens contribute one whole-document shingle (incl. '' for empty)."""
    expr = (
        f"transform(sequence(1, greatest(size(terms) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(terms, i, {n})))"
    )
    return (
        tokenized.select("doc_id", F.explode(F.expr(expr)).alias("shingle"))
        .dropDuplicates(["doc_id", "shingle"])
    )


def minhash_bands(
    tokenized: DataFrame,
    n_hashes: int = DEFAULT_N_HASHES,
    rows_per_band: int = DEFAULT_ROWS_PER_BAND,
    shingle_n: int = DEFAULT_SHINGLE_N,
    hash_family: str = "md5",
) -> DataFrame:
    """(doc_id, band_id, band_hash) from (doc_id, terms: array<string>).

    h_s(doc) = min over shingles of hash(s, shingle); band hash = hash of its
    rows' minima in seed order. The 128 per-seed minima are element-wise agg
    columns — no seed × shingle row blowup (module docstring).

    ``hash_family``:
    * ``"md5"`` — hex-string hashes (string min == numeric min on fixed-width
      hex). Portable to the DuckDB oracle; this is what the correctness slice
      uses. COST: 128 md5 calls per (doc, shingle) row was 557 s of the 670 s
      1M-doc pipeline (DEDUP_SCALE_r03.json) — md5 is a cryptographic digest
      doing far more work than dedup needs.
    * ``"xxhash64"`` — JVM-intrinsic 64-bit hashes, an order of magnitude
      cheaper; seeded per hash function by chaining the seed literal into the
      hash (xxhash64(seed, shingle)), minima taken numerically. The scale path
      (tools/dedup_scale.py asserts cluster-level equality between the two
      families at 1M docs). Both keep the whole pipeline JVM-side.
    """
    assert n_hashes % rows_per_band == 0
    assert hash_family in ("md5", "xxhash64")
    sh = shingles(tokenized, shingle_n)
    if hash_family == "md5":
        hcols = [
            F.md5(F.concat_ws(":", F.lit(str(s)), F.col("shingle"))).alias(f"h{s}")
            for s in range(n_hashes)
        ]
    else:
        hcols = [F.xxhash64(F.lit(s), F.col("shingle")).alias(f"h{s}") for s in range(n_hashes)]
    hashed = sh.select("doc_id", *hcols)
    sig = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{s}").alias(f"h{s}") for s in range(n_hashes)]
    )
    n_bands = n_hashes // rows_per_band

    def _band_hash(b: int):
        row_cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        if hash_family == "md5":
            return F.md5(F.concat_ws("", *row_cols))
        return F.xxhash64(*row_cols).cast("string")

    band_structs = [
        F.struct(
            F.lit(b).cast("int").alias("band_id"),
            _band_hash(b).alias("band_hash"),
        )
        for b in range(n_bands)
    ]
    return (
        sig.select("doc_id", F.explode(F.array(*band_structs)).alias("bb"))
        .select("doc_id", F.col("bb.band_id").alias("band_id"), F.col("bb.band_hash").alias("band_hash"))
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


def simhash_near_pairs(
    sh: DataFrame, prefix_bits: int = 16, n_tables: int = 1
) -> DataFrame:
    """Candidate pairs whose simhash agrees on at least one of ``n_tables``
    disjoint ``prefix_bits``-wide bands, with exact Hamming distance computed
    on every candidate. Still bucket-local — never all-pairs.

    Recall guarantee (pigeonhole): a pair at Hamming distance d differs in d
    bit positions; with T disjoint bands covering T·prefix_bits bits, any pair
    with d < T agrees on ≥1 whole band and IS generated as a candidate. The
    r2 single-table variant (n_tables=1, the oracle slice's parameterization)
    only sees pairs agreeing on the TOP 16 bits — pairs differing inside those
    bits are silently missed (VERDICT r3 #7); n_tables=4 over the full 64-bit
    hash guarantees every pair at Hamming ≤ 3.

    One self-join: docs explode into (table, bucket) keys, the join is EQUI on
    them, duplicates (pairs agreeing on several bands) collapse before the
    bit_count. Filter ``hamming <= T-1`` downstream for the guaranteed regime.
    """
    assert 1 <= n_tables and n_tables * prefix_bits <= 64
    mask = (1 << prefix_bits) - 1
    keys = [
        F.struct(
            F.lit(i).cast("int").alias("tbl"),
            F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits * (i + 1))
            .bitwiseAND(F.lit(mask))
            .alias("bucket"),
        )
        for i in range(n_tables)
    ]
    b = sh.select(
        "doc_id", "simhash", F.explode(F.array(*keys)).alias("k")
    ).select("doc_id", "simhash", F.col("k.tbl").alias("tbl"), F.col("k.bucket").alias("bucket"))
    a1 = b.select("tbl", "bucket", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b1 = b.select("tbl", "bucket", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    return (
        a1.join(b1, ["tbl", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.col("sh_a").bitwiseXOR(F.col("sh_b")).alias("__x"))
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", F.bit_count(F.col("__x")).alias("hamming"))
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 25,
    stats_out: dict | None = None,
) -> DataFrame:
    """Near-dup pairs → clusters: (doc_id, cluster_id) with cluster_id = the
    MINIMUM doc id in each connected component (deterministic canonical
    representative — the doc a dedup pipeline KEEPS).

    Distributed min-label propagation: every node starts labeled with itself;
    each round every node takes the min label in its closed neighborhood; stop
    when no label changed (driver-side count — one tiny metadata job per
    round). Converges in O(component diameter) rounds — near-dup components
    are shallow (duplicates of a common source), so 2-4 rounds in practice;
    ``max_iters`` bounds pathological chains. Each round is two hash joins on
    the (doc, label) relation co-partitioned with the symmetric edge list —
    the classic Spark CC loop (alternating-star variants halve rounds on deep
    graphs; unnecessary at near-dup depth). Persist+unpersist per round keeps
    the lineage O(1) instead of exponential.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .persist()
    )
    labels.count()
    changed = 0
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        neigh_min = (
            edges.join(labels, edges.dst == labels.node)
            .select(F.col("src").alias("node"), "lbl")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("lbl").alias("new_lbl"))
        )
        changed = (
            neigh_min.join(labels, "node")
            .filter(F.col("new_lbl") != F.col("lbl"))
            .count()
        )
        new_labels = neigh_min.select("node", F.col("new_lbl").alias("lbl")).persist()
        new_labels.count()
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if stats_out is not None:
        stats_out["rounds"] = rounds
    if changed != 0:
        # A component deeper than max_iters would otherwise yield silently
        # split clusters (wrong canonical representatives downstream).
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"({changed} labels still changing); raise max_iters — near-dup "
            "graphs this deep usually indicate a degenerate candidate set"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id"))


def drop_near_duplicates(
    docs: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Materialize the dedup decision: keep every unclustered doc plus each
    cluster's canonical representative (doc_id == cluster_id), drop the rest.

    One left join against the (small relative to the corpus) cluster relation;
    docs outside any cluster pass through untouched — so the join is skew-free
    and the output is exactly ``docs`` minus non-canonical near-duplicates.
    """
    c = clusters.select(
        F.col(id_col).alias("__cc_id"), F.col("cluster_id").alias("__cc_lbl")
    )
    return (
        docs.join(c, docs[id_col] == F.col("__cc_id"), "left")
        .filter(F.col("__cc_lbl").isNull() | (F.col("__cc_lbl") == docs[id_col]))
        .drop("__cc_id", "__cc_lbl")
    )
