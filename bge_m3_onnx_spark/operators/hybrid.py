"""Hybrid retrieval — reciprocal-rank fusion of lexical and dense rankings.

The reference model's whole point is multi-headed retrieval: one encode() call
returns dense_vecs + lexical_weights + colbert_vecs side by side
(/root/reference/samples/python/bge_m3_embedder.py:100-155), and production use
fuses them. This engine's distributed analogs are the BM25 path (sparse head)
and the ANN cosine path (dense head); RRF (Cormack et al., SIGIR'09) is the
standard score-free fusion:

    rrf(d) = Σ_systems 1 / (k0 + rank_sys(d)),   k0 = 60

Rank-based fusion needs no score calibration between heads — exactly why it is
the default hybrid combiner in Elasticsearch/Vespa/Weaviate.

Scale shape: the inputs are already top-k slices (k rows per system per query),
so fusion is a union + one tiny hash aggregate — milliseconds at any corpus
size. The heavy lifting stays in the upstream retrievers (pushed-In BM25 scan,
bucketed/IVF ANN), which this operator deliberately does not re-run.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RRF_K0 = 60.0


def rrf_fuse(rankings: list[DataFrame], k0: float = RRF_K0, id_col: str = "id") -> DataFrame:
    """Each input: (id_col, rank) with rank 1-based. → (id_col, rrf, n_systems).

    A doc absent from a system simply contributes nothing (the union never
    manufactures rows), matching the standard RRF definition over truncated
    rankings.
    """
    if not rankings:
        raise ValueError("need at least one ranking")
    parts = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col("rank").cast("double"))).alias("contrib"),
        )
        for r in rankings
    ]
    u = reduce(DataFrame.unionByName, parts)
    return u.groupBy(id_col).agg(
        F.sum("contrib").alias("rrf"), F.count("*").cast("int").alias("n_systems")
    )
