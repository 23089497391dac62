"""IVF (inverted-file) approximate nearest neighbor over an embedding column.

Complements the sign-LSH buckets (entry.py ANN slices) with the other classic
scale path: a coarse quantizer partitions vectors into K inverted lists; a query
probes only the ``nprobe`` nearest lists and runs exact cosine inside them. The
reference emits the dense vectors this would serve (samples/python/
bge_m3_embedder.py:118-131 — dense embedding output); this engine adds the
distributed index structure over them.

Everything is deterministic so the DuckDB oracle can replay it bit-for-bit:

* seeds: the K vectors at vec_id ∈ {0, s, 2s, …} with s = N // K (no RNG);
* one Lloyd refinement: element-wise mean per cluster, rounded to 6 dp — the
  rounding pins the refined centroids to values both engines agree on exactly,
  so the second assignment (and the probe choice) cannot drift;
* all argmins tie-break on cluster id, top-k ties on vec_id.

Scale shape (10^9+ vectors): K is metadata-sized (√N in practice), so both
assignment passes are broadcast nested-loop joins against a K-row dim — no
shuffle of the big side; the centroid mean is one partial+final hash aggregate
keyed by (cluster, pos) with K·dim groups; the query-time probe scans only
``nprobe/K`` of the corpus through a co-partitioned join on the cluster key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _l2sq(a: Column, b: Column) -> Column:
    """Σ (a_i − b_i)² in float64, sequential fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _argmin_cluster(dists: DataFrame, key: str) -> DataFrame:
    """(key, cluster, dist) → (key, cluster) with the smallest dist (tie: id)."""
    return (
        dists.groupBy(key)
        .agg(F.min(F.struct("dist", "cluster")).alias("m"))
        .select(key, F.col("m.cluster").alias("cluster"))
    )


def ivf_build(embeddings: DataFrame, k_lists: int = 8) -> tuple[DataFrame, DataFrame]:
    """→ (assignments (vec_id, cluster), centroids (cluster, cv: array<double>)).

    Deterministic seeding + one Lloyd refinement (see module docstring).
    """
    n = embeddings.count()
    if n < k_lists:
        raise ValueError(f"need >= {k_lists} vectors, got {n}")
    step = n // k_lists
    seed_ids = [i * step for i in range(k_lists)]
    seeds = (
        embeddings.filter(F.col("vec_id").isin(seed_ids))
        .select(
            (F.col("vec_id") / step).cast("int").alias("cluster"),
            F.col("embedding").alias("sv"),
        )
    )
    d1 = embeddings.crossJoin(F.broadcast(seeds)).select(
        "vec_id", "cluster", _l2sq(F.col("embedding"), F.col("sv")).alias("dist")
    )
    a1 = _argmin_cluster(d1, "vec_id")

    # element-wise mean per cluster; round 6 dp so both engines agree exactly
    cent = (
        a1.join(embeddings, "vec_id")
        .select("cluster", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("cval"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                lambda s: s.getField("cval"),
            ).alias("cv")
        )
    )

    d2 = embeddings.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cluster", _l2sq(F.col("embedding"), F.col("cv")).alias("dist")
    )
    return _argmin_cluster(d2, "vec_id"), cent


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k_lists: int = 8,
    nprobe: int = 2,
    topk: int = 10,
) -> DataFrame:
    """IVF cosine top-k: probe the ``nprobe`` nearest lists, exact cosine inside.

    Returns (vec_id, cos_r) like the other ANN slices.
    """
    assigned, cent = ivf_build(embeddings, k_lists)
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    probes = (
        cent.crossJoin(F.broadcast(q))
        .select("cluster", _l2sq(F.col("qv"), F.col("cv")).alias("dist"))
        .orderBy("dist", "cluster")
        .limit(nprobe)
        .select("cluster")
    )
    cands = (
        assigned.join(F.broadcast(probes), "cluster")
        .join(embeddings, "vec_id")
        .crossJoin(F.broadcast(q))
    )
    scored = cands.select(
        "vec_id",
        (
            _dot(F.col("embedding"), F.col("qv"))
            / (
                F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                * F.sqrt(_dot(F.col("qv"), F.col("qv")))
            )
        ).alias("cos"),
    )
    return (
        scored.orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(topk)
        .select("vec_id", F.round("cos", 5).alias("cos_r"))
    )
