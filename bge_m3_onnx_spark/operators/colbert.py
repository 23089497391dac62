"""ColBERT-style late interaction — maxsim scoring over multi-vector columns.

The reference's third output head is colbert_vecs: one L2-normalized vector per
non-pad token (/root/reference/samples/python/bge_m3_embedder.py:145-149,
M3Embedder.cs:221-244). Retrieval with that head is late interaction (Khattab &
Zaharia, ColBERT, SIGIR'20):

    maxsim(q, d) = Σ_{i ∈ q tokens}  max_{j ∈ d tokens}  cos(q_i, d_j)

This module gives the distributed operator over a multi-vector column
``array<array<double>>``. The sandbox testdata carries single flat embeddings
(embeddings.parquet: 64-float vectors), so the entry slice derives a
deterministic multi-vector view by reshaping 64 = 8 tokens × 8 dims — an
honest, documented stand-in with the same schema/operator shape real per-token
embeddings would have (the decode stub discipline of operators/multimodal.py).

Scale shape (10^12 docs × ~10² tokens):
* scoring is per-row array algebra (nested higher-order functions: aggregate ∘
  transform ∘ zip_with) — whole rows never explode into (token × token) tuples,
  so the shuffle-free map stage streams at full Tungsten speed.
* the query multi-vector is a 1-row broadcast; top-k is TakeOrderedAndProject.
* at real scale maxsim is the RERANK stage: run it over the candidate slice an
  ANN/BM25 head returns (10³-10⁴ docs), never the full corpus — compose with
  operators/hybrid.py by fusing or chaining.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_multivec(col: Column, n_tokens: int, dim: int) -> Column:
    """Reshape a flat array<numeric>[n_tokens*dim] into array<array<double>>
    (row-major). Deterministic, pure expression."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_tokens - 1)),
        lambda i: F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: F.element_at(col, (i * dim + j).cast("int")).cast("double"),
        ),
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_normalize(mv: Column) -> Column:
    """Normalize each token vector to unit L2 (reference does this per token —
    bge_m3_embedder.py:145-149). Zero vectors pass through unchanged."""
    return F.transform(
        mv,
        lambda v: F.when(_dot(v, v) > 0.0, F.transform(v, lambda x: x / F.sqrt(_dot(v, v)))).otherwise(v),
    )


def maxsim(q_mv: Column, d_mv: Column) -> Column:
    """Σ over query tokens of the max dot product against any doc token.
    Inputs are assumed per-token L2-normalized (dot == cosine)."""
    return F.aggregate(
        q_mv,
        F.lit(0.0),
        lambda acc, qv: acc + F.array_max(F.transform(d_mv, lambda dv: _dot(qv, dv))),
    )


def maxsim_topk(
    docs: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    mv_col: str = "mv",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """docs (id_col, mv_col: array<array<double>>) × query (1 row, qmv) →
    top-k (id_col, maxsim) by score DESC, id ASC. Query side is broadcast;
    the plan is a map + TakeOrderedAndProject — no shuffle of the doc relation.

    ``candidates`` (a 1-column DataFrame of ``id_col`` values, e.g. a BM25/ANN
    head's top-N) bounds the scan: maxsim is a RERANKER, and at 10^12-doc scale
    it must only ever run over a candidate slice — the semi-join prunes the doc
    relation before any array algebra runs. Full-scan mode (candidates=None) is
    for fixtures/small corpora only."""
    if candidates is not None:
        docs = docs.join(F.broadcast(candidates.select(id_col)), id_col, "left_semi")
    scored = docs.crossJoin(F.broadcast(query)).select(
        id_col, maxsim(F.col("qmv"), F.col(mv_col)).alias("maxsim")
    )
    return scored.orderBy(F.desc("maxsim"), F.asc(id_col)).limit(k)
