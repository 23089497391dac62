"""Hybrid RRF fusion and ColBERT maxsim — semantic contracts.

RRF: hand-computable fixture (the formula is 1/(60+rank) summed per system).
maxsim: brute-force numpy replica on small random-ish vectors; self-query must
rank itself first with score == n_query_tokens (cos(v,v)=1 per token)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from bge_m3_onnx_spark.operators.colbert import l2_normalize, maxsim_topk, to_multivec
from bge_m3_onnx_spark.operators.hybrid import rrf_fuse


def test_rrf_hand_computed(spark):
    sys_a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "id long, rank int")
    sys_b = spark.createDataFrame([(20, 1), (40, 2)], "id long, rank int")
    got = {r["id"]: (round(r["rrf"], 10), r["n_systems"]) for r in rrf_fuse([sys_a, sys_b]).collect()}
    assert got == {
        10: (round(1 / 61, 10), 1),
        20: (round(1 / 62 + 1 / 61, 10), 2),
        30: (round(1 / 63, 10), 1),
        40: (round(1 / 62, 10), 1),
    }
    # doc present in both systems outranks single-system docs here
    assert got[20][0] > max(got[10][0], got[30][0], got[40][0])


def test_maxsim_matches_numpy_and_self_query_wins(spark):
    import numpy as np

    rng = [
        [((i * 37 + j * 11 + 5) % 17) - 8.0 for j in range(12)] for i in range(6)
    ]  # 6 vecs × 12 floats → 3 tokens × 4 dims
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)], "vec_id long, embedding array<double>"
    )
    docs = df.select("vec_id", l2_normalize(to_multivec(F.col("embedding"), 3, 4)).alias("mv"))
    query = df.filter("vec_id = 2").select(
        l2_normalize(to_multivec(F.col("embedding"), 3, 4)).alias("qmv")
    )
    got = {r["vec_id"]: r["maxsim"] for r in maxsim_topk(docs, query, k=6).collect()}

    def norm_rows(m):
        m = np.array(m, dtype=float).reshape(3, 4)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    q = norm_rows(rng[2])
    for i, v in enumerate(rng):
        d = norm_rows(v)
        want = float(sum((q @ d.T).max(axis=1)))
        assert math.isclose(got[i], want, rel_tol=1e-9), (i, got[i], want)
    # self-query: every token matches itself at cos=1
    assert math.isclose(got[2], 3.0, rel_tol=1e-12)
    top = maxsim_topk(docs, query, k=1).collect()[0]
    assert top["vec_id"] == 2

    # candidate-bounded rerank (the only valid mode at scale): restricting to a
    # candidate slice must reproduce the full-scan scores on exactly that slice
    # — and never surface a non-candidate, even the otherwise-best doc.
    cands = df.filter("vec_id in (0, 1, 4)").select("vec_id")
    bounded = {
        r["vec_id"]: r["maxsim"]
        for r in maxsim_topk(docs, query, k=6, candidates=cands).collect()
    }
    assert set(bounded) == {0, 1, 4}
    for i in (0, 1, 4):
        assert math.isclose(bounded[i], got[i], rel_tol=1e-12)
