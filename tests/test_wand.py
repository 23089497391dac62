"""WAND path must be rank-identical AND score-equal to the exact path on every
fixture query — block-max pruning is lossless (SURVEY.md §4.2)."""

from __future__ import annotations

import pytest

from bge_m3_onnx_spark.plans.build_index import build_index
from bge_m3_onnx_spark.plans.query import run_queries
from bge_m3_onnx_spark.plans.wand import run_queries_wand


@pytest.fixture(scope="module")
def built(spark, tiny_transcripts):
    return build_index(tiny_transcripts, with_blocks=True)


def _collect(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    return {q: sorted(v) for q, v in out.items()}


def test_wand_matches_exact(spark, built, query_set):
    # force_wand: the fixture corpus is far below the routing threshold, and this
    # test exists to prove the PRUNING machinery lossless, not the router.
    k = 10
    exact = _collect(run_queries(spark, built, query_set, k=k))
    wand = _collect(run_queries_wand(spark, built, query_set, k=k, force_wand=True))
    assert set(exact) == set(wand)
    for qid in exact:
        e, w = exact[qid], wand[qid]
        assert [(r, d) for r, d, _ in e] == [(r, d) for r, d, _ in w], f"query {qid}"
        for (_, _, se), (_, _, sw) in zip(e, w):
            assert abs(se - sw) < 1e-9


def test_wand_matches_exact_small_k(spark, built, query_set):
    # k=1 → aggressive θ → heaviest pruning; still must be identical
    subset = {q: query_set[q] for q in (1, 3, 9, 11)}
    exact = _collect(run_queries(spark, built, subset, k=1))
    wand = _collect(run_queries_wand(spark, built, subset, k=1, force_wand=True))
    assert set(exact) == set(wand)
    for qid in exact:
        assert [(r, d) for r, d, _ in exact[qid]] == [(r, d) for r, d, _ in wand[qid]]


def test_wand_stats_report_pruning(spark, built, query_set):
    """stats_out fills deterministic block counts; the pruning invariants hold
    (surviving ≤ total; rescored ≤ total) and routing is reported."""
    stats: dict = {}
    res = run_queries_wand(
        spark, built, {1: query_set[1]}, k=1, force_wand=True, stats_out=stats
    )
    res.collect()
    assert stats["routed"] is False
    assert 0 < stats["blocks_surviving"] <= stats["blocks_total"]
    # phase 3 never re-decodes what phase 2 already decoded
    assert 0 <= stats["blocks_extra_decoded"] <= stats["blocks_total"] - stats["blocks_surviving"]
    routed: dict = {}
    run_queries_wand(spark, built, {1: query_set[1]}, k=1, stats_out=routed).collect()
    assert routed["routed"] is True


def test_wand_actually_prunes_on_skewed_corpus(spark):
    """On a corpus with realistic score variance (spiky tf, varied dl) the
    segment bound must skip most blocks for a hot single-term query — AND stay
    lossless. The flat fixture corpus can't discriminate (every block max == θ),
    which is exactly why this fixture exists."""
    from bge_m3_onnx_spark.sources.transcripts import synth_transcripts_skewed

    idx = build_index(
        synth_transcripts_skewed(spark, n_convs=2000, turns_per_conv=10), with_blocks=True
    )
    stats: dict = {}
    wand = _collect(
        run_queries_wand(spark, idx, {1: "the"}, k=10, force_wand=True, stats_out=stats)
    )
    exact = _collect(run_queries(spark, idx, {1: "the"}, k=10))
    assert [(r, d) for r, d, _ in wand[1]] == [(r, d) for r, d, _ in exact[1]]
    for (_, _, sw), (_, _, se) in zip(wand[1], exact[1]):
        assert abs(sw - se) < 1e-9
    assert stats["blocks_surviving"] + stats["blocks_extra_decoded"] < 0.25 * stats["blocks_total"], stats


def test_wand_routes_small_queries_to_exact(spark, built, query_set):
    # Σ df of the fixture queries is tiny → the default path must route to the
    # one-job exact plan and still return identical results.
    import dataclasses

    assert built.cfg.wand_route_min_postings > 0
    subset = {q: query_set[q] for q in (1, 3)}
    routed = _collect(run_queries_wand(spark, built, subset, k=5))
    exact = _collect(run_queries(spark, built, subset, k=5))
    assert routed == exact
    # and with both routing gates open the machinery path runs — same results.
    cfg0 = dataclasses.replace(
        built.cfg, wand_route_min_postings=0, wand_route_max_residual_frac=1.0
    )
    machinery = _collect(run_queries_wand(spark, built, subset, k=5, cfg=cfg0))
    assert [(r, d) for v in machinery.values() for r, d, _ in v] == [
        (r, d) for v in exact.values() for r, d, _ in v
    ]


def test_wand_routes_unprunable_shapes_to_exact(spark, built, query_set):
    """Residual-df gate (WAND_CAL_r04): a multi-hot-term query keeps most
    blocks above θ at every corpus size, so even above the Σdf threshold the
    router must send it to the exact plan; a concentrated (single-hot-term)
    query with the same Σdf stays on the WAND path."""
    import dataclasses

    cfg0 = dataclasses.replace(built.cfg, wand_route_min_postings=0)
    stats: dict = {}
    # fixture query 2 is multi-term over a tiny corpus — every term carries
    # comparable df, residual ≫ 5% → routed (exact) despite min_postings=0.
    res = run_queries_wand(spark, built, {1: query_set[2]}, k=5, cfg=cfg0, stats_out=stats)
    res.collect()
    assert stats["routed"] is True
    # a single-term query has residual 0 → prunable → machinery runs.
    stats2: dict = {}
    res2 = run_queries_wand(spark, built, {1: "the"}, k=5, cfg=cfg0, stats_out=stats2)
    res2.collect()
    assert stats2["routed"] is False


def test_wand_scores_bit_identical_to_exact(spark):
    """Rank-identity must not hang on IEEE summation order: both paths use the
    term-sorted deterministic fold (operators/bm25.py:sum_scores_deterministic)
    and the same Spark-side idf expression, so scores are BIT-identical — no
    rounding in this comparison. (Regression: at 10M docs a 1-ulp sum-order
    difference flipped tied top-k membership between the paths.)"""
    from bge_m3_onnx_spark.plans.build_index import build_index
    from bge_m3_onnx_spark.plans.query import run_queries
    from bge_m3_onnx_spark.plans.wand import run_queries_wand
    from bge_m3_onnx_spark.sources.transcripts import synth_transcripts

    idx = build_index(
        synth_transcripts(spark, n_convs=120, turns_per_conv=5),
        with_ordinals=True,
        with_blocks=True,
    )
    q = {1: "spark shuffle partition", 2: "the", 3: "index varbyte"}
    e = run_queries(spark, idx, q, k=10).collect()
    w = run_queries_wand(spark, idx, q, k=10, force_wand=True).collect()
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], r["score"])  # noqa: E731
    assert sorted(map(key, e)) == sorted(map(key, w))  # exact floats, no round


def test_wand_one_doc_attains_every_term_max(spark):
    """ADVICE r3: if one doc attains EVERY query term's max score, θ (k=1)
    equals Σ tmax exactly, and a 1-ulp divergence between the driver's
    ascending Python sum and Spark's deterministic fold could classify every
    term non-essential → no candidate source → silent empty result. The
    MaxScore guard keeps ≥1 essential term, so the top-1 must come back and
    match the exact path."""
    import datetime as _dt

    ts = _dt.datetime(2026, 1, 1)
    rows = [
        # conv-a:0 — shortest doc containing BOTH terms → attains both maxima
        ("conv-a", 0, "user", "alpha beta", None, ts),
        # longer docs with the same tf → strictly lower per-term scores
        ("conv-b", 0, "user", "alpha filler filler filler", None, ts),
        ("conv-c", 0, "user", "beta filler filler filler", None, ts),
        ("conv-d", 0, "user", "filler filler filler filler", None, ts),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    idx = build_index(t, with_blocks=True)
    q = {1: "alpha beta"}
    exact = _collect(run_queries(spark, idx, q, k=1))
    wand = _collect(run_queries_wand(spark, idx, q, k=1, force_wand=True))
    assert wand == exact
    assert wand[1][0][1] == "conv-a:0"
