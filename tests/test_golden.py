"""Golden-file parity: the Spark engine must reproduce the frozen oracle outputs
byte-for-semantics (docIDs + ranks exact, scores atol 1e-6) — the engine analog of
the reference's cross-implementation golden tests
(/root/reference/samples/dotnet/.../BgeM3EmbeddingComparisonTests.cs:89-103)."""

from __future__ import annotations

import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="goldens not generated"
)


@pytest.fixture(scope="module")
def golden_topk():
    with open(os.path.join(GOLDEN_DIR, "golden_topk.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def golden_postings():
    with open(os.path.join(GOLDEN_DIR, "golden_postings.json")) as f:
        return json.load(f)


def test_engine_matches_golden_topk(spark, tiny_transcripts, query_set, golden_topk):
    from bge_m3_onnx_spark.plans.build_index import build_index
    from bge_m3_onnx_spark.plans.query import run_queries

    idx = build_index(tiny_transcripts)
    assert idx.n_docs == golden_topk["n_docs"]
    assert abs(idx.avgdl - golden_topk["avgdl"]) < 1e-9
    got = {}
    for r in run_queries(spark, idx, query_set, k=golden_topk["k"]).collect():
        got.setdefault(str(r["query_id"]), []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, want in golden_topk["topk"].items():
        have = sorted(got.get(qid, []))
        assert [(x[0], x[1]) for x in have] == [(w["rank"], w["doc_id"]) for w in want], qid
        for (_, _, s), w in zip(have, want):
            assert abs(s - w["score"]) < 1e-6


def test_engine_matches_golden_postings(spark, tiny_transcripts, golden_postings):
    from bge_m3_onnx_spark.plans.build_index import build_index

    idx = build_index(tiny_transcripts)
    got = sorted(
        (r["term"], r["doc_id"], r["tf"]) for r in idx.postings.collect()
    )
    want = sorted((t, d, tf) for t, d, tf in golden_postings["postings"])
    assert got == want
    dl = {r["doc_id"]: r["dl"] for r in idx.docs.collect()}
    assert dl == golden_postings["dl"]
