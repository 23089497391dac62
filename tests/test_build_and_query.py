"""Milestone-1 gate: the Spark engine is rank-identical (docIDs) and score-equal
(atol 1e-6, float64) to the pure-Python oracle on the reference-style query set —
the engine analog of the reference's differential tests
(/root/reference/samples/python/bge_m3_tests.py:107-129, thresholds at :117,:157)."""

from __future__ import annotations

import pytest

from bge_m3_onnx_spark.plans.build_index import build_index
from bge_m3_onnx_spark.plans.query import run_queries
from tests.oracle import oracle_from_rows

ATOL = 1e-6


@pytest.fixture(scope="module")
def built(spark, small_transcripts):
    idx = build_index(small_transcripts)
    rows = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in small_transcripts.select("conv_id", "turn_idx", "text").collect()
    ]
    oracle = oracle_from_rows(rows)
    return idx, oracle


def test_corpus_stats_match(built):
    idx, oracle = built
    assert idx.n_docs == oracle.n_docs
    assert abs(idx.avgdl - oracle.avgdl) < 1e-9


def test_postings_match_oracle_sample(built):
    idx, oracle = built
    got = {
        (r["term"], r["doc_id"]): (r["tf"], r["dl"])
        for r in idx.postings.collect()
    }
    want = {
        (term, doc): (tf, oracle.dl[doc])
        for term, plist in oracle.postings.items()
        for doc, tf in plist.items()
    }
    assert got == want


def test_doc_count_invariant(built, small_transcripts):
    idx, oracle = built
    # every (conv_id, turn_idx) row, including empty-text turns, is a document
    assert idx.n_docs == small_transcripts.count()


def test_topk_rank_identical_and_score_equal(spark, built, query_set):
    idx, oracle = built
    k = 10
    got = run_queries(spark, idx, query_set, k=k)
    by_query: dict[int, list] = {}
    for r in got.collect():
        by_query.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, qtext in query_set.items():
        want = oracle.topk(qtext, k)
        have = sorted(by_query.get(qid, []))
        assert [(r, d) for r, d, _ in have] == [(r, d) for r, d, _ in want], (
            f"rank mismatch for query {qid!r}: {qtext!r}\n got={have}\nwant={want}"
        )
        for (_, _, s_got), (_, _, s_want) in zip(have, want):
            assert abs(s_got - s_want) < ATOL


def test_single_query_fast_path_equals_windowed_topk(spark, built, query_set):
    """run_queries takes the TakeOrdered fast path for one query — results must
    equal the oracle exactly, including ranks (same tiebreak: score DESC, doc_id
    ASC)."""
    idx, oracle = built
    for qid in (1, 3, 9):
        got = sorted(
            (r["rank"], r["doc_id"], r["score"])
            for r in run_queries(spark, idx, {qid: query_set[qid]}, k=10).collect()
        )
        want = oracle.topk(query_set[qid], 10)
        assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want]
        for (_, _, sg), (_, _, sw) in zip(got, want):
            assert abs(sg - sw) < ATOL


def test_conjunctive_matches_python_oracle(spark, built, query_set):
    """AND semantics: exactly the docs holding EVERY query term, scored like the
    disjunctive path, ranked identically to a filtered oracle."""
    idx, oracle = built
    from bge_m3_onnx_spark.functions.tokenizer import tokenize_text

    for qid, qtext in query_set.items():
        terms = set(tokenize_text(qtext))
        got = [
            (r["doc_id"], r["score"])
            for r in run_queries(spark, idx, {qid: qtext}, k=10, conjunctive=True)
            .orderBy("rank")
            .collect()
        ]
        want_docs = {
            d
            for d, s in oracle.score(qtext).items()
            if all(d in oracle.postings.get(t, {}) for t in terms)
        }
        want = sorted(
            ((d, oracle.score(qtext)[d]) for d in want_docs),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        assert [d for d, _ in got] == [d for d, _ in want], qtext
        for (dg, sg), (_, sw) in zip(got, want):
            assert abs(sg - sw) < ATOL


def test_conjunctive_with_absent_term_is_empty(spark, built):
    idx, _ = built
    # 'the' matches many docs disjunctively; the absent term must zero it out
    got = run_queries(spark, idx, {7: "the qqqxyzzy"}, k=10, conjunctive=True)
    assert got.count() == 0


def test_absent_term_returns_empty(spark, built):
    idx, _ = built
    got = run_queries(spark, idx, {99: "zzz-not-in-corpus qqqxyzzy"}, k=10)
    assert got.count() == 0


def test_per_turn_text_equality_under_stable_ordering(spark, small_transcripts):
    """input_hint invariant: per-turn text equality preserved under stable
    (conv_id, turn_idx) ordering."""
    rows = small_transcripts.orderBy("conv_id", "turn_idx").collect()
    again = small_transcripts.orderBy("conv_id", "turn_idx").collect()
    assert [(r["conv_id"], r["turn_idx"], r["text"]) for r in rows] == [
        (r["conv_id"], r["turn_idx"], r["text"]) for r in again
    ]
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert len(keys) == len(set(keys))  # docID uniqueness


def test_edge_corpora_and_queries(spark):
    """Empty corpus builds and answers queries with 0 rows; non-ASCII and
    symbol-only queries match nothing (tokenizer strips them); matching is
    case-insensitive."""
    from bge_m3_onnx_spark.plans.build_index import build_index
    from bge_m3_onnx_spark.plans.query import run_queries
    from bge_m3_onnx_spark.sources.transcripts import TRANSCRIPTS_SCHEMA, synth_transcripts

    empty = spark.createDataFrame([], TRANSCRIPTS_SCHEMA)
    idx = build_index(empty)
    assert idx.n_docs == 0 and idx.avgdl == 0.0
    assert run_queries(spark, idx, {1: "spark"}, k=5).count() == 0

    idx2 = build_index(synth_transcripts(spark, 40, 5))
    assert run_queries(spark, idx2, {1: "中文 Русский"}, k=5).count() == 0
    assert run_queries(spark, idx2, {1: "!@#$%"}, k=5).count() == 0
    upper = run_queries(spark, idx2, {1: "SPARK sHuFfLe"}, k=5).collect()
    lower = run_queries(spark, idx2, {1: "spark shuffle"}, k=5).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in upper] == [
        (r["doc_id"], round(r["score"], 9)) for r in lower
    ]
