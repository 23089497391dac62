"""Round-2 search-surface operators: proximity, prefix expansion, recency,
more-like-this. Each test pins the semantic contract the oracle slice relies on
(the DuckDB cross-check in tools/check_oracles.py is the value-level gate)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bge_m3_onnx_spark.operators.positional import positional_postings, proximity_match
from bge_m3_onnx_spark.operators.wildcard import expand_prefix

DOCS = [
    # doc_id, text-as-token-list
    ("d1", ["big", "data", "scan"]),          # big->scan at dist 2
    ("d2", ["big", "scan"]),                  # dist 1
    ("d3", ["scan", "big"]),                  # wrong order only
    ("d4", ["big", "x", "x", "x", "x", "scan"]),  # dist 5 > slop 4
    ("d5", ["big", "big", "scan", "big", "x", "scan"]),  # multiple anchors
    ("d6", ["other", "terms"]),
]


def _positional(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, terms array<string>")
    return positional_postings(df)


def brute_prox(terms: list[str], a: str, b: str, slop: int) -> int:
    return sum(
        1
        for i, t in enumerate(terms)
        if t == a and any(terms[j] == b for j in range(i + 1, min(i + slop, len(terms) - 1) + 1))
    )


def test_proximity_matches_bruteforce(spark):
    got = {r["doc_id"]: r["n_prox"] for r in proximity_match(_positional(spark), "big", "scan", 4).collect()}
    want = {d: brute_prox(t, "big", "scan", 4) for d, t in DOCS}
    want = {d: n for d, n in want.items() if n > 0}
    assert got == want
    assert "d3" not in got  # ordered: b must FOLLOW a
    assert "d4" not in got  # outside the slop window


def test_proximity_slop1_is_adjacent_phrase(spark):
    got = {r["doc_id"]: r["n_prox"] for r in proximity_match(_positional(spark), "big", "scan", 1).collect()}
    assert got == {"d2": 1, "d5": 1}


def test_expand_prefix_cap_is_deterministic(spark):
    terms = spark.createDataFrame(
        [("spark", 10), ("sparse", 10), ("spam", 3), ("scan", 99), ("table", 50)],
        "term string, df long",
    )
    rows = expand_prefix(terms, "sp", query_id=7, max_expansions=2).collect()
    # df DESC then term ASC: spark/sparse tie on df -> term order; spam dropped by cap
    assert [(r["query_id"], r["term"], r["df"]) for r in rows] == [
        (7, "spark", 10),
        (7, "sparse", 10),
    ]


def test_expand_prefix_rejects_empty(spark):
    terms = spark.createDataFrame([("a", 1)], "term string, df long")
    try:
        expand_prefix(terms, "")
        assert False, "empty prefix must raise"
    except ValueError:
        pass


def test_recency_and_mlt_slices_shape(spark):
    """Slice-level invariants at sf0.001: recency re-ranks but never invents
    docs (boosted top-k ⊆ unboosted candidates), and MLT never returns its
    seed doc."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    qs = e.queries()
    rec = qs["recency_topk"](spark, sf).collect()
    assert 0 < len(rec) <= 10
    assert [r["rank"] for r in rec] == list(range(1, len(rec) + 1))

    mlt = qs["more_like_this"](spark, sf).collect()
    assert 0 < len(mlt) <= 10
    from bge_m3_onnx_spark.config import DEFAULT_CONFIG as CFG
    from bge_m3_onnx_spark.plans.build_index import build_index
    from bge_m3_onnx_spark.entry import _transcripts

    idx = build_index(_transcripts(spark, sf), CFG, cache=False)
    src = idx.docs.orderBy(F.desc("dl"), F.asc("doc_id")).limit(1).collect()[0]["doc_id"]
    assert src not in {r["doc_id"] for r in mlt}


def test_exclude_docs_with_terms(spark):
    from bge_m3_onnx_spark.operators.bm25 import exclude_docs_with_terms

    scored = spark.createDataFrame(
        [(1, "d1", 2.0), (1, "d2", 1.5), (1, "d3", 1.0)], "query_id int, doc_id string, score double"
    )
    postings = spark.createDataFrame(
        [("slow", "d2", 1), ("fast", "d1", 1)], "term string, doc_id string, tf int"
    )
    kept = {r["doc_id"] for r in exclude_docs_with_terms(scored, postings, ["slow"]).collect()}
    assert kept == {"d1", "d3"}
    # absent exclusion term is a boolean no-op; empty list returns input unchanged
    allr = {r["doc_id"] for r in exclude_docs_with_terms(scored, postings, ["zzz"]).collect()}
    assert allr == {"d1", "d2", "d3"}
    assert exclude_docs_with_terms(scored, postings, []) is scored


def test_expand_synonyms_one_hop_distinct(spark):
    from bge_m3_onnx_spark.operators.wildcard import expand_synonyms

    qt = spark.createDataFrame([(1, "query"), (1, "table"), (2, "query")], "query_id int, term string")
    syn = spark.createDataFrame(
        [("query", "scan"), ("scan", "probe"), ("table", "query")], "term string, syn string"
    )
    got = {(r["query_id"], r["term"]) for r in expand_synonyms(qt, syn).collect()}
    # one hop only: query->scan but NOT scan->probe; table->query dedupes with base
    assert got == {
        (1, "query"), (1, "table"), (1, "scan"),
        (2, "query"), (2, "scan"),
    }


def test_percolate_and_or_semantics(spark):
    from bge_m3_onnx_spark.operators.percolate import percolate, saved_queries_df

    saved = saved_queries_df(spark, {1: "a b", 2: "c", 3: "a zzz"})
    toks = spark.createDataFrame(
        [("d1", "a"), ("d1", "b"), ("d2", "a"), ("d3", "c"), ("d3", "a"), ("d1", "a")],
        "doc_id string, term string",
    )
    got = {(r["doc_id"], r["query_id"]) for r in percolate(toks, saved, conjunctive=True).collect()}
    # AND: d1 matches q1 (has a+b); d2 does not (a only); q3 never (zzz unindexed)
    assert got == {("d1", 1), ("d3", 2)}
    got_or = {(r["doc_id"], r["query_id"]) for r in percolate(toks, saved, conjunctive=False).collect()}
    assert got_or == {("d1", 1), ("d2", 1), ("d3", 1), ("d3", 2), ("d1", 3), ("d2", 3), ("d3", 3)}


def test_percolate_rarest_term_equals_plain(spark):
    """The rarest-term candidate path (VERDICT r3 #5) is an optimization, not a
    semantics change: conjunctive results must be identical to the plain path,
    including queries whose rarest term is hot, docs matching several
    queries, and a query term absent from the corpus entirely."""
    from bge_m3_onnx_spark.operators.percolate import (
        percolate,
        rarest_terms_df,
        saved_queries_df,
    )

    docs = [
        ("d1", ["the", "spark", "shuffle"]),
        ("d2", ["the", "spark"]),
        ("d3", ["spark", "shuffle", "rare1"]),
        ("d4", ["the"]),
        ("d5", ["rare1", "rare2", "the", "spark", "shuffle"]),
    ]
    toks = spark.createDataFrame(
        [(d, t) for d, ts in docs for t in ts], "doc_id string, term string"
    )
    queries = {1: "the spark", 2: "spark shuffle", 3: "rare1 the", 4: "rare2", 5: "ghost the"}
    saved = saved_queries_df(spark, queries)
    # df over this corpus: the=4, spark=4, shuffle=3, rare1=2, rare2=1, ghost=0
    term_df = toks.groupBy("term").agg(F.count("*").alias("df"))
    rarest = rarest_terms_df(saved, term_df)
    got_rarest = {(r["query_id"], r["term"]) for r in rarest.collect()}
    assert got_rarest == {(1, "spark"), (2, "shuffle"), (3, "rare1"), (4, "rare2"), (5, "ghost")}
    plain = {
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in percolate(toks, saved, conjunctive=True).collect()
    }
    fast = {
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in percolate(toks, saved, conjunctive=True, rarest=rarest).collect()
    }
    assert plain == fast
    assert ("d5", 3, 2) in fast and ("d4", 1, 2) not in fast
    assert not any(q == 5 for _, q, _ in fast)  # 'ghost' never matches


def test_percolate_min_should_match_equals_brute(spark):
    """min_should_match ≥ 2 via the prefix filter (each query's n-m+1 rarest
    terms) must equal brute force: the full OR path filtered to
    n_matched ≥ m — including queries whose hot term is the ONLY one a doc
    has (pruned candidate, correctly absent) and m > n_terms (empty)."""
    from bge_m3_onnx_spark.operators.percolate import (
        percolate,
        prefix_terms_df,
        saved_queries_df,
    )

    docs = [
        ("d1", ["the", "spark", "shuffle"]),
        ("d2", ["the"]),
        ("d3", ["spark", "rare1"]),
        ("d4", ["the", "rare1", "rare2"]),
        ("d5", ["rare2"]),
    ]
    toks = spark.createDataFrame(
        [(d, t) for d, ts in docs for t in ts], "doc_id string, term string"
    )
    queries = {1: "the spark shuffle", 2: "rare1 rare2 the", 3: "spark rare2", 4: "ghost"}
    saved = saved_queries_df(spark, queries)
    term_df = toks.groupBy("term").agg(F.count("*").alias("df"))
    for m in (2, 3):
        prefix = prefix_terms_df(saved, term_df, m)
        # prefix size per query = n_terms - m + 1 (never larger, empty if m > n)
        sizes = {
            r["query_id"]: r["n"]
            for r in prefix.groupBy("query_id").agg(F.count("*").alias("n")).collect()
        }
        for qid, qtext in queries.items():
            n_terms = len(set(qtext.split()))
            assert sizes.get(qid, 0) == max(0, n_terms - m + 1)
        got = {
            (r["doc_id"], r["query_id"], r["n_matched"])
            for r in percolate(
                toks, saved, conjunctive=False, min_should_match=m, prefix=prefix
            ).collect()
        }
        brute = {
            (r["doc_id"], r["query_id"], r["n_matched"])
            for r in percolate(toks, saved, conjunctive=False).collect()
            if r["n_matched"] >= m
        }
        assert got == brute, (m, got, brute)
    # m=2 spot checks: d2 has only q1's hottest term -> no match; d4 matches q2
    # with all 3; 'ghost' (df 0, n=1 < m) never appears
    prefix2 = prefix_terms_df(saved, term_df, 2)
    got2 = {
        (r["doc_id"], r["query_id"])
        for r in percolate(
            toks, saved, conjunctive=False, min_should_match=2, prefix=prefix2
        ).collect()
    }
    assert ("d2", 1) not in got2 and ("d1", 1) in got2 and ("d4", 2) in got2
    assert not any(q == 4 for _, q in got2)


def test_percolate_min_should_match_requires_prefix(spark):
    from bge_m3_onnx_spark.operators.percolate import percolate, saved_queries_df

    saved = saved_queries_df(spark, {1: "a b"})
    toks = spark.createDataFrame([("d1", "a")], "doc_id string, term string")
    with pytest.raises(ValueError, match="prefix"):
        percolate(toks, saved, conjunctive=False, min_should_match=2)
