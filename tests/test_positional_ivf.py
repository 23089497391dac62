"""Positional phrase matching + IVF ANN — the round-2 additions beyond the
reference inventory (SURVEY §2.11).

Phrase match is checked against a pure-Python sliding-window oracle on a
hand-built corpus (3-term phrase, repeated-term phrase, overlapping
occurrences). IVF is checked for (a) recall@10 vs the brute-force scan on the
driver's embeddings fixture and (b) that it actually prunes — the probed lists
are a strict subset of the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bge_m3_onnx_spark.config import DEFAULT_CONFIG
from bge_m3_onnx_spark.operators.ivf import ivf_build, ivf_topk
from bge_m3_onnx_spark.operators.positional import phrase_match, positional_postings
from bge_m3_onnx_spark.operators.postings import tokenized_docs

SF_DIR = "/root/testdata/sf0.001"

DOCS = [
    ("d1", "the quick brown fox jumps over the quick brown dog"),
    ("d2", "quick brown quick brown quick brown"),  # overlapping repeats
    ("d3", "brown quick"),  # reversed — must NOT match "quick brown"
    ("d4", "the the the"),  # repeated-term phrase territory
    ("d5", "quick"),  # prefix only
]


def py_phrase_count(text: str, phrase: list[str]) -> int:
    toks = text.split()
    n = len(phrase)
    return sum(1 for i in range(len(toks) - n + 1) if toks[i : i + n] == phrase)


@pytest.fixture(scope="module")
def positional(spark):
    df = spark.createDataFrame(
        [(d, 0, "user", t, None, None) for d, t in DOCS],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    return positional_postings(tokenized_docs(df, DEFAULT_CONFIG)).persist()


@pytest.mark.parametrize(
    "phrase",
    [["quick", "brown"], ["the", "quick", "brown"], ["the", "the"], ["quick", "quick"]],
)
def test_phrase_match_vs_python_oracle(positional, phrase):
    got = {r["doc_id"].split(":")[0]: r["n_phrase"] for r in phrase_match(positional, phrase).collect()}
    want = {d: py_phrase_count(t, phrase) for d, t in DOCS if py_phrase_count(t, phrase) > 0}
    assert got == want


def test_phrase_positions_never_explode(positional):
    # one row per (term, doc) with a sorted positions array — tf == len(positions)
    rows = positional.filter(F.col("term") == "quick").collect()
    by_doc = {r["doc_id"].split(":")[0]: list(r["positions"]) for r in rows}
    assert by_doc["d2"] == [1, 3, 5]
    assert all(p == sorted(p) for p in by_doc.values())


def test_ivf_prunes_and_recalls(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()

    # brute-force cosine top-10 (the exact answer)
    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    exact = [
        r["vec_id"]
        for r in emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                dot(F.col("embedding"), F.col("qv"))
                / (
                    F.sqrt(dot(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(dot(F.col("qv"), F.col("qv")))
                )
            ).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
        .collect()
    ]

    got = [r["vec_id"] for r in ivf_topk(emb, 0, k_lists=8, nprobe=2).collect()]
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.5, f"IVF recall@10 {recall} vs exact {exact} got {got}"

    # pruning is real: the 2 probed lists hold strictly less than the corpus
    assigned, _ = ivf_build(emb, 8)
    sizes = {r["cluster"]: r["n"] for r in assigned.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == n and len(sizes) == 8
    assert sum(sorted(sizes.values(), reverse=True)[:2]) < n
