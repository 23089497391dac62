"""Dedup family + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bge_m3_onnx_spark.operators.dedup import (
    exact_dedup,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_bands,
    simhash,
    simhash_near_pairs,
    simhash_py,
)
from bge_m3_onnx_spark.operators.multimodal import (
    decode_image,
    extract_features,
    synth_media,
)
from bge_m3_onnx_spark.operators.postings import tokenized_docs


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumps over the lazy dog"),  # exact dup of a
        ("c", "the quick brown fox leaps over the lazy dog"),  # near dup
        ("d", "completely different content about spark shuffles"),
        ("e", "THE  QUICK   brown fox jumps over the lazy dog"),  # ws/case dup of a
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def doc_terms(spark, docs):
    from bge_m3_onnx_spark.functions.tokenizer import tokenize_udf

    return docs.select(
        "doc_id", F.explode(tokenize_udf()(F.col("text"))).alias("term")
    )


def test_exact_dedup(docs):
    got = {r["canonical_doc_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    # a, b, e normalize to the same text
    assert got["a"] == 3
    assert got["c"] == 1 and got["d"] == 1


def test_minhash_lsh_finds_near_dups(doc_terms):
    bands = minhash_bands(doc_terms)
    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(bands).collect()}
    # identical token sets must collide in every band
    assert ("a", "b") in pairs and ("a", "e") in pairs
    # near-dup likely collides in some band; completely-different must not pair with a
    assert ("a", "d") not in pairs


def test_jaccard_verify(doc_terms):
    bands = minhash_bands(doc_terms)
    pairs = lsh_candidate_pairs(bands)
    ver = {(r["doc_a"], r["doc_b"]): r["jaccard_r"] for r in jaccard_verify(doc_terms, pairs, 0.5).collect()}
    assert ver.get(("a", "b")) == 1.0
    if ("a", "c") in ver:
        assert 0.5 <= ver[("a", "c")] < 1.0


def test_simhash_matches_pure_python(spark, docs):
    from bge_m3_onnx_spark.config import DEFAULT_CONFIG
    from bge_m3_onnx_spark.functions.tokenizer import tokenize_text

    tok = tokenized_docs(
        docs.select(
            F.split("doc_id", "#")[0].alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            "text",
        )
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash(tok).collect()}
    for r in docs.collect():
        want = simhash_py(tokenize_text(r["text"]))
        assert got[f"{r['doc_id']}:0"] == want


def test_simhash_near_pairs(spark, docs):
    tok = tokenized_docs(
        docs.select(
            F.col("doc_id").alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            "text",
        )
    )
    sh = simhash(tok)
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_near_pairs(sh, 8).collect()}
    assert pairs.get(("a:0", "b:0")) == 0  # identical text → identical simhash
    if ("a:0", "c:0") in pairs:
        assert pairs[("a:0", "c:0")] <= 16  # near dup → small hamming distance


def test_multimodal_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx")


def test_multimodal_pipeline_deterministic(spark):
    media = synth_media(spark, 30)
    f1 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    f2 = {
        r["media_id"]: r["feature"]
        for r in extract_features(media.repartition(7)).collect()
    }
    assert f1 == f2  # partitioning-independent
    assert all(len(v) == 64 for v in f1.values())
    # narrow output drops the binary column
    assert set(extract_features(media).columns) == {"media_id", "kind", "feature"}
