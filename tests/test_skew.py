"""Skew handling: salted term stats and bounded block groups under a Zipf-hot term."""

from __future__ import annotations

from pyspark.sql import functions as F

from bge_m3_onnx_spark.config import EngineConfig
from bge_m3_onnx_spark.operators.postings import counted_docs, postings_from_counted, term_stats
from bge_m3_onnx_spark.plans.build_index import build_index
from bge_m3_onnx_spark.sources.transcripts import synth_transcripts


def test_salted_term_stats_equal_plain_groupby(spark, small_transcripts):
    posts = postings_from_counted(counted_docs(small_transcripts))
    salted = {r["term"]: r["df"] for r in term_stats(posts).collect()}
    plain = {
        r["term"]: r["cnt"]
        for r in posts.groupBy("term").agg(F.count("*").alias("cnt")).collect()
    }
    assert salted == plain
    # the synthetic corpus has Zipf-hot terms (each hot term ≈ 2/5 of turns)
    n_docs = small_transcripts.count()
    assert max(salted.values()) > 0.3 * n_docs


def test_hot_term_blocks_are_bounded(spark):
    """A term in ~every doc must shard into many blocks of ~block_size postings —
    never one giant group (the 10^12-scale stopword case, SCALE.md)."""
    t = synth_transcripts(spark, n_convs=300, turns_per_conv=10)
    cfg = EngineConfig(block_size=64)
    idx = build_index(t, cfg=cfg, with_blocks=True)
    hot = (
        idx.terms.orderBy(F.desc("df")).limit(1).collect()[0]
    )
    hot_blocks = idx.blocks.filter(F.col("term") == hot["term"]).collect()
    assert len(hot_blocks) >= hot["df"] // (2 * cfg.block_size)
    assert max(b["n"] for b in hot_blocks) <= 4 * cfg.block_size
    assert sum(b["n"] for b in hot_blocks) == hot["df"]
