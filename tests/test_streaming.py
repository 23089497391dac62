"""Structured Streaming wrapper: file-source micro-batches → foreachBatch merge
must equal a full rebuild (SURVEY.md §2.9 mapping)."""

from __future__ import annotations

import pytest

from bge_m3_onnx_spark.plans.build_index import build_index
from bge_m3_onnx_spark.plans.query import run_queries
from bge_m3_onnx_spark.sources.transcripts import TRANSCRIPTS_SCHEMA, synth_transcripts
from bge_m3_onnx_spark.streaming.incremental import merge_delta, stream_build


def test_stream_build_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "stream_in")
    ckpt = str(tmp_path / "ckpt")
    a = synth_transcripts(spark, n_convs=20, turns_per_conv=5)
    b = synth_transcripts(spark, n_convs=10, turns_per_conv=5).withColumn(
        "conv_id", F.concat(F.lit("s2-"), F.col("conv_id"))
    )
    a.write.mode("append").parquet(in_dir)
    b.write.mode("append").parquet(in_dir)

    state = {"idx": None}

    def on_batch(df, batch_id):
        if df.isEmpty():
            return
        if state["idx"] is None:
            state["idx"] = build_index(df)
            state["idx"].postings.count()
        else:
            state["idx"] = merge_delta(spark, state["idx"], df)
            state["idx"].postings.count()

    q = stream_build(spark, in_dir, TRANSCRIPTS_SCHEMA, on_batch, ckpt, trigger_once=True)
    q.awaitTermination(120)
    assert state["idx"] is not None

    full = build_index(a.unionByName(b))
    queries = {1: "spark shuffle", 2: "the merge"}
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in run_queries(spark, state["idx"], queries, k=10).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in run_queries(spark, full, queries, k=10).collect()
    }
    assert got == want


def test_stream_restart_is_exactly_once(spark, tmp_path):
    """Restarting with the same checkpoint must not re-deliver processed files."""
    in_dir = str(tmp_path / "stream_in2")
    ckpt = str(tmp_path / "ckpt2")
    a = synth_transcripts(spark, n_convs=5, turns_per_conv=4)
    a.write.mode("append").parquet(in_dir)

    seen: list[int] = []

    def on_batch(df, batch_id):
        seen.append(df.count())

    q = stream_build(spark, in_dir, TRANSCRIPTS_SCHEMA, on_batch, ckpt, trigger_once=True)
    q.awaitTermination(120)
    first_total = sum(seen)
    assert first_total == 20

    seen.clear()
    q2 = stream_build(spark, in_dir, TRANSCRIPTS_SCHEMA, on_batch, ckpt, trigger_once=True)
    q2.awaitTermination(120)
    assert sum(seen) == 0  # nothing new → no rows re-delivered
