"""Streaming query serving == the batch query path, batch by batch."""

from __future__ import annotations

import os

from bge_m3_onnx_spark.plans.build_index import build_index
from bge_m3_onnx_spark.plans.query import run_queries
from bge_m3_onnx_spark.sources.transcripts import synth_transcripts
from bge_m3_onnx_spark.streaming.serving import QUERY_STREAM_SCHEMA, serve_query_stream


def test_streamed_queries_equal_batch(spark, tmp_path):
    idx = build_index(synth_transcripts(spark, n_convs=150, turns_per_conv=5))

    qdir = str(tmp_path / "queries")
    os.makedirs(qdir)
    spark.createDataFrame(
        [(1, "spark shuffle partition"), (2, "the index"), (3, "")],
        QUERY_STREAM_SCHEMA,
    ).coalesce(1).write.parquet(qdir, mode="overwrite")

    stream = spark.readStream.schema(QUERY_STREAM_SCHEMA).parquet(qdir)
    got: list = []
    q = serve_query_stream(
        spark,
        idx,
        stream,
        sink=lambda df, bid: got.extend(df.collect()),
        k=5,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_once=True,
    )
    q.awaitTermination(120)

    want = run_queries(spark, idx, {1: "spark shuffle partition", 2: "the index", 3: ""}, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted([(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in got]) == sorted(
        [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in want]
    )
    assert {r["batch_id"] for r in got} != set() and len(got) > 0
