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


def test_serving_restart_processes_only_new_batches(spark, tmp_path):
    """Checkpointed restart: a second start() with the same checkpoint dir must
    process ONLY files added after the first run (streaming exactly-once over
    the query stream)."""
    import os

    from bge_m3_onnx_spark.plans.build_index import build_index
    from bge_m3_onnx_spark.sources.transcripts import synth_transcripts

    idx = build_index(synth_transcripts(spark, n_convs=80, turns_per_conv=5))
    qdir = str(tmp_path / "q")
    os.makedirs(qdir)
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame([(1, "spark shuffle")], QUERY_STREAM_SCHEMA).coalesce(1).write.parquet(
        qdir, mode="append"
    )
    got1: list = []
    q1 = serve_query_stream(
        spark, idx,
        spark.readStream.schema(QUERY_STREAM_SCHEMA).parquet(qdir),
        sink=lambda df, bid: got1.extend(df.collect()),
        k=3, checkpoint_dir=ckpt, trigger_once=True,
    )
    q1.awaitTermination(120)
    assert {r["query_id"] for r in got1} == {1}

    spark.createDataFrame([(2, "the index")], QUERY_STREAM_SCHEMA).coalesce(1).write.parquet(
        qdir, mode="append"
    )
    got2: list = []
    q2 = serve_query_stream(
        spark, idx,
        spark.readStream.schema(QUERY_STREAM_SCHEMA).parquet(qdir),
        sink=lambda df, bid: got2.extend(df.collect()),
        k=3, checkpoint_dir=ckpt, trigger_once=True,
    )
    q2.awaitTermination(120)
    # restart resumes from the checkpoint: query 1 must NOT be re-served
    assert {r["query_id"] for r in got2} == {2}


def test_streaming_percolation_alerts(spark, tmp_path):
    """Alerting: stream DOCS through the percolator inside foreachBatch — each
    micro-batch's matches equal the batch percolate over the same rows."""
    import os

    import pyspark.sql.functions as F

    from bge_m3_onnx_spark.operators.percolate import percolate, saved_queries_df

    saved = saved_queries_df(spark, {1: "alert spark", 2: "quota"})
    ddir = str(tmp_path / "docs")
    os.makedirs(ddir)
    rows = [
        ("d1", "alert raised by spark job"),
        ("d2", "spark only here"),
        ("d3", "quota exceeded"),
    ]
    spark.createDataFrame(rows, "doc_id string, text string").coalesce(1).write.parquet(
        ddir, mode="overwrite"
    )
    stream = spark.readStream.schema("doc_id string, text string").parquet(ddir)
    hits: list = []

    def on_batch(batch_df, bid):
        toks = batch_df.select(
            "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
        )
        hits.extend(percolate(toks, saved, conjunctive=True).collect())

    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "c2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["doc_id"], r["query_id"]) for r in hits}
    assert got == {("d1", 1), ("d3", 2)}  # d2 lacks 'alert' -> AND fails
