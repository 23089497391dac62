"""Incremental indexing over snapshot ranges == full rebuild (streaming §2.9 analog)."""

from __future__ import annotations

from bge_m3_onnx_spark.plans.build_index import build_index
from bge_m3_onnx_spark.plans.query import run_queries
from bge_m3_onnx_spark.sources.catalog import SnapshotTable
from bge_m3_onnx_spark.sources.transcripts import synth_transcripts
from bge_m3_onnx_spark.streaming.incremental import index_snapshot_range, merge_delta


def _topk_map(df):
    return {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in df.collect()
    }


def test_snapshot_table_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    a = synth_transcripts(spark, n_convs=5, turns_per_conv=4)
    b = synth_transcripts(spark, n_convs=5, turns_per_conv=4).withColumn(
        "conv_id", F.concat(F.lit("b-"), F.col("conv_id"))
    )
    s1 = t.append(a)
    s2 = t.append(b)
    assert t.read(s1).count() == 20
    assert t.read(s2).count() == 40
    assert t.read_incremental(s1, s2).count() == 20
    assert t.current_snapshot_id() == s2


def test_merge_delta_equals_full_rebuild(spark, tmp_path):
    from pyspark.sql import functions as F

    base = synth_transcripts(spark, n_convs=30, turns_per_conv=5)
    delta = synth_transcripts(spark, n_convs=10, turns_per_conv=5).withColumn(
        "conv_id", F.concat(F.lit("new-"), F.col("conv_id"))
    )
    full = build_index(base.unionByName(delta))
    idx0 = build_index(base)
    merged = merge_delta(spark, idx0, delta)

    assert merged.n_docs == full.n_docs
    assert abs(merged.avgdl - full.avgdl) < 1e-9

    queries = {1: "spark shuffle", 2: "the varbyte", 3: "checkpoint"}
    assert _topk_map(run_queries(spark, merged, queries, k=10)) == _topk_map(
        run_queries(spark, full, queries, k=10)
    )


def test_index_snapshot_range_incremental(spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(spark, str(tmp_path / "tbl2"))
    a = synth_transcripts(spark, n_convs=20, turns_per_conv=5)
    b = synth_transcripts(spark, n_convs=8, turns_per_conv=5).withColumn(
        "conv_id", F.concat(F.lit("x-"), F.col("conv_id"))
    )
    s1 = t.append(a)
    s2 = t.append(b)

    idx = index_snapshot_range(spark, t, None, None, s1)
    idx = index_snapshot_range(spark, t, idx, s1, s2)
    full = build_index(t.read(s2))

    queries = {1: "spark", 2: "the merge"}
    assert _topk_map(run_queries(spark, idx, queries, k=10)) == _topk_map(
        run_queries(spark, full, queries, k=10)
    )
