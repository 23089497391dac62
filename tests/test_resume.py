"""Checkpoint/resume: kill after stage N, restart, get a byte-identical index
(SURVEY.md §5 'checkpoint resume' unit test)."""

from __future__ import annotations

import json
import os

import pytest

from bge_m3_onnx_spark.plans.checkpoint import (
    STAGES,
    StageFailure,
    load_materialized,
    materialize_index,
)
from bge_m3_onnx_spark.plans.query import run_queries


def _index_digest(spark, index_dir) -> dict:
    idx = load_materialized(spark, index_dir)
    post = sorted(
        (r["term"], r["doc_id"], r["tf"], r["dl"], r["doc_ord"])
        for r in idx.postings.collect()
    )
    blocks = sorted(
        (r["term"], r["block_id"], r["n"], r["first_ord"], bytes(r["ords_vb"]), r["block_max_score"])
        for r in idx.blocks.collect()
    )
    return {"n": idx.n_docs, "avgdl": idx.avgdl, "postings": post, "blocks": blocks}


def test_resume_after_injected_crash(spark, tiny_transcripts, tmp_path):
    one_shot = str(tmp_path / "idx_oneshot")
    resumed = str(tmp_path / "idx_resumed")

    materialize_index(spark, tiny_transcripts, one_shot, input_path="tiny", snapshot_id=1)

    # crash after 'postings', then resume
    with pytest.raises(StageFailure):
        materialize_index(
            spark, tiny_transcripts, resumed, input_path="tiny", snapshot_id=1,
            fail_after="postings",
        )
    man_partial = json.load(open(os.path.join(resumed, "_manifest", "manifest.json")))
    assert man_partial["stages"]["postings"]["status"] == "done"
    assert "blocks" not in man_partial["stages"]

    ran: list[str] = []
    materialize_index(
        spark, tiny_transcripts, resumed, input_path="tiny", snapshot_id=1,
        on_stage=ran.append,
    )
    # completed stages must NOT rerun
    assert "tokenized" not in ran and "postings" not in ran and "docs" not in ran
    assert set(ran) == {"terms", "stats", "blocks"}

    assert _index_digest(spark, resumed) == _index_digest(spark, one_shot)


def test_manifest_lineage_and_metrics(spark, tiny_transcripts, tmp_path):
    index_dir = str(tmp_path / "idx_lineage")
    man = materialize_index(spark, tiny_transcripts, index_dir, input_path="tiny", snapshot_id=7)
    d = json.load(open(man.path))
    assert d["snapshot_id"] == 7
    for stage in STAGES:
        assert d["stages"][stage]["status"] == "done"
        assert d["stages"][stage]["wall_ms"] > 0
    post = d["stages"]["postings"]
    assert post["rows"] > 0 and post["bytes"] > 0 and post["partitions"] >= 1
    assert all({"file", "rows", "bytes"} <= set(x) for x in post["lineage"])
    # per-partition lineage row counts sum to the stage total
    assert sum(x["rows"] for x in post["lineage"]) == post["rows"]


def test_materialized_index_answers_queries(spark, tiny_transcripts, tmp_path, query_set):
    from bge_m3_onnx_spark.plans.build_index import build_index

    index_dir = str(tmp_path / "idx_q")
    materialize_index(spark, tiny_transcripts, index_dir, input_path="tiny")
    idx = load_materialized(spark, index_dir)
    live = build_index(tiny_transcripts)

    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in run_queries(spark, idx, query_set, k=5).collect()
    }
    want = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in run_queries(spark, live, query_set, k=5).collect()
    }
    assert got == want


def test_load_reconciles_cfg_from_stats(spark, tiny_transcripts, tmp_path, query_set):
    """An index built with a non-default block_size and loaded with the DEFAULT
    config must adopt the stored parameters (stats.json) — otherwise WAND's
    block coverage math and BM25 score math silently diverge from the stored
    blocks (ADVICE r1). Loaded cfg carries the stored values and the WAND path
    stays rank/score-identical to the exact path."""
    import dataclasses
    import warnings

    from bge_m3_onnx_spark.config import DEFAULT_CONFIG, EngineConfig
    from bge_m3_onnx_spark.plans.wand import run_queries_wand

    cfg32 = dataclasses.replace(DEFAULT_CONFIG, block_size=32)
    index_dir = str(tmp_path / "idx_b32")
    materialize_index(spark, tiny_transcripts, index_dir, input_path="tiny", cfg=cfg32)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        idx = load_materialized(spark, index_dir, cfg=DEFAULT_CONFIG)
    assert idx.cfg.block_size == 32  # stored value wins
    assert any("stats.json" in str(x.message) for x in w)  # drift is loud

    subset = {q: query_set[q] for q in (1, 3)}
    exact = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in run_queries(spark, idx, subset, k=5).collect()
    }
    wand = {
        (r["query_id"], r["rank"]): (r["doc_id"], round(r["score"], 9))
        for r in run_queries_wand(spark, idx, subset, k=5, force_wand=True).collect()
    }
    assert exact == wand
