"""Capture .explain('formatted') for the engine's key plans → EXPLAIN.md.

Audit goals (SCALE.md): broadcast joins where intended, pushed filters on the
blocks/postings scans, column pruning (no text column at query time, no varbyte
payloads in the WAND metadata pass), partial aggregation, no global sorts.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bge_m3_onnx_spark.plans.checkpoint import load_materialized, materialize_index  # noqa: E402
from bge_m3_onnx_spark.session import get_spark  # noqa: E402
from bge_m3_onnx_spark.sources.transcripts import synth_transcripts  # noqa: E402


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    idx_dir = "/tmp/explain_idx"
    if not os.path.exists(os.path.join(idx_dir, "stats.json")):
        materialize_index(
            spark, synth_transcripts(spark, 2000, 10), idx_dir, input_path="synth:explain"
        )
    idx = load_materialized(spark, idx_dir)

    sections: list[tuple[str, str, list[str]]] = []

    from bge_m3_onnx_spark.plans.query import run_queries

    plan_exact = run_queries(spark, idx, {1: "spark shuffle partition"}, k=10)
    sections.append(
        (
            "Single-query exact BM25 (latency path)",
            fmt(plan_exact),
            [
                "BroadcastHashJoin on term (query side is a literal local relation — no df-lookup subjob)",
                "PushedFilters on the postings scan; ONE driver-sized Exchange feeding the "
                "two-phase ObjectHashAggregate (deterministic term-sorted score fold)",
                "TakeOrderedAndProject — no window exchange over the candidate set",
                "ReadSchema excludes text and varbyte payloads",
            ],
        )
    )

    plan_batch = run_queries(
        spark, idx, {1: "spark shuffle partition", 2: "the index", 3: "varbyte block"}, k=10
    )
    sections.append(
        (
            "Multi-query exact BM25 batch",
            fmt(plan_batch),
            [
                "One plan for the whole batch (query_id rides the broadcast side)",
                "WindowGroupLimit before the final window (per-query top-k pre-pruned)",
            ],
        )
    )

    meta_scan = idx.blocks.filter(F.col("term").isin(["spark", "shuffle", "partition"])).select(
        "term", "block_id", "block_max_score"
    )
    sections.append(
        (
            "WAND metadata pass (blocks scan, metadata columns only)",
            fmt(meta_scan),
            [
                "PushedFilters: In(term, ...) reaches the Parquet scan",
                "ReadSchema contains ONLY term/block_id/block_max_score (no *_vb binaries)",
            ],
        )
    )

    postings_term_scan = idx.postings.filter(F.col("term") == "spark")
    sections.append(
        (
            "Postings scan with term predicate",
            fmt(postings_term_scan),
            ["PushedFilters: IsNotNull(term), EqualTo(term,spark)"],
        )
    )

    from bge_m3_onnx_spark.operators.bm25 import score_postings, topk
    from bge_m3_onnx_spark.operators.wildcard import expand_prefix

    qt_prefix = expand_prefix(idx.terms, "sh", query_id=1, max_expansions=64)
    plan_prefix = topk(score_postings(idx.postings, qt_prefix, idx.n_docs, idx.avgdl), k=10)
    sections.append(
        (
            "Prefix search 'sh*' (expansion → BM25)",
            fmt(plan_prefix),
            [
                "Terms scan: PushedFilters StringStartsWith(term,sh)",
                "TakeOrderedAndProject caps the expansion (max_expansions) before BroadcastExchange",
                "Postings side joins the broadcast expansion — no shuffle of postings",
            ],
        )
    )

    from bge_m3_onnx_spark.operators.bm25f import (
        fielded_counted,
        fielded_postings,
        field_stats,
        score_bm25f,
    )

    tsc = synth_transcripts(spark, 500, 10)
    fc = fielded_counted(tsc)
    fp = fielded_postings(fc).filter(F.col("term").isin(["search", "spark"]))
    qt_f = spark.createDataFrame(
        [(1, "search", 50), (1, "spark", 60)], "query_id int, term string, df long"
    )
    plan_bm25f = topk(score_bm25f(fp, qt_f, 5000, field_stats(fc)), k=10)
    sections.append(
        (
            "BM25F field-weighted scoring",
            fmt(plan_bm25f),
            [
                "ArrowEvalPython appears once per field (SPIMI counting kernel) — no row-at-a-time Python",
                "Two partial+final HashAggregate pairs (per-term pseudo-frequency, per-doc score)",
                "Query-term side is a broadcast of a local relation",
            ],
        )
    )

    # ---- WAND plans (r4 rewrite audit — VERDICT r4 #5): the returned frame is
    # localCheckpointed, so plans are captured via the stats_out hook, pre-
    # checkpoint, from a real forced run on the same materialized index.
    from bge_m3_onnx_spark.plans.wand import run_queries_wand

    st: dict = {"capture_plans": True}
    run_queries_wand(
        spark, idx, {1: "spark shuffle partition", 2: "the index"}, k=10,
        force_wand=True, stats_out=st,
    ).collect()
    sections.append(
        (
            "WAND phase-2/3 surviving-block filter (literal IN over cached query-blocks)",
            st["plan_surviving"],
            [
                "Filter is a literal (term = t AND block_id IN (...)) disjunction over the "
                "cached qblocks relation — NO BroadcastExchange subjob for the surviving keys",
                "InMemoryTableScan of qblocks (cached pushed-In(term) scan) — the parquet scan "
                "below it reads only metadata columns",
            ],
        )
    )
    sections.append(
        (
            "WAND final scoring plan (pre-checkpoint)",
            st["plan_final"],
            [
                "Per-term qids/idf/range lookups are literal create_map expressions — zero "
                "broadcasts of query METADATA (the r2-era plan had ~25 tiny-relation "
                "BroadcastExchange subjobs for these; r4 rewrite removed them)",
                "Every remaining BroadcastExchange carries a CANDIDATE-BOUNDED relation: "
                "(term, block_id) surviving/needed keysets, (query_id, doc_ord) candidates, "
                "strong doc_ords, and the final scored rows — all ≤ candidate volume, "
                "never corpus-sized",
                "Candidate-bounded side is the BROADCAST side of the doc_id resolution join "
                "(docs relation never shuffles)",
                "TakeOrderedAndProject for the final top-k — no global sort",
            ],
        )
    )

    # ---- Percolate OR / min_should_match plans (r5): the full-OR count must
    # be exchange-free after the doc-local set agg; msm candidates broadcast.
    from bge_m3_onnx_spark.operators.percolate import (
        percolate,
        prefix_terms_df,
        saved_queries_df,
    )

    toks = (
        synth_transcripts(spark, 500, 10)
        .select(
            F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string")).alias("doc_id"),
            F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    saved = saved_queries_df(spark, {1: "spark the index", 2: "shuffle of varbyte"})
    plan_or = percolate(toks, saved, conjunctive=False)
    sections.append(
        (
            "Percolate full-OR (doc-local term sets)",
            fmt(plan_or),
            [
                "Saved-vocabulary semi-join and term→query fan-out are BroadcastHashJoins",
                "The only corpus-sized Exchange is the doc_id set agg (the other is the "
                "saved-vocab distinct, |vocab| rows feeding its broadcast); the final "
                "(doc_id, query_id) partial+final HashAggregate pair reuses the doc_id "
                "partitioning — NO exchange between them (output is computed, not "
                "shuffled: the match volume Σ_q Σ_t df(t) never rides a shuffle)",
            ],
        )
    )
    term_df = toks.groupBy("term").agg(F.count("*").alias("df"))
    plan_msm = percolate(
        toks, saved, conjunctive=False, min_should_match=2,
        prefix=prefix_terms_df(saved, term_df, 2),
    )
    sections.append(
        (
            "Percolate min_should_match=2 (prefix-filter candidates)",
            fmt(plan_msm),
            [
                "Prefix relation (each query's n−m+1 rarest terms) and per-query term "
                "arrays are broadcast — candidate generation never shuffles the probe",
                "Data-sized exchanges are the candidate (doc_id, query_id) dedupe and "
                "the doc-set agg, both candidate/vocab-bounded (hottest m−1 terms "
                "never fan out); term_df/prefix prep shuffles are term-count-sized "
                "after map-side partial agg",
            ],
        )
    )

    with open(os.path.join(REPO, "EXPLAIN.md"), "w") as f:
        f.write("# EXPLAIN audit — key physical plans\n\n")
        f.write("Generated by tools/explain_audit.py over a materialized index.\n")
        for title, plan, checks in sections:
            f.write(f"\n## {title}\n\nChecklist:\n")
            for c in checks:
                f.write(f"- {c}\n")
            f.write("\n```\n" + plan + "```\n")
    print("wrote EXPLAIN.md")
    spark.stop()


if __name__ == "__main__":
    main()
