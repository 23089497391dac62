"""Extra benchmarks for optimization work (guide §1.4): per-stage build timings,
noop-sink isolation of each suite component, and job-description labels.

NOT part of the driver contract — bench.py stays the frozen measurement harness;
this file exists so OPTIMIZATION_r06.md can cite stage-level numbers.

Usage: SPARK_GRAFT_BENCH_TURNS=200000 python bench_extra.py [phase ...]
Phases: build exact wand mat  (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bge_m3_onnx_spark.plans.build_index import build_index  # noqa: E402
from bge_m3_onnx_spark.plans.query import run_queries  # noqa: E402
from bge_m3_onnx_spark.plans.wand import run_queries_wand  # noqa: E402
from bge_m3_onnx_spark.session import get_spark  # noqa: E402
from bge_m3_onnx_spark.sources.transcripts import (  # noqa: E402
    synth_transcripts,
    synth_transcripts_skewed,
)
from bench import BENCH_QUERIES, cpu_control_sec  # noqa: E402


OUT: dict = {}


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_turns = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "200000"))
    phases = set(sys.argv[1:]) or {"build", "exact", "wand", "mat"}
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    sc = spark.sparkContext
    out = OUT
    out.update({"turns": n_turns, "cpus": cpus})
    out["cpu_control_pre"] = round(cpu_control_sec(cpus), 3)

    # warmup (codegen + Arrow workers)
    warm = build_index(synth_transcripts(spark, 100, 10), with_blocks=True)
    warm.postings.count(); warm.blocks.count(); warm.release()

    transcripts = synth_transcripts(spark, n_convs=n_turns // 10, turns_per_conv=10)

    idx = None
    if "build" in phases:
        from bge_m3_onnx_spark.operators import postings as P
        from bge_m3_onnx_spark.operators.ordinals import assign_dense_ordinals_with_aggs
        from bge_m3_onnx_spark.operators.compress import build_blocks
        import pyspark.sql.functions as F

        from bge_m3_onnx_spark.sources.transcripts import doc_id_col

        stage_t: dict[str, float] = {}
        for rep in range(2):
            t_all0 = time.monotonic()
            counted = P.counted_docs(transcripts)
            light = P.doc_len_docs(transcripts)
            sc.setJobDescription("build: ordinals sample+counts")
            t0 = time.monotonic()
            # mirrors build_index exactly: light stats twin, raw-key sample,
            # docs from the attached twin (r6)
            counted, n, aggs, docs_light = assign_dense_ordinals_with_aggs(
                counted, key="doc_id", out="doc_ord",
                extra_aggs=[F.sum("dl").alias("sum_dl")],
                stats_df=light, attach_to=light,
                key_df=transcripts.select(doc_id_col().alias("doc_id")),
            )
            stage_t["ordinal_jobs"] = min(stage_t.get("ordinal_jobs", 9e9), time.monotonic() - t0)
            sum_dl = sum(r["sum_dl"] or 0 for r in aggs)
            posting = P.postings_from_counted(counted).persist()
            sc.setJobDescription("build: postings materialize")
            t0 = time.monotonic()
            n_post = posting.count()
            stage_t["postings_count"] = min(stage_t.get("postings_count", 9e9), time.monotonic() - t0)
            terms = P.term_stats(posting).persist()
            sc.setJobDescription("build: terms materialize")
            t0 = time.monotonic()
            terms.count()
            stage_t["terms_count"] = min(stage_t.get("terms_count", 9e9), time.monotonic() - t0)
            blocks = build_blocks(posting, terms, n, sum_dl / n).persist()
            sc.setJobDescription("build: blocks materialize")
            t0 = time.monotonic()
            n_blocks = blocks.count()
            stage_t["blocks_count"] = min(stage_t.get("blocks_count", 9e9), time.monotonic() - t0)
            stage_t["build_total"] = min(stage_t.get("build_total", 9e9), time.monotonic() - t_all0)
            if rep == 0:
                for d in (posting, terms, blocks):
                    d.unpersist()
            else:
                out["n_postings"], out["n_blocks"] = n_post, n_blocks
        out["build_stages"] = {k: round(v, 3) for k, v in stage_t.items()}
        sc.setJobDescription(None)
        # keep the last build for the query phases
        from bge_m3_onnx_spark.plans.build_index import InvertedIndex
        idx = InvertedIndex(postings=posting, terms=terms, docs=docs_light,
                            n_docs=n, avgdl=sum_dl / n,
                            cfg=__import__("bge_m3_onnx_spark.config", fromlist=["DEFAULT_CONFIG"]).DEFAULT_CONFIG,
                            blocks=blocks)
    else:
        idx = build_index(transcripts, with_blocks=True)
        idx.postings.count(); idx.blocks.count()

    run_queries(spark, idx, BENCH_QUERIES, k=10).collect()  # warm df memo

    if "exact" in phases:
        ts = []
        for i in range(3):
            sc.setJobDescription(f"exact batch #{i}")
            t0 = time.monotonic()
            run_queries(spark, idx, BENCH_QUERIES, k=10).collect()
            ts.append(round(time.monotonic() - t0, 3))
        out["exact_batch"] = ts
        # single-query latencies
        lat = {}
        for qid, qtext in BENCH_QUERIES.items():
            best = 9e9
            for _ in range(2):
                t0 = time.monotonic()
                run_queries(spark, idx, {qid: qtext}, k=10).collect()
                best = min(best, time.monotonic() - t0)
            lat[qid] = round(best, 3)
        out["exact_single"] = lat
        sc.setJobDescription(None)

    if "wand" in phases:
        ts = []
        stats_last: dict = {}
        for i in range(3):
            sc.setJobDescription(f"wand forced batch #{i}")
            st: dict = {}
            t0 = time.monotonic()
            run_queries_wand(spark, idx, BENCH_QUERIES, k=10, force_wand=True, stats_out=st).collect()
            ts.append(round(time.monotonic() - t0, 3))
            st.pop("essential_terms", None); st.pop("theta", None)
            stats_last = st
        out["wand_forced_batch"] = ts
        out["wand_forced_stats"] = stats_last
        # skewed-corpus stats section (mirrors bench.py)
        sc.setJobDescription("skewed build")
        t0 = time.monotonic()
        skewed = build_index(
            synth_transcripts_skewed(spark, n_convs=n_turns // 20, turns_per_conv=10),
            with_blocks=True,
        )
        skewed.blocks.count()
        out["skewed_build"] = round(time.monotonic() - t0, 3)
        wand_stats = {}
        for qname, queries, wk in (("hot_k10", {1: "the"}, 10), ("tail_k1", {1: "colbert4"}, 1),
                                   ("mixed_rare_hot_k10", {1: "iceberg3 the"}, 10)):
            sc.setJobDescription(f"skewed wand {qname}")
            st2: dict = {}
            t0 = time.monotonic()
            run_queries_wand(spark, skewed, queries, k=wk, force_wand=True, stats_out=st2).collect()
            st2["wall"] = round(time.monotonic() - t0, 3)
            st2.pop("essential_terms", None); st2.pop("theta", None)
            wand_stats[qname] = st2
        out["skewed_wand"] = wand_stats
        skewed.release()
        sc.setJobDescription(None)

    if "mat" in phases:
        import shutil
        import tempfile
        from bge_m3_onnx_spark.plans.checkpoint import load_materialized, materialize_index

        mat_dir = tempfile.mkdtemp(prefix="bench_extra_mat_")
        try:
            sc.setJobDescription("materialize_index")
            t0 = time.monotonic()
            materialize_index(spark, transcripts, mat_dir, input_path="synth:bench_extra")
            out["materialize_wall"] = round(time.monotonic() - t0, 3)
            midx = load_materialized(spark, mat_dir)
            run_queries(spark, midx, BENCH_QUERIES, k=10).collect()
            lat = {}
            for qid, qtext in BENCH_QUERIES.items():
                best = 9e9
                for _ in range(2):
                    sc.setJobDescription(f"mat query {qid}")
                    t0 = time.monotonic()
                    run_queries(spark, midx, {qid: qtext}, k=10).collect()
                    best = min(best, time.monotonic() - t0)
                lat[qid] = round(best, 3)
            out["mat_single"] = lat
        finally:
            shutil.rmtree(mat_dir, ignore_errors=True)
        sc.setJobDescription(None)

    out["cpu_control_post"] = round(cpu_control_sec(cpus), 3)
    spark.stop()
    print(json.dumps(out))


def _main_flush() -> None:
    # a mid-run failure (or an edit landing under a live run) must not lose the
    # completed phases' numbers — dump whatever main() accumulated
    import traceback

    try:
        main()
    except BaseException:
        traceback.print_exc()
        if OUT:
            print(json.dumps(OUT))
        raise


if __name__ == "__main__":
    _main_flush()
