"""Benchmark harness — the driver runs this per round and records BENCH_r{N}.json.

Headline metrics (BASELINE.json.metric):
  * index-build throughput (turns/sec): transcripts → postings + compressed blocks
  * query latency: exact BM25 top-10 and block-max WAND top-10 over the query set,
    plus per-query p50

Corpus: deterministic synthetic transcripts (sources/transcripts.py — no RNG, no
external data), sized from the sf of $SPARK_GRAFT_SF_DIR so sf0.1 ≈ 200k turns;
plus the sf documents table reshaped to transcripts for a second, text-heavier
corpus. Prints ONE JSON line.

Scaling evidence (local[8] vs local[32]) is produced by tools/scaling_bench.py →
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
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

BENCH_QUERIES = {
    1: "spark shuffle partition",
    2: "the index",
    3: "varbyte block compress score",
    4: "checkpoint lineage snapshot iceberg",
    5: "throughput executor",
}


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def cpu_control_sec(workers: int, per_task: int = 3_000_000) -> float:
    """Pure-CPU multiprocessing burn (no Spark) — the same machine control
    tools/scaling_bench.py uses. The sandbox VM throttles episodically (2-4x
    swings on identical jobs, VERDICT r3); running this before AND after the
    query section lets a round's query numbers be judged against the box's
    state during THAT run instead of against a different round's box state."""
    import multiprocessing as mp

    tasks = 2 * workers
    with mp.Pool(workers) as p:
        p.map(_burn, [per_task] * workers)  # warm
        t0 = time.monotonic()
        p.map(_burn, [per_task] * tasks)
        return time.monotonic() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.1
    n_turns = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", str(max(20_000, int(2_000_000 * sf)))))

    t_init = time.monotonic()
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )

    timings: dict[str, float] = {}
    t_all = time.monotonic()

    # ---- warmup (reference discipline: performance_test.py:47 warms before
    # timing) — a tiny build JIT-compiles codegen + spins the Arrow workers ----
    warm = build_index(synth_transcripts(spark, n_convs=100, turns_per_conv=10), with_blocks=True)
    warm.postings.count(); warm.blocks.count()
    warm.postings.unpersist(); warm.blocks.unpersist()
    init_sec = time.monotonic() - t_init  # session + codegen/worker warmup

    # ---- index build (tokenize → postings → stats → compressed blocks) ----
    # best-of-2 with FULL unpersist between runs (postings+terms+docs+blocks, so
    # the second build recomputes everything — no CacheManager reuse): the VM
    # throttles episodically and the first full-size build additionally pays
    # codegen/alloc warm-up the tiny warmup above doesn't cover; min isolates
    # engine cost, same policy as the query timings below.
    transcripts = synth_transcripts(spark, n_convs=n_turns // 10, turns_per_conv=10)
    build_sec = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        idx = build_index(transcripts, with_blocks=True)
        n_postings = idx.postings.count()
        n_blocks = idx.blocks.count()
        build_sec = min(build_sec, time.monotonic() - t0)
        if _ == 0:
            for d in (idx.postings, idx.terms, idx.docs, idx.blocks):
                d.unpersist()
    timings["index_build"] = build_sec

    # delta-gap + varbyte payload size vs the raw 3×int64-per-posting layout
    import pyspark.sql.functions as F

    vb_bytes = int(
        idx.blocks.agg(
            F.sum(
                F.coalesce(F.length("ords_vb"), F.lit(0))
                + F.coalesce(F.length("tfs_vb"), F.lit(0))
                + F.coalesce(F.length("dls_vb"), F.lit(0))
            ).alias("b")
        ).collect()[0]["b"]
        or 0
    )
    compressed_mb = round(vb_bytes / 1e6, 2)
    compression_ratio = round((n_postings * 3 * 8) / vb_bytes, 2) if vb_bytes else None

    def best_of(n: int, fn) -> float:
        # the sandbox VM throttles episodically; min-of-n isolates engine cost
        times = []
        for _ in range(n):
            t0 = time.monotonic()
            fn()
            times.append(time.monotonic() - t0)
        return min(times)

    # untimed query warmup (reference discipline): first-ever query pays the df
    # memo fill + broadcast codegen once; steady state is what the suite times.
    run_queries(spark, idx, BENCH_QUERIES, k=10).collect()

    # pure-CPU control brackets the query section (VERDICT r3 #2: the r3 query
    # regression was unattributable because no control ran inside bench.py)
    cpu_pre = cpu_control_sec(cpus)

    # ---- query: exact path (all 5 queries in one plan) ----
    timings["bm25_exact_batch"] = best_of(
        2, lambda: run_queries(spark, idx, BENCH_QUERIES, k=10).collect()
    )

    # ---- query: WAND path as shipped (driver-side routing decides) ----
    timings["bm25_wand_batch"] = best_of(
        2, lambda: run_queries_wand(spark, idx, BENCH_QUERIES, k=10).collect()
    )

    # ---- query: WAND pruning machinery, routing bypassed (diagnostic) ----
    timings["bm25_wand_forced"] = best_of(
        2, lambda: run_queries_wand(spark, idx, BENCH_QUERIES, k=10, force_wand=True).collect()
    )

    # ---- WAND pruning effectiveness: deterministic block counts (machine-
    # independent — wall time on this VM swings 2-4x, decoded-block fractions
    # don't). Measured on the SKEWED corpus: the flat synth corpus gives every
    # posting of a term an identical score (tf=1, dl=const), so every block max
    # equals θ and pruning is mathematically impossible there — that regime is
    # what the Σdf router handles. Hot single term at k=10 and selective tail
    # term at k=1 are the regimes block-max pruning exists for.
    skewed = build_index(
        synth_transcripts_skewed(spark, n_convs=n_turns // 20, turns_per_conv=10),
        with_blocks=True,
    )
    skewed.blocks.count()
    wand_stats: dict = {}
    for qname, queries, wk in (
        ("hot_k10", {1: "the"}, 10),
        ("tail_k1", {1: "colbert4"}, 1),
        # MaxScore regime (r3): the rare term drives θ above tmax("the"), so
        # "the" is non-essential and its blocks are decoded only for the
        # θ-filtered candidates — the classic WAND sweet spot.
        ("mixed_rare_hot_k10", {1: "iceberg3 the"}, 10),
    ):
        st: dict = {}
        run_queries_wand(spark, skewed, queries, k=wk, force_wand=True, stats_out=st).collect()
        st.pop("essential_terms", None)
        st.pop("theta", None)
        wand_stats[qname] = st

    # ---- per-query latencies (exact path, one query per plan) — mirrors the
    # reference bench record (performance_test.py:80-91: per-text latencies +
    # avg/median/min/max + success/failure counts) ----
    # two passes, per-query min: the sandbox VM throttles episodically (2-4x on
    # identical jobs), and a single spiked sample would misstate the engine p50.
    lat_ms, ok, failed = [], 0, 0
    for qid, qtext in BENCH_QUERIES.items():
        samples = []
        for _ in range(2):
            t0 = time.monotonic()
            try:
                run_queries(spark, idx, {qid: qtext}, k=10).collect()
            except Exception:
                failed += 1
                samples = []
                break
            samples.append((time.monotonic() - t0) * 1000.0)
        if samples:
            ok += 1
            lat_ms.append(min(samples))
    slat = sorted(lat_ms)
    timings["query_p50"] = slat[len(slat) // 2] / 1000.0 if slat else float("nan")
    cpu_post = cpu_control_sec(cpus)

    # ---- query p50 against the MATERIALIZED index (the real serving path at
    # 10^12 turns: parquet scans with pushed term filters, nothing cached) ----
    import shutil
    import tempfile

    from bge_m3_onnx_spark.plans.checkpoint import load_materialized, materialize_index

    mat_dir = tempfile.mkdtemp(prefix="bench_mat_")
    try:
        materialize_index(spark, transcripts, mat_dir, input_path="synth:bench")
        midx = load_materialized(spark, mat_dir)
        run_queries(spark, midx, BENCH_QUERIES, k=10).collect()  # warm (df memo)
        mlat = []
        for qid, qtext in BENCH_QUERIES.items():
            samples = []
            for _ in range(2):
                t0 = time.monotonic()
                run_queries(spark, midx, {qid: qtext}, k=10).collect()
                samples.append((time.monotonic() - t0) * 1000.0)
            mlat.append(min(samples))
        mlat.sort()
        timings["query_p50_materialized"] = mlat[len(mlat) // 2] / 1000.0
    finally:
        shutil.rmtree(mat_dir, ignore_errors=True)

    total = time.monotonic() - t_all
    out = {
        "metric": "index_build_plus_topk_suite",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / build_sec, 1),
        "n_postings": n_postings,
        "n_blocks": n_blocks,
        "compressed_mb": compressed_mb,
        "compression_ratio": compression_ratio,
        "cpus": cpus,
        # reference-parity fields (performance_test.py:80-91)
        "initialization_time_seconds": round(init_sec, 3),
        "per_text_latencies_ms": [round(x, 1) for x in lat_ms],
        "average_latency_ms": round(sum(lat_ms) / len(lat_ms), 1) if lat_ms else None,
        "median_latency_ms": round(slat[len(slat) // 2], 1) if slat else None,
        "min_latency_ms": round(slat[0], 1) if slat else None,
        "max_latency_ms": round(slat[-1], 1) if slat else None,
        "successful_queries": ok,
        "failed_queries": failed,
        # machine-state control: pure-CPU burn seconds before/after the query
        # section. Compare rounds via (query_sec / cpu_control_sec) when the
        # control itself moved; "stable" means the box didn't shift mid-section.
        "cpu_control_pre_sec": round(cpu_pre, 3),
        "cpu_control_post_sec": round(cpu_post, 3),
        "cpu_control_stable": abs(cpu_pre - cpu_post) / max(cpu_pre, cpu_post) < 0.15,
        "wand_pruning": wand_stats,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
