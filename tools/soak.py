"""At-scale invariant soak — the checks the small-sf gates cannot see.

The sf0.01/sf0.1 oracle gates verify semantics; tie-boundary float effects,
pruning behavior under real skew, and merge drift only show up at millions of
rows (a 10M-turn soak caught a genuine 1-ulp summation-order rank break that
every small gate passed — SCALE.md "A bug only 10M rows could find"). Run this
once per round after the scorer/WAND/merge code changes:

    python tools/soak.py [n_turns] [json_out]   # default 2,000,000

Checks (each asserts BIT-identical (rank, doc_id, score) between forced-WAND
and the exact path — no rounding):
  1. flat corpus, materialized staged build → load → WAND == exact
  2. Zipf-skewed corpus (real pruning regime) → WAND == exact + pruning stats
  3. incremental merge (5% delta) → WAND == exact post-merge

With ``json_out`` the per-check results (rows compared, pruning stats, wall
times) are written as a JSON artifact (SOAK_r{N}.json per round — VERDICT r2
made the soak a per-round deliverable after it caught the only real bug either
round has seen).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bge_m3_onnx_spark.plans.build_index import build_index  # noqa: E402
from bge_m3_onnx_spark.plans.checkpoint import load_materialized, materialize_index  # noqa: E402
from bge_m3_onnx_spark.plans.query import run_queries  # noqa: E402
from bge_m3_onnx_spark.plans.wand import run_queries_wand  # noqa: E402
from bge_m3_onnx_spark.session import get_spark  # noqa: E402
from bge_m3_onnx_spark.sources.transcripts import (  # noqa: E402
    synth_transcripts,
    synth_transcripts_skewed,
)
from bge_m3_onnx_spark.streaming.incremental import merge_delta  # noqa: E402


def _key(r):
    return (r["query_id"], r["rank"], r["doc_id"], r["score"])


def _assert_identical(spark, idx, queries, label, results: list):
    t0 = time.monotonic()
    e = run_queries(spark, idx, queries, k=10).collect()
    t_exact = time.monotonic() - t0
    st: dict = {}
    t0 = time.monotonic()
    w = run_queries_wand(spark, idx, queries, k=10, force_wand=True, stats_out=st).collect()
    t_wand = time.monotonic() - t0
    assert sorted(map(_key, w)) == sorted(map(_key, e)), f"{label}: WAND != exact (bit compare)"
    pruning = {k: v for k, v in st.items() if k in ("blocks_total", "blocks_surviving", "blocks_extra_decoded")}
    print(f"PASS {label}: WAND == exact bit-identical ({len(e)} rows); pruning {pruning}")
    results.append(
        {
            "check": label,
            "status": "PASS",
            "rows_compared": len(e),
            "exact_sec": round(t_exact, 2),
            "wand_forced_sec": round(t_wand, 2),
            "pruning": pruning,
        }
    )


def main() -> int:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    json_out = sys.argv[2] if len(sys.argv) > 2 else None
    results: list = []
    spark = get_spark(app_name="soak", master="local[32]", shuffle_partitions=64)

    # 1. flat corpus through the FULL staged/materialized path
    mat_dir = tempfile.mkdtemp(prefix="soak_idx_")
    try:
        t0 = time.monotonic()
        materialize_index(
            spark, synth_transcripts(spark, n_turns // 10, 10), mat_dir, input_path="synth:soak"
        )
        t_mat = time.monotonic() - t0
        print(f"materialized {n_turns} turns in {t_mat:.1f}s")
        idx = load_materialized(spark, mat_dir)
        _assert_identical(
            spark,
            idx,
            {1: "spark shuffle partition", 2: "varbyte block compress score", 3: "the"},
            f"flat {n_turns} materialized",
            results,
        )
    finally:
        shutil.rmtree(mat_dir, ignore_errors=True)

    # 2. skewed corpus: the regime where pruning actually fires
    skew = build_index(
        synth_transcripts_skewed(spark, n_turns // 10, 10), with_ordinals=True, with_blocks=True
    )
    _assert_identical(
        spark, skew, {1: "the", 2: "the spark checkpoint", 3: "iceberg"}, f"skewed {n_turns}", results
    )
    for d in (skew.postings, skew.terms, skew.docs, skew.blocks):
        d.unpersist()

    # 3. incremental merge: 5% delta, invariant must survive the block keep/rebuild split
    base = build_index(
        synth_transcripts(spark, n_turns // 10, 10), with_ordinals=True, with_blocks=True
    )
    hi = n_turns // 10 + n_turns // 200
    delta = synth_transcripts(spark, hi, 10).filter(f"conv_id >= 'conv-{n_turns // 10:06d}'")
    merged = merge_delta(spark, base, delta)
    _assert_identical(
        spark, merged, {1: "spark shuffle partition", 2: "the index"}, "post-merge", results
    )

    spark.stop()
    print("SOAK: all invariants hold")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "n_turns": n_turns,
                    "materialize_sec": round(t_mat, 1),
                    "invariant": "forced-WAND == exact, bit-identical (rank, doc_id, score)",
                    "checks": results,
                    "status": "PASS",
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
