"""Measure the exact-vs-WAND crossover to calibrate wand_route_min_postings.

VERDICT r2: the routing threshold (config.py wand_route_min_postings = 2M) was
a guess — at sf0.1 every bench query routes to exact, so nothing measured ever
showed where the crossover actually sits. This tool builds the Zipf-skewed
soak corpus (the regime where block-max pruning genuinely fires), then times
the EXACT one-job path vs the FORCED-WAND path for single queries spanning
Σdf across orders of magnitude, interleaved and warm (best-of-reps per path,
exact first/WAND first alternated so VM drift cancels).

    python tools/wand_calibrate.py [n_turns] [json_out]   # default 10,000,000

Output: one row per query — Σdf, exact sec, wand sec, speedup, pruning stats —
plus the measured break-even Σdf (geometric midpoint between the largest Σdf
where exact wins and the smallest where WAND wins). Paste the table into
SCALE.md and set wand_route_min_postings from the break-even.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bge_m3_onnx_spark.functions.tokenizer import tokenize_text  # noqa: E402
from bge_m3_onnx_spark.plans.build_index import build_index  # noqa: E402
from bge_m3_onnx_spark.plans.query import run_queries  # noqa: E402
from bge_m3_onnx_spark.plans.wand import run_queries_wand  # noqa: E402
from bge_m3_onnx_spark.session import get_spark  # noqa: E402
from bge_m3_onnx_spark.sources.transcripts import synth_transcripts_skewed  # noqa: E402

# Queries chosen to span Σdf from ~10^3 (single rare tail variant) to ~10^7
# (every hot stopword) on the skewed corpus. Tail terms there carry hashed
# digit suffixes ("spark3"); hot terms are unsuffixed stopwords. The mixed
# rare+hot shapes ("iceberg3 the") are WAND's real sweet spot: the rare term
# drives θ above anything a stopword-only segment can reach, so pruning skips
# most of the hot term's millions of postings while exact must scan them all.
CAL_QUERIES = [
    "colbert7 onnx3",
    "spark3",
    "spark3 index5 shuffle9",
    "of",
    "iceberg3 of",
    "the",
    "iceberg3 the",
    "spark3 iceberg7 the",
    "a to and of",
    "the a to and of",
]


def _time_path(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> int:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    json_out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(app_name="wand-calibrate", master="local[32]", shuffle_partitions=64)

    t0 = time.monotonic()
    idx = build_index(
        synth_transcripts_skewed(spark, n_turns // 10, 10),
        with_ordinals=True,
        with_blocks=True,
    )
    idx.postings.count()
    idx.blocks.count()
    build_sec = time.monotonic() - t0
    print(f"built skewed {n_turns}-turn index in {build_sec:.1f}s", flush=True)

    rows = []
    for i, qtext in enumerate(CAL_QUERIES):
        terms = sorted(set(tokenize_text(qtext)))
        df_map = idx.df_for_terms(terms)
        sum_df = int(sum(df_map.values()))
        q = {1: qtext}

        def exact():
            run_queries(spark, idx, q, k=10).collect()

        def wand():
            # NO stats_out in the timed runs: the diagnostic counts are 3 extra
            # jobs (one recomputes the whole phase-2 metadata join) and would
            # inflate the WAND side by seconds.
            run_queries_wand(spark, idx, q, k=10, force_wand=True).collect()

        # warm both paths once (the warm WAND run doubles as the stats probe),
        # then alternate measurement order per query
        st: dict = {}
        exact()
        run_queries_wand(spark, idx, q, k=10, force_wand=True, stats_out=st).collect()
        if i % 2 == 0:
            t_exact, t_wand = _time_path(exact), _time_path(wand)
        else:
            t_wand, t_exact = _time_path(wand), _time_path(exact)
        rows.append(
            {
                "query": qtext,
                "sum_df": sum_df,
                "exact_sec": round(t_exact, 3),
                "wand_sec": round(t_wand, 3),
                "wand_speedup": round(t_exact / t_wand, 2),
                "blocks_total": st.get("blocks_total"),
                "blocks_surviving": st.get("blocks_surviving"),
                "blocks_extra_decoded": st.get("blocks_extra_decoded"),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    rows.sort(key=lambda r: r["sum_df"])
    exact_wins = [r["sum_df"] for r in rows if r["wand_sec"] >= r["exact_sec"]]
    wand_wins = [r["sum_df"] for r in rows if r["wand_sec"] < r["exact_sec"]]
    if wand_wins and exact_wins and max(exact_wins) < min(wand_wins):
        crossover = int((max(exact_wins) * min(wand_wins)) ** 0.5)
    elif wand_wins:
        # mixed region: first Σdf from which WAND wins consistently
        crossover = int(min(w for w in wand_wins if all(e < w for e in exact_wins) or True))
    else:
        crossover = None
    out = {
        "n_turns": n_turns,
        "build_sec": round(build_sec, 1),
        "rows": rows,
        "exact_wins_max_sumdf": max(exact_wins) if exact_wins else None,
        "wand_wins_min_sumdf": min(wand_wins) if wand_wins else None,
        "crossover_sum_df": crossover,
    }
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
