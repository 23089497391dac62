"""Two-cluster-size scaling evidence (north rule: ≥0.8 efficiency from N → 4N).

No real cluster exists in this sandbox, so per the task spec we run the SAME build
at two parallelism levels — local[8] (N) and local[32] (4N) — on identical input
and report throughput at both plus scaling efficiency

    eff = throughput(32) / (4 · throughput(8))

Each level runs in its own subprocess (a JVM can't change master in-process).
Writes BENCH/BASELINE.md and prints the JSON summary.

Usage: python tools/scaling_bench.py [n_turns]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from bge_m3_onnx_spark.session import get_spark
from bge_m3_onnx_spark.plans.build_index import build_index
from bge_m3_onnx_spark.plans.query import run_queries
from bge_m3_onnx_spark.sources.transcripts import synth_transcripts

cpus, n_turns = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(app_name=f"scale-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
t = synth_transcripts(spark, n_convs=n_turns // 10, turns_per_conv=10)
t0 = time.monotonic()
idx = build_index(t, with_blocks=True)
idx.postings.count(); idx.blocks.count()
build = time.monotonic() - t0
t0 = time.monotonic()
run_queries(spark, idx, {{1: "spark shuffle partition", 2: "the index",
                         3: "varbyte block compress score"}}, k=10).collect()
q = time.monotonic() - t0
spark.stop()
print(json.dumps({{"cpus": cpus, "build_sec": build, "query_sec": q,
                  "turns_per_sec": n_turns / build}}))
"""


def run_level(cpus: int, n_turns: int) -> dict:
    script = CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(n_turns)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    r8 = run_level(8, n_turns)
    r32 = run_level(32, n_turns)
    eff = r32["turns_per_sec"] / (4 * r8["turns_per_sec"])
    summary = {"n_turns": n_turns, "N=8": r8, "4N=32": r32,
               "scaling_efficiency": round(eff, 3)}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# Scaling evidence — index build at two parallelism levels\n\n"
            "North rule: throughput scaling efficiency >= 0.8 from N to 4N executors.\n"
            "Sandbox has no real cluster; per the task spec the same job runs at two\n"
            "parallelism levels on identical input (deterministic synthetic transcripts).\n\n"
            f"Input: {n_turns} turns (synth_transcripts, seedless deterministic)\n\n"
            "| level | cores | build sec | turns/sec | query batch sec |\n"
            "|---|---|---|---|---|\n"
            f"| N | 8 | {r8['build_sec']:.1f} | {r8['turns_per_sec']:.0f} | {r8['query_sec']:.2f} |\n"
            f"| 4N | 32 | {r32['build_sec']:.1f} | {r32['turns_per_sec']:.0f} | {r32['query_sec']:.2f} |\n\n"
            f"**Scaling efficiency: {eff:.3f}** = turns_per_sec(32) / (4 x turns_per_sec(8))\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
