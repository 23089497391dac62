"""spark-submit entrypoint: build / query / bench the index from the command line.

North rule: "runs via spark-submit --py-files on a multi-executor cluster". Package
the engine and submit:

    python tools/make_pyfiles_zip.py                     # → dist/engine.zip
    spark-submit --py-files dist/engine.zip -m bge_m3_onnx_spark.cli ...  # or:
    spark-submit --py-files dist/engine.zip cli_main.py build \
        --input /path/transcripts --index /path/index --buckets 64
    spark-submit --py-files dist/engine.zip cli_main.py query \
        --index /path/index --topk 10 --wand "shuffle partition skew"

In local mode the same commands run directly: ``python -m bge_m3_onnx_spark.cli ...``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark(args):
    from bge_m3_onnx_spark.session import get_spark

    return get_spark(
        app_name=f"bge-m3-onnx-spark:{args.cmd}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )


def cmd_build(args) -> int:
    from bge_m3_onnx_spark.plans.checkpoint import materialize_index
    from bge_m3_onnx_spark.sources.transcripts import read_transcripts, synth_transcripts

    spark = _spark(args)
    if args.synth_turns:
        transcripts = synth_transcripts(spark, n_convs=max(1, args.synth_turns // 10))
        input_desc = f"synth:{args.synth_turns}"
    else:
        transcripts = read_transcripts(spark, args.input, fmt=args.format, snapshot_id=args.snapshot_id)
        input_desc = args.input
    t0 = time.monotonic()
    ran: list[str] = []
    man = materialize_index(
        spark,
        transcripts,
        args.index,
        input_path=input_desc,
        snapshot_id=args.snapshot_id,
        n_buckets=args.buckets,
        on_stage=ran.append,
    )
    wall = time.monotonic() - t0
    rows = man.stages.get("docs", {}).get("rows", 0)
    # throughput is only meaningful when the build actually ran — a restart that
    # resumes a completed manifest skips every stage (wall ≈ 0)
    print(json.dumps({"built": args.index, "stages": {k: v.get("wall_ms") for k, v in man.stages.items()},
                      "docs": rows, "wall_sec": round(wall, 2),
                      "stages_run": ran, "resumed": not ran,
                      "turns_per_sec": round(rows / wall, 1) if ran and wall > 0 else None}))
    spark.stop()
    return 0


def cmd_query(args) -> int:
    from bge_m3_onnx_spark.plans.checkpoint import load_materialized
    from bge_m3_onnx_spark.plans.query import run_queries
    from bge_m3_onnx_spark.plans.wand import run_queries_wand

    spark = _spark(args)
    idx = load_materialized(spark, args.index)
    queries = {i + 1: q for i, q in enumerate(args.query)}
    t0 = time.monotonic()
    fn = run_queries_wand if args.wand else run_queries
    rows = fn(spark, idx, queries, k=args.topk).collect()
    wall = time.monotonic() - t0
    out = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        out.setdefault(str(r["query_id"]), []).append(
            {"rank": r["rank"], "doc_id": r["doc_id"], "score": round(r["score"], 6)}
        )
    print(json.dumps({"path": "wand" if args.wand else "exact", "latency_sec": round(wall, 3), "results": out}))
    spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bge_m3_onnx_spark")
    p.add_argument("--master", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="materialize the inverted index (resumable)")
    b.add_argument("--input", help="transcripts table path")
    b.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    b.add_argument("--snapshot-id", type=int, default=None)
    b.add_argument("--synth-turns", type=int, default=None, help="use synthetic corpus of N turns")
    b.add_argument("--index", required=True, help="index output directory")
    b.add_argument("--buckets", type=int, default=16)
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="top-k BM25 over a materialized index")
    q.add_argument("--index", required=True)
    q.add_argument("--topk", type=int, default=10)
    q.add_argument("--wand", action="store_true", help="use the block-max WAND path")
    q.add_argument("query", nargs="+", help="query strings")
    q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
