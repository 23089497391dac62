"""Dump .explain('formatted') for every query path touched in the r6
optimization round → plans/r06/<name>_<suffix>.txt.

Run from the round-start worktree with suffix 'before' and from the optimized
tree with suffix 'after'; the judge diffs the pairs against the claims in
OPTIMIZATION_r06.md.

Usage: python tools/r06_plans.py <out_dir> <suffix>
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bge_m3_onnx_spark.plans.checkpoint import load_materialized, materialize_index  # noqa: E402
from bge_m3_onnx_spark.plans.query import run_queries  # noqa: E402
from bge_m3_onnx_spark.plans.wand import run_queries_wand  # noqa: E402
from bge_m3_onnx_spark.plans.build_index import build_index  # noqa: E402
from bge_m3_onnx_spark.session import get_spark  # noqa: E402
from bge_m3_onnx_spark.sources.transcripts import synth_transcripts  # noqa: E402

BATCH = {1: "spark shuffle partition", 2: "the index", 3: "varbyte block compress score"}


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name: str, text: str) -> None:
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)

    idx = build_index(synth_transcripts(spark, 2000, 10), with_blocks=True)
    idx.postings.count(); idx.blocks.count()

    # ---- build-side plans (r6 session 2: ordinal window width, docs-light,
    # Arrow tokenizer kernels, narrowed block-encode input) ----
    import pyspark.sql.functions as F  # noqa: E402
    from bge_m3_onnx_spark.operators import postings as P  # noqa: E402
    from bge_m3_onnx_spark.operators.compress import build_blocks as _bb  # noqa: E402
    from bge_m3_onnx_spark.operators.ordinals import assign_dense_ordinals_with_aggs  # noqa: E402

    src = synth_transcripts(spark, 2000, 10)
    counted = P.counted_docs(src)
    light = P.doc_len_docs(src)
    try:
        from bge_m3_onnx_spark.sources.transcripts import doc_id_col

        counted2, n, aggs, docs_rel = assign_dense_ordinals_with_aggs(
            counted, "doc_id", "doc_ord",
            extra_aggs=[F.sum("dl").alias("sum_dl")], stats_df=light,
            attach_to=light, key_df=src.select(doc_id_col().alias("doc_id")),
        )
    except TypeError:  # round-start signature (no attach_to/key_df)
        counted2, n, aggs = assign_dense_ordinals_with_aggs(
            counted, "doc_id", "doc_ord",
            extra_aggs=[F.sum("dl").alias("sum_dl")], stats_df=light,
        )
        docs_rel = P.doc_stats(counted2)
    sum_dl = sum(r["sum_dl"] or 0 for r in aggs)
    posting_lineage = P.postings_from_counted(counted2)
    dump("build_postings", fmt(posting_lineage))
    dump("build_docs", fmt(docs_rel))
    dump("build_blocks", fmt(_bb(posting_lineage, P.term_stats(posting_lineage), n, sum_dl / max(n, 1))))

    dump("bm25_exact_single", fmt(run_queries(spark, idx, {1: BATCH[1]}, k=10)))
    dump("bm25_exact_batch", fmt(run_queries(spark, idx, BATCH, k=10)))
    dump("bm25_conjunctive", fmt(run_queries(spark, idx, BATCH, k=10, conjunctive=True)))

    # forced-WAND pre-checkpoint plans via the capture hook
    st: dict = {"capture_plans": True}
    run_queries_wand(spark, idx, {1: BATCH[1]}, k=10, force_wand=True, stats_out=st).collect()
    dump("wand_forced_surviving", st.get("plan_surviving", "(not captured)"))
    dump("wand_forced_final", st.get("plan_final", "(not captured)"))

    # materialized-index exact query (bucket-pruned parquet scan)
    idx_dir = "/tmp/r06_plans_idx_" + suffix
    if not os.path.exists(os.path.join(idx_dir, "stats.json")):
        materialize_index(
            spark, synth_transcripts(spark, 2000, 10), idx_dir, input_path="synth:r06plans"
        )
    midx = load_materialized(spark, idx_dir)
    dump("bm25_exact_materialized", fmt(run_queries(spark, midx, {1: BATCH[1]}, k=10)))

    spark.stop()
    print(f"plans written to {out_dir} (*_{suffix}.txt)")


if __name__ == "__main__":
    main()
