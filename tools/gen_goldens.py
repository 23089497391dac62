"""Freeze oracle outputs for the tiny fixture corpus + query set → tests/golden/.

Mirrors the reference's golden-file discipline
(/root/reference/samples/python/generate_reference_embeddings.py writes
bge_m3_reference_embeddings.json; C#/Java assert against it). Here the pure-Python
oracle is the writer and the Spark engine is the implementation under test
(tests/test_golden.py). Regenerate ONLY when semantics intentionally change:

    python tools/gen_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bge_m3_onnx_spark.session import get_spark  # noqa: E402
from bge_m3_onnx_spark.sources.transcripts import synth_transcripts  # noqa: E402
from tests.conftest import QUERY_SET  # noqa: E402
from tests.oracle import oracle_from_rows  # noqa: E402

GOLDEN_DIR = os.path.join(REPO, "tests", "golden")
N_CONVS, TURNS = 20, 10
K = 10


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    rows = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in synth_transcripts(spark, N_CONVS, TURNS)
        .select("conv_id", "turn_idx", "text")
        .collect()
    ]
    spark.stop()
    rows.sort()
    oracle = oracle_from_rows(rows)

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    topk = {
        str(qid): [
            {"rank": r, "doc_id": d, "score": s} for r, d, s in oracle.topk(q, K)
        ]
        for qid, q in QUERY_SET.items()
    }
    with open(os.path.join(GOLDEN_DIR, "golden_topk.json"), "w") as f:
        json.dump(
            {"corpus": {"n_convs": N_CONVS, "turns": TURNS}, "k": K,
             "n_docs": oracle.n_docs, "avgdl": oracle.avgdl, "topk": topk},
            f, indent=2, ensure_ascii=False,
        )

    postings = sorted(
        (term, doc, tf)
        for term, pl in oracle.postings.items()
        for doc, tf in pl.items()
    )
    with open(os.path.join(GOLDEN_DIR, "golden_postings.json"), "w") as f:
        json.dump(
            {"postings": postings, "dl": dict(sorted(oracle.dl.items()))},
            f, indent=2, ensure_ascii=False,
        )
    print(f"wrote goldens for {oracle.n_docs} docs, {len(postings)} postings, {len(topk)} queries")


if __name__ == "__main__":
    main()
