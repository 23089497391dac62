"""Streaming query serving — a stream of search queries against the static index.

The production shape of this engine is: index built/merged in batch (or via
streaming/incremental.py), then SERVED continuously. Structured Streaming's
stream-static join is the idiomatic Spark form: the query stream is the
streaming side, the (tiny) per-query term relation is derived per micro-batch,
and the static postings relation keeps its batch plan — pushed term filters,
broadcast joins, partial aggregation all still fire inside foreachBatch.

Why foreachBatch rather than a pure stream-static join: BM25 top-k needs a
per-query aggregate + rank window over the candidate set, and arbitrary
aggregates over a stream-static join aren't expressible in one continuous
plan — but inside foreachBatch each micro-batch is a plain DataFrame, so the
EXACT batch query plan (plans/query.py, df-memo literals and all) is reused
verbatim. One code path, two execution modes; results land in a sink table
keyed by (batch_id, query_id).

Scale shape: each micro-batch touches only its queries' terms (pushed In), the
index side is the materialized bucketed layout, and batches are independent —
serving parallelism is horizontal (multiple streams / trigger intervals), state
is zero (the index is immutable per snapshot; swap on merge).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from bge_m3_onnx_spark.plans.build_index import InvertedIndex
from bge_m3_onnx_spark.plans.query import run_queries

QUERY_STREAM_SCHEMA = StructType(
    [
        StructField("query_id", IntegerType(), False),
        StructField("query_text", StringType(), False),
    ]
)


def serve_query_stream(
    spark: SparkSession,
    idx: InvertedIndex,
    query_stream: DataFrame,
    sink: Callable[[DataFrame, int], None],
    k: int = 10,
    checkpoint_dir: str | None = None,
    trigger_once: bool = True,
):
    """Wire a streaming DataFrame of (query_id, query_text) to the batch query
    engine; each micro-batch's top-k lands in ``sink(results, batch_id)``.

    Returns the started StreamingQuery (caller awaits/stops). Queries inside a
    batch are deduplicated by query_id (last text wins — driver-side dict, same
    contract as the batch API).
    """

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.collect()  # micro-batch of QUERIES: tiny by construction
        if not rows:
            return
        queries = {int(r["query_id"]): r["query_text"] for r in rows}
        res = run_queries(spark, idx, queries, k=k).withColumn(
            "batch_id", F.lit(int(batch_id))
        )
        sink(res, batch_id)

    writer = query_stream.writeStream.foreachBatch(on_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
