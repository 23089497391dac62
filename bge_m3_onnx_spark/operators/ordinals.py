"""Dense global doc ordinals, scale-safe.

Gap compression needs integer doc ids that are dense and totally ordered. The naive
``row_number() OVER (ORDER BY doc_id)`` funnels 10^12 rows through ONE task, so we
use the classic two-phase trick instead:

1. range-partition by key (sampled boundaries, parallel),
2. count rows per partition → cumulative offsets (a tiny driver-side array),
3. ordinal = offset[partition] + (row_number within partition) − 1.

The result is EXACTLY ``rank by key − 1`` (keys unique), independent of the number of
partitions — which is what lets the DuckDB oracle reproduce it with a plain window
function while our physical plan stays fully parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ordinals(
    df: DataFrame, key: str = "doc_id", out: str = "doc_ord", num_partitions: int | None = None
) -> DataFrame:
    """Add ``out`` = dense 0-based ordinal of ``key`` (keys must be unique)."""
    num_partitions = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(num_partitions, F.col(key))
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    # repartitionByRange orders partitions by key range, so cumulative counts in
    # pid order are the global offsets.
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_expr = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in sorted(offsets)]),
            F.array(*[F.lit(offsets[p]) for p in sorted(offsets)]),
        ),
        F.col("__pid"),
    )
    w = Window.partitionBy("__pid").orderBy(key)
    return (
        with_pid.withColumn(out, (F.row_number().over(w) - 1 + offset_expr).cast("long"))
        .drop("__pid")
    )
