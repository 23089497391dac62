"""Temporal joins Spark lacks as built-ins: as-of join and interval range join.

Spark's join menu is equi/cross/theta; `l.ts >= r.ts AND l.key = r.key` with
"latest r" semantics (the as-of join of kdb/Pandas merge_asof/DuckDB ASOF) and
interval-containment joins both degenerate to BroadcastNestedLoopJoin or a
per-key explosion if written naively. These are the two compositions the
engine's event/transcript timelines need (attribution, windows-around-errors),
implemented shuffle-once:

* **as-of**: the union-sort trick. Tag right rows 0 and left rows 1, union,
  ONE hash shuffle on the key, sort within partitions by (ts, side), and a
  running `last(right_col, ignorenulls=True)` window fills every left row with
  the latest right row at-or-before it. O(n log n) per key partition, no
  range-join blowup; equal timestamps match (right sorts first via the side
  tag). A pathologically hot key serializes its window into one task — salt by
  coarse time bucket first if a key can hold ~10^9 rows (each bucket seeds from
  the previous bucket's last right row; not needed at transcript-event skew).
* **range join**: interval-containment via bucketing. Intervals explode into
  the coarse time buckets they overlap (bounded by `max_buckets`), points map
  to one bucket, the join is EQUI on (key, bucket) and the exact containment
  predicate filters after. Fan-out = interval_span / bucket_width, chosen to
  match typical spans; the naive theta-join never appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row: the latest right row of the same ``key`` with
    right_ts <= left_ts. Left rows with no prior right row keep NULLs
    (left-outer as-of). Returns left's columns + prefixed right columns.

    When several right rows share (key, right_ts), the winner is the one with
    the greatest ``tiebreak`` column value (a stable hash of the right row when
    not given) — without a final sort key the pick would follow partition
    arrival order and could differ run to run.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    lcols = left.columns
    # Order by the tiebreak column in its OWN type: casting to long would turn
    # a string id into all-NULLs and silently reinstate arrival-order
    # nondeterminism (ADVICE r3). The union's left-side NULL literal takes the
    # same type so both branches agree.
    if tiebreak is not None:
        r_tie = F.col(tiebreak)
        tie_type = right.schema[tiebreak].dataType
    else:
        r_tie = F.xxhash64(*[F.col(c) for c in [*right_cols, right_ts]])
        tie_type = "long"
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tie_type).alias("__tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{prefix}{right_ts}"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != key],
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_tie.alias("__tie"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        F.col(right_ts).alias(f"{prefix}{right_ts}"),
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        "__side",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in [*right_cols, right_ts]
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")


def range_join_points(
    intervals: DataFrame,
    points: DataFrame,
    key: str,
    start_col: str = "start",
    end_col: str = "end",
    ts_col: str = "ts",
    bucket_sec: int = 600,
    max_buckets: int = 1024,
) -> DataFrame:
    """Equi-join reformulation of `p.key = i.key AND i.start <= p.ts <= i.end`.

    Returns intervals' columns + the matching point rows' columns (inner join
    semantics). Intervals longer than ``max_buckets * bucket_sec`` are rejected
    — an unbounded interval would be a fan-out bomb; split such intervals
    upstream.
    """
    s = F.col(start_col).cast("timestamp").cast("double")
    e = F.col(end_col).cast("timestamp").cast("double")
    n_buckets = (F.floor(e / bucket_sec) - F.floor(s / bucket_sec) + 1).cast("int")
    iv = intervals.withColumn("__nb", n_buckets)
    too_wide = iv.filter(F.col("__nb") > max_buckets)
    # driver-side guard: a metadata-only count on the (small) intervals relation
    if too_wide.limit(1).count() > 0:
        raise ValueError(
            f"interval wider than max_buckets*bucket_sec={max_buckets * bucket_sec}s; split upstream"
        )
    iv_b = iv.select(
        *intervals.columns,
        F.explode(
            F.sequence(F.floor(s / bucket_sec).cast("long"), F.floor(e / bucket_sec).cast("long"))
        ).alias("__bucket"),
    )
    p_b = points.withColumn(
        "__bucket", F.floor(F.col(ts_col).cast("timestamp").cast("double") / bucket_sec).cast("long")
    )
    joined = iv_b.join(p_b, [key, "__bucket"]).drop("__bucket")
    return joined.filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )


def rollup_hierarchy(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    levels_sec: list[int] | None = None,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Hypertable-style hierarchical rollup (TimescaleDB continuous-aggregate
    shape): (level_sec, bucket_start, [extra keys], n, sum, min, max) for each
    granularity, where every coarser level re-aggregates the PREVIOUS level —
    the raw relation is scanned exactly once no matter how many levels.

    Only re-aggregable measures ride the hierarchy (count/sum/min/max; avg =
    sum/n downstream). Levels must be ascending and each must divide the next
    (e.g. 60 → 3600 → 86400) or the coarser buckets would straddle finer ones.

    Scale shape: the raw→finest agg is the only pass over the fat relation
    (partial+final hash agg); each further level aggregates the previous
    level's output, which is smaller by the bucket ratio — the whole hierarchy
    costs one fat shuffle plus geometrically-shrinking small ones.
    """
    levels_sec = levels_sec or [60, 3600, 86400]
    extra_keys = extra_keys or []
    for a, b in zip(levels_sec, levels_sec[1:]):
        if b % a != 0:
            raise ValueError(f"level {b}s must be a multiple of level {a}s")

    def bucket(col, width):
        return (F.floor(col.cast("timestamp").cast("double") / width) * width).cast("timestamp")

    finest = levels_sec[0]
    level = (
        events.groupBy(bucket(F.col(ts_col), finest).alias("bucket_start"), *extra_keys)
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
        .withColumn("level_sec", F.lit(finest))
    )
    out = level
    for width in levels_sec[1:]:
        level = (
            level.groupBy(bucket(F.col("bucket_start"), width).alias("bucket_start"), *extra_keys)
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_v").alias("sum_v"),
                F.min("min_v").alias("min_v"),
                F.max("max_v").alias("max_v"),
            )
            .withColumn("level_sec", F.lit(width))
        )
        out = out.unionByName(level)
    return out.select("level_sec", "bucket_start", *extra_keys, "n", "sum_v", "min_v", "max_v")
