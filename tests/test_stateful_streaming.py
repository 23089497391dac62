"""applyInPandasWithState sessionization + watermark late-data semantics.

The stateful stream must equal the batch lag+cumsum sessionizer on the same
events — including across a checkpoint RESTART (state store carries last_epoch
between runs). The watermarked tumbling agg must drop a too-late replay."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from bge_m3_onnx_spark.streaming.stateful import sessionize_stateful, tumbling_counts_stream

EVENTS_SCHEMA = StructType(
    [
        StructField("user_id", StringType(), False),
        StructField("event_id", LongType(), False),
        StructField("ts", TimestampType(), False),
        StructField("value", DoubleType(), False),
        StructField("event_type", StringType(), False),
    ]
)


def _synth_events(spark, n_users: int, n_events: int, start_epoch: int, stride: int):
    """Deterministic events: user u gets events at start + i*stride + u*7 with
    occasional >30min gaps (every 5th event jumps 2h) — pure column math."""
    df = spark.range(0, n_users * n_events, 1, 4)
    u = (F.col("id") % n_users).cast("long")
    i = F.floor(F.col("id") / n_users).cast("long")
    epoch = (
        F.lit(start_epoch)
        + i * stride
        + u * 7
        + F.floor(i / 5) * 7200  # a 2h jump before every 5th event → new session
    )
    return df.select(
        F.concat(F.lit("u"), u.cast("string")).alias("user_id"),
        F.col("id").alias("event_id"),
        epoch.cast("timestamp").alias("ts"),
        (F.col("id") % 10).cast("double").alias("value"),
        F.when(u % 2 == 0, "click").otherwise("view").alias("event_type"),
    )


def _batch_sessionize(df, gap_sec=1800):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    flagged = df.withColumn("new_sess", F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0))
    sess = flagged.withColumn(
        "n_sessions", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in sess.groupBy("user_id")
        .agg(F.max("n_sessions").cast("int").alias("n_sessions"), F.count("*").alias("n_events"))
        .collect()
    }


def _last_update_per_user(rows):
    out = {}
    for r in rows:  # counts are monotonic → max n_events is the latest update
        cur = out.get(r["user_id"])
        if cur is None or r["n_events"] > cur[1]:
            out[r["user_id"]] = (r["n_sessions"], r["n_events"])
    return out


def test_stateful_sessionize_across_restart(spark, tmp_path):
    in_dir = str(tmp_path / "ev_in")
    ckpt = str(tmp_path / "ev_ckpt")
    a = _synth_events(spark, n_users=6, n_events=10, start_epoch=1_700_000_000, stride=60)
    a.write.mode("append").parquet(in_dir)

    captured: list = []

    def run():
        # foreachBatch sink: checkpoint-recoverable (memory sink is not)
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(in_dir)
        q = (
            sessionize_stateful(stream, gap_sec=1800)
            .writeStream.foreachBatch(lambda df, bid: captured.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert _last_update_per_user(captured) == _batch_sessionize(a)

    # phase 2: later events land; RESTART from the same checkpoint — the state
    # store must carry last_epoch so sessions continue, not restart at 1.
    b = _synth_events(spark, n_users=6, n_events=10, start_epoch=1_700_000_000 + 50_000, stride=60)
    b = b.withColumn("event_id", F.col("event_id") + 1_000_000)
    b.write.mode("append").parquet(in_dir)
    run()
    got = _last_update_per_user(captured)
    want = _batch_sessionize(a.unionByName(b))
    assert got == want


def test_watermark_drops_too_late_event(spark, tmp_path):
    in_dir = str(tmp_path / "wm_in")
    ckpt = str(tmp_path / "wm_ckpt")
    a = _synth_events(spark, n_users=2, n_events=20, start_epoch=1_700_000_000, stride=300)
    a.write.mode("append").parquet(in_dir)

    def run():
        captured: list = []
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(in_dir)
        q = (
            tumbling_counts_stream(stream, window="1 hour", watermark="30 minutes")
            .writeStream.foreachBatch(lambda df, bid: captured.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return captured

    first = {(r["window_start"], r["event_type"]): r["n"] for r in run()}
    assert first  # some windows aggregated
    earliest = min(k[0] for k in first)

    # a replayed event far older than the watermark (first window) must be
    # DROPPED: its window state was evicted once the watermark passed.
    late = spark.createDataFrame(
        [("u0", 9_999_999, earliest, 1.0, "click")], EVENTS_SCHEMA
    )
    late.write.mode("append").parquet(in_dir)
    updated = {(r["window_start"], r["event_type"]): r["n"] for r in run()}
    key = (earliest, "click")
    assert key not in updated or updated[key] == first[key]
