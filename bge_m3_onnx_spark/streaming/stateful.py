"""Custom stateful streaming operators (SURVEY.md §2.9 extension).

The batch engine sessionizes with a lag+cumsum window (entry.py events slices);
a true stream cannot window over unbounded history, so per-user session state
(last event epoch, running session/event counts) lives in Spark's state store
via ``applyInPandasWithState`` — checkpointed together with the source offsets,
so it survives micro-batch boundaries AND restarts (tests assert both).

Also provides the watermarked tumbling-window aggregation: late events beyond
the watermark are DROPPED by Spark's state eviction — the classic late-data
policy (tests assert a too-late event does not mutate its closed window).

Scale: state is keyed by user_id — hash-partitioned across executors by the
streaming state store; each micro-batch touches only the users present in the
batch. The pandas kernel is vectorized per user-group (numpy over the batch's
events), no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_OUT = StructType(
    [
        StructField("user_id", StringType(), False),
        StructField("n_sessions", IntegerType(), False),
        StructField("n_events", LongType(), False),
        StructField("last_epoch", LongType(), False),
    ]
)

SESSION_STATE = StructType(
    [
        StructField("last_epoch", LongType(), False),
        StructField("n_sessions", IntegerType(), False),
        StructField("n_events", LongType(), False),
    ]
)

_NEG_INF = -(10**15)


def sessionize_stateful(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """user-keyed stateful sessionization: a new session starts at the first
    event ever seen for the user, or when the gap to the previous event exceeds
    ``gap_sec``. Emits one updated (user_id, n_sessions, n_events, last_epoch)
    row per user per micro-batch (output mode: update).

    Equivalent to the batch lag+cumsum sessionizer on the full history — the
    chain ``prev[i] = ts[i-1]`` is carried across batches by the stored
    last_epoch (tests assert equality incl. across a checkpoint restart)."""

    def update(key, pdfs, state: GroupState):
        if state.exists:
            last_epoch, n_sessions, n_events = state.get
        else:
            last_epoch, n_sessions, n_events = _NEG_INF, 0, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            ts = pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64") // 1_000_000_000
            prevs = np.empty_like(ts)
            prevs[0] = last_epoch
            prevs[1:] = ts[:-1]
            n_sessions += int(((ts - prevs) > gap_sec).sum())
            n_events += len(ts)
            last_epoch = int(ts[-1])
        state.update((int(last_epoch), int(n_sessions), int(n_events)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_sessions": [int(n_sessions)],
                "n_events": [int(n_events)],
                "last_epoch": [int(last_epoch)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, SESSION_OUT, SESSION_STATE, "update", GroupStateTimeout.NoTimeout
    )


def tumbling_counts_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts: readStream → withWatermark → windowed
    agg. Events later than the watermark are dropped (their window's state was
    evicted) — asserted in tests by replaying a too-late event."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            F.round("sum_value", 5).alias("sum_value_r"),
        )
    )
