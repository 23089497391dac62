"""As-of join and range join — edge semantics the oracle fixture may not hit:
equal timestamps, no-prior-right rows, key isolation, interval-width guard."""

from __future__ import annotations

from datetime import datetime

import pytest

from bge_m3_onnx_spark.operators.temporal import asof_join, range_join_points


def _ts(m, s=0):
    return datetime(2024, 1, 1, 0, m, s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u", _ts(5)),   # matches right at :05 (equal ts matches)
            (2, "u", _ts(7)),   # matches right at :05 (latest <= :07)
            (3, "u", _ts(1)),   # no prior right -> NULL
            (4, "w", _ts(9)),   # other key: only w's rights considered
        ],
        "event_id int, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", _ts(2), 100), ("u", _ts(5), 200), ("w", _ts(8), 300), ("u", _ts(8), 400)],
        "user_id string, ts timestamp, view_id int",
    )
    res = {
        r["event_id"]: r["asof_view_id"]
        for r in asof_join(left, right, key="user_id", right_cols=["view_id"]).collect()
    }
    assert res == {1: 200, 2: 200, 3: None, 4: 300}


def test_range_join_points_containment_and_guard(spark):
    intervals = spark.createDataFrame(
        [(1, "u", _ts(0), _ts(10)), (2, "u", _ts(20), _ts(21))],
        "iid int, user_id string, start timestamp, end timestamp",
    )
    points = spark.createDataFrame(
        [("u", _ts(0)), ("u", _ts(10)), ("u", _ts(15)), ("u", _ts(20, 30)), ("v", _ts(5))],
        "user_id string, ts timestamp",
    )
    got = {}
    for r in range_join_points(intervals, points, key="user_id", bucket_sec=60).collect():
        got.setdefault(r["iid"], 0)
        got[r["iid"]] += 1
    # interval 1: inclusive bounds catch :00 and :10, not :15; "v" point excluded
    assert got == {1: 2, 2: 1}

    wide = spark.createDataFrame(
        [(9, "u", _ts(0), datetime(2024, 3, 1))], "iid int, user_id string, start timestamp, end timestamp"
    )
    with pytest.raises(ValueError):
        range_join_points(wide, points, key="user_id", bucket_sec=60, max_buckets=10)


def test_rollup_levels_must_nest(spark):
    from bge_m3_onnx_spark.operators.temporal import rollup_hierarchy

    ev = spark.createDataFrame([(_ts(1), 1.0)], "ts timestamp, value double")
    with pytest.raises(ValueError):
        rollup_hierarchy(ev, levels_sec=[60, 90])  # 90 not a multiple of 60
    levels = {r["level_sec"] for r in rollup_hierarchy(ev, levels_sec=[60, 120]).collect()}
    assert levels == {60, 120}


def test_asof_join_string_tiebreak(spark):
    """ADVICE r3: a non-numeric tiebreak column used to be cast("long") → NULL
    for every row, silently reinstating arrival-order nondeterminism. The
    tiebreak now orders in the column's own type: among right rows sharing
    (key, ts), the greatest string id must win, deterministically."""
    left = spark.createDataFrame([(1, "u", _ts(5))], "event_id int, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("u", _ts(5), "view-a"), ("u", _ts(5), "view-c"), ("u", _ts(5), "view-b")],
        "user_id string, ts timestamp, view_id string",
    )
    for _ in range(3):
        res = asof_join(
            left, right, key="user_id", right_cols=["view_id"], tiebreak="view_id"
        ).collect()
        assert [r["asof_view_id"] for r in res] == ["view-c"]
