from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bge_m3_onnx_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="engine-tests",
        master="local[8]",
        shuffle_partitions=4,
        extra_conf={
            # tiny fixtures: keep plans lean — fixed small shuffle width beats AQE's
            # extra query-stage materialization at this scale
            "spark.sql.adaptive.enabled": "false",
            "spark.sql.autoBroadcastJoinThreshold": str(8 * 1024 * 1024),
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_transcripts(spark):
    from bge_m3_onnx_spark.sources.transcripts import synth_transcripts

    return synth_transcripts(spark, n_convs=20, turns_per_conv=10).persist()


@pytest.fixture(scope="session")
def small_transcripts(spark):
    from bge_m3_onnx_spark.sources.transcripts import synth_transcripts

    return synth_transcripts(spark, n_convs=500, turns_per_conv=10).persist()


# Reference-style query set (FIXTURES.md §2): single-term, multi-term, hot-only,
# hot+rare, absent term, multilingual, symbols, empty.
QUERY_SET: dict[int, str] = {
    1: "spark",
    2: "shuffle partition index",
    3: "the",
    4: "the varbyte",
    5: "zzz-not-in-corpus",
    6: "Русский 中文",
    7: "numbers: 12345 !@#$",
    8: "",
    9: "bm25 score rank query",
    10: "checkpoint lineage snapshot iceberg",
    11: "duplicate shared text across conversations",
    12: "SPARK Shuffle",  # case-folding
    13: "merge merge merge",  # repeated query term collapses
}


@pytest.fixture(scope="session")
def query_set():
    return dict(QUERY_SET)
