"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``bge_m3_onnx_spark.entry`` (one function per operator
slice from SURVEY.md §2 plus the training-data pipeline ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from bge_m3_onnx_spark import entry as _impl  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _impl.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _impl.queries()


def oracle_sql() -> dict[str, str]:
    return _impl.oracle_sql()
