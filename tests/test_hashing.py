"""Pin the pure-Python XXH64 twin against Spark's xxhash64 expression.

The materialized-index bucket pruning (plans/query.py) relies on
functions/hashing.py producing EXACTLY Spark's hash for every term — a drift
would silently prune the wrong partitions and drop postings from query results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bge_m3_onnx_spark.functions.hashing import term_bucket, xxhash64
from bge_m3_onnx_spark.sources.transcripts import _HOT_TERMS, _TAIL_TERMS

CASES = (
    _HOT_TERMS
    + _TAIL_TERMS
    + [f"{t}{d}" for t in _TAIL_TERMS[:6] for d in range(16)]  # skewed-corpus suffixed vocab
    + ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh"]
    + ["x" * n for n in range(1, 41)]  # every length class incl. >=32-byte stripes
    + ["中文", "Русский", "العربية", "emoji \U0001f600", "mixed 中文 ascii"]
)


@pytest.mark.usefixtures("spark")
def test_xxhash64_matches_spark(spark):
    rows = spark.createDataFrame([(s,) for s in CASES], "s string").select(
        "s", F.xxhash64("s").alias("h"), F.pmod(F.xxhash64("s"), F.lit(16)).alias("b")
    ).collect()
    for r in rows:
        assert xxhash64(r["s"].encode("utf-8")) == r["h"], r["s"]
        assert term_bucket(r["s"], 16) == r["b"], r["s"]
