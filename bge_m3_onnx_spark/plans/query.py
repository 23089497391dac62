"""Query plan: query strings → top-k (query_id, rank, doc_id, score).

Exact path (milestone 1): broadcast the (tiny) query-term table against the postings
relation, BM25-score, window top-k. The WAND path (plans/wand.py) must return
rank-identical results — pruning is lossless; tests assert equality on every fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from bge_m3_onnx_spark.config import DEFAULT_CONFIG, EngineConfig
from bge_m3_onnx_spark.functions.tokenizer import tokenize_text
from bge_m3_onnx_spark.operators.bm25 import score_postings, topk
from bge_m3_onnx_spark.plans.build_index import InvertedIndex

QUERY_TERM_SCHEMA = StructType(
    [
        StructField("query_id", IntegerType(), False),
        StructField("term", StringType(), False),
    ]
)


def query_terms_df(
    spark: SparkSession, queries: dict[int, str], cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Tokenize queries ON THE DRIVER (queries are tiny; same tokenizer as documents)
    and emit the distinct (query_id, term) relation."""
    rows = []
    for qid, qtext in queries.items():
        for term in sorted(set(tokenize_text(qtext, cfg.max_tokens, cfg.special_terms))):
            rows.append((int(qid), term))
    return spark.createDataFrame(rows, QUERY_TERM_SCHEMA)


def run_queries(
    spark: SparkSession,
    idx: InvertedIndex,
    queries: dict[int, str],
    k: int | None = None,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    cfg = cfg or idx.cfg
    k = k or cfg.default_k
    qt = query_terms_df(spark, queries, cfg)
    # Query terms are known on the driver — push them into BOTH scans as a literal
    # In() so Parquet partition/row-group pruning fires BEFORE any join (the
    # broadcast join alone leaves the scan with only IsNotNull — EXPLAIN.md).
    # On idx.terms the In() matters just as much: the logical terms relation is an
    # aggregation over the full postings table, and the filter on the grouping key
    # pushes BELOW the aggregate — the df lookup prunes to the query terms instead
    # of re-aggregating the whole index per query (this was the r1 query_p50 cost).
    term_list = sorted(
        {
            t
            for qtext in queries.values()
            for t in tokenize_text(qtext, cfg.max_tokens, cfg.special_terms)
        }
    )
    terms = idx.terms.filter(F.col("term").isin(term_list)) if term_list else idx.terms
    qt_stats = qt.join(terms, "term", "inner")
    postings = idx.postings.filter(F.col("term").isin(term_list)) if term_list else idx.postings
    scored = score_postings(postings, qt_stats, idx.n_docs, idx.avgdl, cfg)
    return topk(scored, k)
