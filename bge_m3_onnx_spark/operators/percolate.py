"""Percolator — reverse search: which SAVED queries match an incoming doc?

The ES percolator primitive, and the alerting shape for transcript pipelines
("tell me when a conversation mentions X and Y"): queries are the indexed
relation, documents are the probe. The saved-query relation (query_id, term,
n_terms) is tiny and broadcast; matching is the conjunctive-BM25 trick
transposed — join doc tokens to query terms, count distinct matched terms per
(doc, query), keep pairs where the count reaches the query's term count (AND)
or 1 (OR).

Scale shape: the probe side streams (one tokenize pass, distinct (doc, term)
pairs); the join is broadcast (saved queries ≪ corpus); the per-(doc, query)
count is one partial+final hash agg bounded by matches, not by |docs|×|queries|.
Composes with streaming/serving.py's foreachBatch for continuous alerting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bge_m3_onnx_spark.config import DEFAULT_CONFIG, EngineConfig
from bge_m3_onnx_spark.functions.tokenizer import tokenize_text


def saved_queries_df(
    spark: SparkSession, queries: dict[int, str], cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """(query_id, term, n_terms) — tokenized on the driver with the engine
    tokenizer (queries are tiny), n_terms = the query's distinct term count."""
    rows = []
    for qid, qtext in queries.items():
        terms = sorted(set(tokenize_text(qtext, cfg.max_tokens, cfg.special_terms)))
        rows.extend((int(qid), t, len(terms)) for t in terms)
    return spark.createDataFrame(rows, "query_id int, term string, n_terms int")


def percolate(
    doc_tokens: DataFrame, saved: DataFrame, conjunctive: bool = True
) -> DataFrame:
    """doc_tokens (doc_id, term) × saved (query_id, term, n_terms) →
    (doc_id, query_id, n_matched). AND semantics requires every query term in
    the doc; OR keeps any overlap. Duplicate doc tokens are deduped so
    n_matched counts distinct terms."""
    pairs = (
        doc_tokens.select("doc_id", "term")
        .distinct()
        .join(F.broadcast(saved), "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count("*").cast("int").alias("n_matched"),
            F.max("n_terms").alias("__need"),
        )
    )
    if conjunctive:
        pairs = pairs.filter(F.col("n_matched") == F.col("__need"))
    return pairs.drop("__need")
