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
    doc_tokens: DataFrame,
    saved: DataFrame,
    conjunctive: bool = True,
    rarest_term: dict[int, str] | None = None,
) -> DataFrame:
    """doc_tokens (doc_id, term) × saved (query_id, term, n_terms) →
    (doc_id, query_id, n_matched). AND semantics requires every query term in
    the doc; OR keeps any overlap. Duplicate doc tokens are deduped so
    n_matched counts distinct terms.

    ``rarest_term`` (conjunctive only): {query_id: its lowest-df term}, df from
    the index's term relation (driver-known). The r3 1M-doc × 10k-query run
    (PERCOLATE_SCALE_r03.json) spent 97% of its time hash-aggregating 6.77M
    (doc, query) match rows because hot-term saved queries each touch df(term)
    docs — the agg volume is Σ_q Σ_{t∈q} df(t). With rarest-term candidate
    generation, a doc becomes a candidate for q only via q's RAREST term
    (sound for AND: a doc missing the rarest term can't match), then the
    remaining terms are verified by one more broadcast join — volume drops to
    Σ_q df(rarest(q)) · |q|, orders of magnitude less on hot-term workloads.
    """
    toks = doc_tokens.select("doc_id", "term").distinct()
    if conjunctive and rarest_term:
        # one term can be the rarest of several queries → term → array<qid>;
        # explode(element_at(...)) is the broadcast join against this
        # driver-known relation with no exchange (same trick as plans/wand.py)
        by_term: dict[str, list[int]] = {}
        for qid, t in rarest_term.items():
            by_term.setdefault(t, []).append(int(qid))
        rare_map = F.create_map(
            *[
                x
                for t, qs in sorted(by_term.items())
                for x in (F.lit(t), F.array(*[F.lit(q) for q in sorted(qs)]))
            ]
        )
        cands = toks.select(
            "doc_id", F.explode(F.element_at(rare_map, F.col("term"))).alias("query_id")
        )
        # verify: candidate (doc, query) must match ALL of the query's terms —
        # the same agg as the plain path, but over candidate-bounded input
        cand_terms = cands.join(F.broadcast(saved), "query_id")
        pairs = (
            toks.join(F.broadcast(cand_terms), ["doc_id", "term"])
            .groupBy("doc_id", "query_id")
            .agg(
                F.count("*").cast("int").alias("n_matched"),
                F.max("n_terms").alias("__need"),
            )
            .filter(F.col("n_matched") == F.col("__need"))
        )
        return pairs.drop("__need")
    pairs = (
        toks.join(F.broadcast(saved), "term")
        .groupBy("doc_id", "query_id")
        .agg(
            F.count("*").cast("int").alias("n_matched"),
            F.max("n_terms").alias("__need"),
        )
    )
    if conjunctive:
        pairs = pairs.filter(F.col("n_matched") == F.col("__need"))
    return pairs.drop("__need")
