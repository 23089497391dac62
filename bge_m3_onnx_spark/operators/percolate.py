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


def rarest_terms_df(saved: DataFrame, term_df: DataFrame) -> DataFrame:
    """(query_id, term): each saved query's lowest-df term, df from the
    index's term relation (term, df). Terms absent from the index get df 0 —
    they are the rarest possible (the query can then match nothing, which the
    candidate join discovers for free). Ties break on term for determinism."""
    joined = saved.select("query_id", "term").join(
        term_df.select("term", "df"), "term", "left"
    ).withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
    w_rank = F.struct(F.col("df"), F.col("term"))
    return (
        joined.groupBy("query_id")
        .agg(F.min(w_rank).alias("m"))
        .select("query_id", F.col("m.term").alias("term"))
    )


def percolate(
    doc_tokens: DataFrame,
    saved: DataFrame,
    conjunctive: bool = True,
    rarest: DataFrame | None = None,
) -> DataFrame:
    """doc_tokens (doc_id, term) × saved (query_id, term, n_terms) →
    (doc_id, query_id, n_matched). AND semantics requires every query term in
    the doc; OR keeps any overlap. Duplicate doc tokens are deduped so
    n_matched counts distinct terms.

    ``rarest`` (conjunctive only): (query_id, term) — each query's lowest-df
    term, from :func:`rarest_terms_df`. The r3 1M-doc × 10k-query run
    (PERCOLATE_SCALE_r03.json) spent 97% of its time hash-aggregating 6.77M
    (doc, query) match rows because hot-term saved queries each touch df(term)
    docs — the agg volume is Σ_q Σ_{t∈q} df(t). With rarest-term candidate
    generation a doc becomes a candidate for q only via q's RAREST term (sound
    for AND: a doc missing the rarest term can't match), and verification is
    one candidate-bounded join against per-doc term sets — volume drops to
    Σ_q df(rarest(q)), orders of magnitude less on hot-term workloads.

    The verification deliberately avoids both a per-(doc, query, term) row
    blowup and any broadcast of a distributed intermediate: doc term-SETS are
    aggregated once (one shuffle of the probe tokens, amortizable across
    batches), candidates join them on doc_id, and the match count is
    ``size(array_intersect(doc_terms, query_terms))`` with the per-query term
    array broadcast from the tiny saved relation. At 10^5 saved queries the
    saved/qarr relations stay broadcast-sized while candidates shuffle only
    Σ_q df(rarest(q)) rows.
    """
    if not conjunctive:
        # OR (r5, VERDICT r4 #6): the r3/r4 plan deduped (doc, term) with a
        # distinct() whose hash shuffle SCATTERS a doc's tokens across
        # partitions, so the (doc, query) hash agg got no map-side combine and
        # shuffled every matched (doc, query, term) triple — Σ_q Σ_{t∈q} df(t)
        # rows (~billions on hot-vocab workloads; 97% of r3's wall time).
        # Restructure so all of a doc's evidence is doc-local BEFORE query
        # fan-out: (1) filter raw tokens to the saved vocabulary (broadcast
        # semi-join — volume Σ_{t∈vocab} ctf(t), counted once per DISTINCT
        # term, not once per query containing it), (2) one doc_id-keyed agg
        # into per-doc matched-term sets, (3) explode + broadcast term→query
        # join + count. After (2) a doc's rows live in one partition, so the
        # count's partial aggregation collapses every (doc, query) duplicate
        # map-side and the final shuffle is match-output-sized. Per-query OR
        # match sets are inherently Σ-df-sized; this makes the COMPUTE
        # output-bound instead of triple-shuffle-bound.
        vocab = saved.select("term").distinct()
        doc_sets = (
            doc_tokens.select("doc_id", "term")
            .join(F.broadcast(vocab), "term")
            .groupBy("doc_id")
            .agg(F.collect_set("term").alias("dts"))
        )
        return (
            doc_sets.select("doc_id", F.explode("dts").alias("term"))
            .join(F.broadcast(saved.select("term", "query_id")), "term")
            .groupBy("doc_id", "query_id")
            .agg(F.count("*").cast("int").alias("n_matched"))
        )
    toks = doc_tokens.select("doc_id", "term").distinct()
    if conjunctive and rarest is not None:
        cands = toks.join(F.broadcast(rarest), "term").select("doc_id", "query_id")
        doc_terms = toks.groupBy("doc_id").agg(F.collect_set("term").alias("dts"))
        qarr = saved.groupBy("query_id").agg(
            F.collect_set("term").alias("qts"), F.max("n_terms").alias("__need")
        )
        return (
            cands.join(doc_terms, "doc_id")
            .join(F.broadcast(qarr), "query_id")
            .select(
                "doc_id",
                "query_id",
                F.size(F.array_intersect("dts", "qts")).alias("n_matched"),
                "__need",
            )
            .filter(F.col("n_matched") == F.col("__need"))
            .drop("__need")
        )
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
