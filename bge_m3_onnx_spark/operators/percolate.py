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


def prefix_terms_df(saved: DataFrame, term_df: DataFrame, min_should_match: int) -> DataFrame:
    """(query_id, term): each saved query's ``n_terms - m + 1`` lowest-df terms.

    The t-occurrence / prefix-filter principle (set-similarity joins; ES uses
    the same idea for ``minimum_should_match`` rewrites): a doc matching
    ≥ m distinct terms of q can miss at most ``n_terms - m`` of them, so it
    must match at least one of q's ``n_terms - m + 1`` rarest terms —
    candidate generation may skip the ``m - 1`` hottest terms per query
    entirely. For ``m = n_terms`` this degenerates to :func:`rarest_terms_df`
    (the conjunctive single-rarest-term trick). Queries with
    ``m > n_terms`` get an EMPTY prefix: they can never match m distinct
    terms, and no candidates is exactly the right answer.

    ``term_df`` is (term, df) from the index (or one agg over the probe
    tokens); absent terms coalesce to df 0. Ties break on term for
    determinism — any valid prefix yields the same verified output.
    """
    from pyspark.sql import Window

    joined = (
        saved.select("query_id", "term", "n_terms")
        .join(term_df.select("term", "df"), "term", "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("df"), F.asc("term"))
    return (
        joined.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= F.col("n_terms") - F.lit(int(min_should_match)) + F.lit(1))
        .select("query_id", "term")
    )


def percolate(
    doc_tokens: DataFrame,
    saved: DataFrame,
    conjunctive: bool = True,
    rarest: DataFrame | None = None,
    min_should_match: int = 1,
    prefix: DataFrame | None = None,
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
    if conjunctive and min_should_match > 1:
        # AND already requires every term; a caller passing m > 1 with
        # conjunctive=True is asking for m-of-n semantics and would silently
        # get AND instead — fail loudly (ADVICE r5).
        raise ValueError(
            "min_should_match > 1 requires conjunctive=False (m-of-n is an OR-family "
            "semantic; conjunctive=True already means m == n_terms)"
        )
    if not conjunctive and min_should_match > 1:
        # minimum_should_match ≥ 2 (the ES percolator semantic): report
        # (doc, query) pairs matching at least m distinct query terms. Full-OR
        # output is inherently Σ_q Σ_{t∈q} df(t) pairs (measured 1.02B at
        # 1M docs × 10k queries — the OUTPUT is the cost); with m ≥ 2 the
        # prefix filter generates candidates only from each query's
        # n_terms-m+1 RAREST terms (sound — see prefix_terms_df), skipping the
        # m-1 hottest, and verification recomputes the TRUE match count as
        # size(array_intersect(doc_terms, query_terms)) so the output is
        # exactly brute-force-equal. Candidate volume: Σ_q Σ_{t∈prefix(q)}
        # df(t) — on hot-vocab workloads orders of magnitude below full OR.
        if prefix is None:
            raise ValueError(
                "min_should_match > 1 requires prefix=prefix_terms_df(saved, term_df, m)"
            )
        vocab = saved.select("term").distinct()
        # doc term sets restricted to the saved vocabulary (intersection only
        # ever counts query terms, and this keeps the per-doc arrays bounded
        # by |vocab| instead of |doc|)
        toks_v = doc_tokens.select("doc_id", "term").join(F.broadcast(vocab), "term")
        doc_terms = toks_v.groupBy("doc_id").agg(F.collect_set("term").alias("dts"))
        # a doc can be a candidate for q via several prefix terms → dedupe
        cands = (
            toks_v.join(F.broadcast(prefix), "term").select("doc_id", "query_id").distinct()
        )
        qarr = saved.groupBy("query_id").agg(F.collect_set("term").alias("qts"))
        return (
            cands.join(doc_terms, "doc_id")
            .join(F.broadcast(qarr), "query_id")
            .select(
                "doc_id",
                "query_id",
                F.size(F.array_intersect("dts", "qts")).alias("n_matched"),
            )
            .filter(F.col("n_matched") >= F.lit(int(min_should_match)))
        )
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
