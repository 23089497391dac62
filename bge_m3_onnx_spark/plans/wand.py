"""Block-max WAND query path — lossless pruning, distributed-safe.

Classic BMW is a sequential cursor algorithm; a 1000-executor engine needs a
set-oriented formulation. We use a three-phase DataFrame plan whose pruning rule is
provably safe (rank-identity preserved — tests assert equality with the exact path
on every fixture):

  Phase 1 (θ estimation): decode only the top ``wand_seed_blocks`` blocks per query
    term (by block_max_score), score those postings exactly, and take each query's
    k-th best PARTIAL score as θ. Partial scores are lower bounds of true scores, so
    θ ≤ true k-th best score → safe.

  Phase 2 (block pruning): for a doc in block b of term t to reach the top-k it
    needs  block_max(t, b) + Σ_{t'≠t} max_score(t') ≥ θ  — because every other
    term's contribution is bounded by its global max. Blocks failing this for their
    own term are pruned. Proof of candidate completeness: if score(d) ≥ θ then for
    any query term t with a posting for d,
       block_max(t, b_d) + ub_other(t) ≥ s_t(d) + Σ_{t'≠t} s_{t'}(d) = score(d) ≥ θ,
    so at least one (in fact every) block containing d survives.

  Phase 3 (exact rescore): decode surviving blocks → candidate doc set; rescore
    candidates with FULL postings (semi-join against the postings of the query
    terms) so pruned blocks cannot bite pieces out of surviving docs' scores; then
    the same deterministic top-k window as the exact path.

At scale: phase 1 touches O(|q| · seed_blocks · block_size) postings; phase 2 is a
metadata-only scan of the (term-pruned) blocks table; phase 3 touches only
surviving blocks. Blocks are self-scoring (tf + dl stored — operators/compress.py),
so no phase joins the docs table; only the final k·|q| rows join back for doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bge_m3_onnx_spark.config import DEFAULT_CONFIG, EngineConfig
from bge_m3_onnx_spark.operators.bm25 import bm25_term_score, idf_col, topk
from bge_m3_onnx_spark.operators.compress import decode_blocks
from bge_m3_onnx_spark.plans.build_index import InvertedIndex
from bge_m3_onnx_spark.plans.query import query_terms_df


def _score_decoded(decoded: DataFrame, qt: DataFrame, avgdl: float, cfg: EngineConfig) -> DataFrame:
    """decoded (term, doc_ord, tf, dl) × qt (query_id, term, idf) → per-doc sums."""
    return (
        decoded.join(F.broadcast(qt), "term")
        .select(
            "query_id",
            "doc_ord",
            bm25_term_score(F.col("tf"), F.col("dl"), F.col("idf"), avgdl, cfg).alias("s"),
        )
        .groupBy("query_id", "doc_ord")
        .agg(F.sum("s").alias("score"))
    )


def run_queries_wand(
    spark: SparkSession,
    idx: InvertedIndex,
    queries: dict[int, str],
    k: int | None = None,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    assert idx.blocks is not None, "index has no compressed blocks; build with with_blocks=True"
    cfg = cfg or idx.cfg
    k = k or cfg.default_k

    qt = query_terms_df(spark, queries, cfg)
    qt_stats = qt.join(idx.terms, "term", "inner").select(
        "query_id", "term", idf_col(F.col("df").cast("double"), idx.n_docs).alias("idf")
    )
    qt_stats = qt_stats.persist()

    # blocks restricted to query terms: term predicate prunes the blocks scan
    # (semi-join against a tiny broadcast set → pushed-down isin at the source).
    qterms_only = qt_stats.select("term").distinct()
    qblocks = idx.blocks.join(F.broadcast(qterms_only), "term").persist()

    # per-term global max score (over the query's terms only — tiny)
    tmax = qblocks.groupBy("term").agg(F.max("block_max_score").alias("max_score"))
    # Σ max over each query's terms, and ub_other = Σ − own max
    q_tmax = qt_stats.join(tmax, "term").select("query_id", "term", "max_score")
    q_sum = q_tmax.groupBy("query_id").agg(F.sum("max_score").alias("sum_max"))
    ub_other = q_tmax.join(q_sum, "query_id").select(
        "query_id", "term", (F.col("sum_max") - F.col("max_score")).alias("ub_other")
    )

    # ---- phase 1: θ from seed blocks ----
    w_seed = Window.partitionBy("term").orderBy(F.desc("block_max_score"), F.asc("block_id"))
    seed_blocks = (
        qblocks.withColumn("rk", F.row_number().over(w_seed))
        .filter(F.col("rk") <= cfg.wand_seed_blocks)
        .drop("rk")
    )
    seed_scores = _score_decoded(decode_blocks(seed_blocks), qt_stats, idx.avgdl, cfg)
    w_theta = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_ord"))
    theta = (
        seed_scores.withColumn("rk", F.row_number().over(w_theta))
        .filter(F.col("rk") == k)
        .select("query_id", F.col("score").alias("theta"))
    )

    # ---- phase 2: prune blocks (per query) ----
    per_query_blocks = qblocks.join(ub_other, "term")  # (query_id, term, block columns)
    surviving = per_query_blocks.join(theta, "query_id", "left").filter(
        F.col("theta").isNull()
        | (F.col("block_max_score") + F.col("ub_other") >= F.col("theta"))
    )

    # ---- phase 3: candidates from surviving blocks, exact rescore ----
    survived_distinct = surviving.select(
        "query_id", "term", "block_id", "n", "first_ord", "ords_vb", "tfs_vb", "dls_vb"
    )
    decoded = decode_blocks(
        survived_distinct.select(
            "term", "block_id", "n", "first_ord", "ords_vb", "tfs_vb", "dls_vb"
        ).dropDuplicates(["term", "block_id"])
    )
    candidates = (
        decoded.join(F.broadcast(qt_stats.select("query_id", "term").distinct()), "term")
        .select("query_id", "doc_ord")
        .dropDuplicates(["query_id", "doc_ord"])
    )
    # Exact rescore needs each candidate's postings from ALL query terms, including
    # postings that sit in pruned blocks. block_id = doc_ord // block_range(term) is
    # a pure function, so the exact set of blocks to decode is computable without
    # touching posting data: candidate ords × query terms → needed (term, block_id).
    block_range = F.greatest(
        F.lit(1).cast("long"),
        F.floor(F.lit(int(idx.n_docs) * cfg.block_size) / F.col("df")).cast("long"),
    )
    term_ranges = qt.join(idx.terms, "term").select(
        "term", block_range.alias("block_range")
    ).dropDuplicates(["term"])
    needed = (
        candidates.select("doc_ord").distinct()
        .crossJoin(F.broadcast(term_ranges))
        .select("term", F.floor(F.col("doc_ord") / F.col("block_range")).cast("long").alias("block_id"))
        .dropDuplicates(["term", "block_id"])
    )
    rescore_blocks = qblocks.join(needed, ["term", "block_id"], "left_semi")
    full = decode_blocks(
        rescore_blocks.select("term", "block_id", "n", "first_ord", "ords_vb", "tfs_vb", "dls_vb")
    )
    scored = _score_decoded(
        full.join(candidates.select("doc_ord").distinct(), "doc_ord"), qt_stats, idx.avgdl, cfg
    )
    scored = scored.join(candidates, ["query_id", "doc_ord"], "left_semi")

    # map ordinals back to docIDs (only the scored candidates — small)
    docs = idx.docs.select("doc_id", "doc_ord")
    out = scored.join(docs, "doc_ord").select("query_id", "doc_id", "score")
    result = topk(out, k)
    qt_stats.unpersist()
    qblocks.unpersist()
    return result
