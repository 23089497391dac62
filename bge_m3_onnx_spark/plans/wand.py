"""Block-max WAND query path — lossless pruning, distributed-safe.

Classic BMW is a sequential cursor algorithm; a 1000-executor engine needs a
set-oriented formulation. Three phases, with a provably safe pruning rule
(rank-identity preserved — tests assert equality with the exact path on every
fixture):

  Phase 1 (θ estimation): decode only the top ``wand_seed_blocks`` blocks per query
    term (by block_max_score), score those postings, take each query's top-k docs
    by PARTIAL score, then exact-rescore just those ≤ k·|q| docs (their covering
    blocks are a pure function of the stored block ranges — same trick as phase 3)
    and set θ to the k-th best EXACT score. Safety: the k-th best exact score of
    any k-doc subset is ≤ the true k-th best overall, so θ ≤ true k-th → lossless;
    and exact ≥ partial, so this θ dominates the r1 partial-score θ (which was so
    weak on multi-term queries — θ ≈ best single-term score ≈ Σmax of the other
    term — that the phase-2 bound pruned nothing).

  Phase 2 (block pruning): ordinal-aligned segment bound. Each term's blocks tile
    the doc-ordinal axis (block_id = ord // range_t), so the metadata upper bound
    at ordinal x is s_q(x) = Σ_{t ∈ q} block_max(t, x // range_t) — piecewise
    constant between block starts. A block survives iff a segment it overlaps has
    s_q ≥ θ. Completeness: score(d) ≤ s_q(ord(d)), so a top-k doc's segment clears
    θ and every block containing d overlaps it. This strictly dominates the classic
    block_max(t,b) + Σ_{t'≠t} global_max(t') bound (which prunes nothing when term
    maxima come from docs that cannot co-occur, e.g. short single-term spikes).

  Phase 3 (MaxScore candidates + two-stage exact rescore — r3): partition each
    query's terms by θ: sorted by global max ascending, the maximal prefix whose
    cumulative Σmax stays below θ is NON-ESSENTIAL (those terms alone cannot
    lift any doc to θ — Turtle & Flood's MaxScore, set-oriented). Candidates
    come from ESSENTIAL surviving blocks only; 3a completes candidates'
    essential postings (covering-block decode: block_id = doc_ord //
    block_range(term) is a pure function of stored ranges) and filters on
    s_ess(d) + Σ_{non-ess} tmax ≥ θ; 3b decodes non-essential blocks only for
    the filtered candidates, rescores exactly, then the deterministic top-k
    window. For "rare_term the"-shaped queries this is the difference between
    decoding ~all of "the" and decoding a handful of its blocks: the rare
    term's wide ordinal tiles otherwise carry its high max into every segment.

Driver/executor split: per-query scalars (term maxima, Σmax, θ, essential sets)
are O(|q|·terms) rows — they are COLLECTED to the driver (ONE fused collect, r3)
and re-broadcast as literal relations, so the distributed plan sees only: one
metadata scan with a pushed bound filter, bounded decodes, hash aggregations,
one tiny window. Blocks are self-scoring (tf + dl stored — operators/compress.py),
so no phase joins the docs table; only the final k·|q| rows join back for doc_id.

Routing (r2, calibrated r3): WAND's driver round-trips (2 jobs) only pay off
when pruning skips far more decode work than the round-trips cost. Σ df over the
query terms is known on the driver after the FIRST metadata lookup; below
``cfg.wand_route_min_postings`` the plan delegates to the exact one-job broadcast
path (plans/query.py), which scans those same Σ df postings outright. Stopword
queries at 10^12 scale clear the threshold instantly and take the pruning path.
The threshold comes from tools/wand_calibrate.py's measured exact-vs-WAND
crossover (WAND_CAL_r03.json / SCALE.md).

Phase 3 uses the ``block_range`` stored IN the block rows (not recomputed from
current corpus stats), so blocks written under an older (N, df) — kept across an
incremental merge — still map candidate ordinals to the right block_id.

At 10^12 scale: the blocks scan is term-pruned by the bucketed layout (pushed
isin), phase 1 touches O(|q|·seed_blocks·block_size) postings, phase 3 only
surviving + candidate-covering blocks.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bge_m3_onnx_spark.config import DEFAULT_CONFIG, EngineConfig
from bge_m3_onnx_spark.functions.tokenizer import tokenize_text
from bge_m3_onnx_spark.operators.bm25 import bm25_term_score, idf_col, sum_scores_deterministic, topk
from bge_m3_onnx_spark.operators.compress import decode_blocks
from bge_m3_onnx_spark.plans.build_index import InvertedIndex

_BLOCK_COLS = ["term", "block_id", "n", "first_ord", "ords_vb", "tfs_vb", "dls_vb"]

# Target decoded-postings per task for the post-phase-2 width bump (see the
# decode-volume-aware width note in _run_queries_wand_forced). Module-level so
# experiments/tests can pin it.
_DECODE_ROWS_PER_TASK = 100_000


def _phase2_driver(
    blk_lists: dict[str, list[tuple[int, float]]],
    range_by_term: dict[str, int],
    terms_by_qid: dict[int, list[str]],
    theta: dict[int, float],
    ess_by_qid: dict[int, list[str]],
) -> dict[str, list[int]]:
    """Phase 2 (ordinal-aligned segment pruning) computed on the driver.

    Same semantics as the distributed branch (see the phase-2 comment in
    ``_run_queries_wand_forced``): for each query, candidate boundaries are the
    block starts of its terms; the metadata upper bound at boundary x is
    Σ_t block_max(t, x // range_t) (terms with no block at x contribute 0); a
    segment survives iff its bound clears θ (1e-6 pad — only ADMITS blocks,
    lossless); the surviving block keys are the ESSENTIAL terms' blocks at the
    surviving boundaries, restricted to blocks that exist. Inputs are the rows
    already fused into the θ collect — Σ_t n_blocks(t) metadata rows, gated by
    the caller to stay driver-sized. Term iteration is sorted so the float
    accumulation order is deterministic run-to-run.

    Returns {term: sorted surviving block_ids} unioned across queries."""
    import numpy as np

    arrs: dict[str, tuple] = {}
    for t, pairs in blk_lists.items():
        pairs.sort()
        arrs[t] = (
            np.array([b for b, _ in pairs], dtype=np.int64),
            np.array([m for _, m in pairs], dtype=np.float64),
        )
    keys: dict[str, set] = {}
    for qid, qterms in sorted(terms_by_qid.items()):
        th = theta.get(qid, float("-inf"))
        ts = sorted(t for t in set(qterms) if t in arrs)
        if not ts:
            continue
        xs = np.unique(
            np.concatenate([arrs[t][0] * int(range_by_term[t]) for t in ts])
        )
        s = np.zeros(len(xs), dtype=np.float64)
        for t in ts:
            bids, bms = arrs[t]
            q = xs // int(range_by_term[t])
            pos = np.minimum(np.searchsorted(bids, q), len(bids) - 1)
            s += np.where(bids[pos] == q, bms[pos], 0.0)
        surv_x = xs[s >= th - 1e-6]
        if not len(surv_x):
            continue
        for t in ess_by_qid.get(qid, []):
            if t not in arrs:
                continue
            bids, _ = arrs[t]
            q = np.unique(surv_x // int(range_by_term[t]))
            pos = np.minimum(np.searchsorted(bids, q), len(bids) - 1)
            exist = q[bids[pos] == q]
            keys.setdefault(t, set()).update(int(v) for v in exist)
    return {t: sorted(v) for t, v in keys.items()}


def run_queries_wand(
    spark: SparkSession,
    idx: InvertedIndex,
    queries: dict[int, str],
    k: int | None = None,
    cfg: EngineConfig | None = None,
    force_wand: bool = False,
    stats_out: dict | None = None,
) -> DataFrame:
    """``stats_out`` (diagnostic): when a dict is passed, it is filled with
    {routed, blocks_total, blocks_surviving, blocks_rescored} — deterministic,
    machine-independent evidence of how much the bound pruning skips (the extra
    count jobs only run when requested)."""
    assert idx.blocks is not None, "index has no compressed blocks; build with with_blocks=True"
    cfg = cfg or idx.cfg
    k = k or cfg.default_k

    # idf per (query, term) — tiny, resolved through the index's driver-side df
    # memo (one pruned lookup per new term; free on repeats) and re-injected as
    # literal relations.
    all_qterms = sorted(
        {
            t
            for qtext in queries.values()
            for t in tokenize_text(qtext, cfg.max_tokens, cfg.special_terms)
        }
    )
    df_map = idx.df_for_terms(all_qterms)
    qt_rows = [
        {"query_id": int(qid), "term": t, "df": int(df_map[t])}
        for qid, qtext in queries.items()
        for t in sorted(set(tokenize_text(qtext, cfg.max_tokens, cfg.special_terms)))
        if t in df_map
    ]
    # ---- routing (calibrated, WAND_CAL_r04.json): take the exact one-job plan
    # unless BOTH hold —
    #   (a) Σdf ≥ wand_route_min_postings: below the measured ~10-12M crossover
    #       pruning cannot recoup WAND's machinery constant;
    #   (b) every query in the batch is PRUNABLE-shaped: residual df
    #       (Σdf - heaviest term's df, per query) ≤ 5% of the query's Σdf.
    #       Multi-hot-term queries keep ~73% of blocks above θ at every corpus
    #       size (measured: "a to and of" 0.32x, "the a to and of" 0.13x, and
    #       69k extra non-essential blocks decoded for "spark3 iceberg7 the") —
    #       those shapes NEVER benefit, so Σdf alone must not route them here.
    # (force_wand exists for tests/bench that measure the pruning machinery.)
    def _batch_prunable() -> bool:
        by_q: dict[int, list[int]] = {}
        for r in qt_rows:
            by_q.setdefault(r["query_id"], []).append(r["df"])
        return all(
            sum(dfs) - max(dfs) <= cfg.wand_route_max_residual_frac * sum(dfs)
            for dfs in by_q.values()
            if sum(dfs) > 0
        )

    if not force_wand and (
        sum(r["df"] for r in qt_rows) < cfg.wand_route_min_postings
        or not _batch_prunable()
    ):
        from bge_m3_onnx_spark.plans.query import run_queries

        if stats_out is not None:
            # historical flag: True == "routed AWAY to the exact path";
            # router_choice is the unambiguous spelling (WAND_CAL artifacts)
            stats_out["routed"] = True
            stats_out["router_choice"] = "exact"
        return run_queries(spark, idx, queries, k=k, cfg=cfg)
    if stats_out is not None:
        stats_out["routed"] = False
        stats_out["router_choice"] = "wand"
    # Size EVERY internal shuffle from driver-known Σdf: WAND's phases are
    # metadata-sized jobs, and running their ~dozen shuffles at the session
    # default (e.g. 64) puts hundreds of near-empty tasks on the latency path —
    # measured ~10 s of fixed machinery cost at 100k turns before this. All
    # actions (collects + the eager localCheckpoint) happen inside this
    # function, so a scoped conf set/restore covers the whole plan.
    _old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    # Width from Σdf/1M, not Σdf/100k: WAND's shuffles carry METADATA and
    # PRUNED decode output, which is normally ≪ Σdf — the exact path's
    # rows-per-task model over-parallelizes every tiny stage here (worst case,
    # an unprunable stopword batch, still gets ~1M decoded postings per task).
    try:
        _cap = int(_old_sp)
    except (TypeError, ValueError):
        # AQE-managed runtimes may set this to a non-numeric value ("auto");
        # fall back to the cluster's physical width (ADVICE r3).
        _cap = spark.sparkContext.defaultParallelism
    _need = max(
        1,
        min(_cap, sum(r["df"] for r in qt_rows) // 1_000_000),
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(_need))
    try:
        return _run_queries_wand_forced(
            spark, idx, queries, k, cfg, qt_rows, stats_out
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", _old_sp)


def _run_queries_wand_forced(
    spark: SparkSession,
    idx: InvertedIndex,
    queries: dict[int, str],
    k: int,
    cfg: EngineConfig,
    qt_rows: list[dict],
    stats_out: dict | None,
) -> DataFrame:
    if not qt_rows:
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("query_id", IntegerType()),
                    StructField("rank", IntegerType()),
                    StructField("doc_id", StringType()),
                    StructField("score", DoubleType()),
                ]
            ),
        )
    n, avgdl = idx.n_docs, idx.avgdl
    qt_stats_rows = [(r["query_id"], r["term"], int(r["df"])) for r in qt_rows]
    qterms_list = sorted({t for _, t, _ in qt_stats_rows})

    # ---- driver-known LITERAL relations (r4 machinery-constant cut) ----
    # The r3 event-log profile (WAND_CAL_r03.json) showed the per-batch cost is
    # a ~10-25 s CONSTANT: ~25 broadcast-exchange subjobs (~6 s) + ~4 s of
    # Catalyst planning, invariant to corpus size. Most of those exchanges were
    # tiny createDataFrame sides (query terms, essential sets, per-term ranges)
    # being broadcast-joined. Every one of those relations is already known on
    # the driver, so it is inlined as a map/array literal instead:
    # explode(element_at(map, key)) IS the inner join against a driver-known
    # relation — no exchange, no subjob, and a much smaller plan tree.
    # (Measured anti-optimization note: coalesce(1) on parallelized tiny
    # relations REGRESSED the machinery 3x — literals sidestep that entirely.)
    _terms_by_qid: dict[int, list[str]] = {}
    _qids_by_term: dict[str, list[int]] = {}
    _df_by_term: dict[str, int] = {}
    for _q, _t, _d in qt_stats_rows:
        _terms_by_qid.setdefault(int(_q), []).append(_t)
        _qids_by_term.setdefault(_t, []).append(int(_q))
        _df_by_term[_t] = int(_d)

    def _qids_map_lit(by_term: dict[str, list[int]]):
        return F.create_map(
            *[
                x
                for t, qs in sorted(by_term.items())
                for x in (F.lit(t), F.array(*[F.lit(int(q)) for q in sorted(qs)]))
            ]
        )

    all_qids_map = _qids_map_lit(_qids_by_term)
    # df as a DOUBLE literal per term: idf is then computed with the SAME
    # Spark-side idf_col expression the exact path uses — java.lang.Math.log
    # and Python math.log can disagree at the last ulp, and WAND's
    # rank-identity with the exact plan must not depend on libm flavor.
    df_map_lit = F.create_map(
        *[x for t, d in sorted(_df_by_term.items()) for x in (F.lit(t), F.lit(float(d)))]
    )
    q2terms_lit = F.create_map(
        *[
            x
            for qid, ts in sorted(_terms_by_qid.items())
            for x in (F.lit(int(qid)), F.array(*[F.lit(t) for t in sorted(ts)]))
        ]
    )

    def _score_decoded_lit(decoded: DataFrame, qids_map) -> DataFrame:
        """decoded (term, doc_ord, tf, dl) × literal query-term map → per-doc
        sums, via explode instead of a broadcast join. Summation stays the
        term-sorted deterministic fold shared with the exact path."""
        per_term = decoded.select(
            F.explode(F.element_at(qids_map, F.col("term"))).alias("query_id"),
            "doc_ord",
            "term",
            bm25_term_score(
                F.col("tf"),
                F.col("dl"),
                idf_col(F.element_at(df_map_lit, F.col("term")), n),
                avgdl,
                cfg,
            ).alias("s"),
        )
        return sum_scores_deterministic(per_term, ["query_id", "doc_ord"])

    # blocks restricted to query terms: pushed isin → partition/row-group pruning.
    # Coalesced to the Σdf-sized width (spark.sql.shuffle.partitions was scoped
    # to it by the caller): the source relation keeps the BUILD's partitioning,
    # and without the coalesce every downstream decode/join stage spins that
    # many near-empty tasks — with 4 mapInPandas decodes per query the per-task
    # Python/Arrow round-trips dominated the machinery cost (measured).
    _width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Every persisted frame is registered so an exception anywhere in the
    # phases below cannot leak cached partitions (ADVICE r3); unpersist is
    # idempotent, so the early-exit branches' explicit unpersists are fine.
    _persisted: list[DataFrame] = []
    try:
        # pruned_blocks pushes term IN always, and bucket IN when the index is
        # materialized in the bucketed layout (partition pruning at the scan).
        qblocks = idx.pruned_blocks(qterms_list).coalesce(_width).persist()
        _persisted.append(qblocks)
        # Slim metadata twin of qblocks (no varbyte buffer columns): the phase-1/2
        # machinery makes ~a dozen metadata passes (windows, bounds, surviving
        # keys, broadcast subtrees), and each pass over the buffer-carrying cache
        # paid for deserializing MBs of block payloads to read 4 scalar columns —
        # the event-log profile showed ~25 broadcast subjobs at 0.3-1.2 s each
        # doing exactly that. Decode steps still read qblocks (they need buffers).
        qmeta = (
            idx.pruned_blocks(qterms_list)
            .select("term", "block_id", "block_range", "block_max_score")
            .coalesce(_width)
            .persist()
        )
        _persisted.append(qmeta)

        # Seeds must plausibly contain k strong docs per query or θ collapses to a
        # mid-pack score: the top-k docs concentrate in the top block-max blocks, so
        # decode at least k seed blocks per term (≥1 doc each, typically ~block_size).
        n_seed = max(cfg.wand_seed_blocks, k)
        # ---- phase 1 (fused into ONE driver round-trip — r2 measured ~9 s of fixed
        # machinery cost, much of it driver job latency): seed selection stays
        # DISTRIBUTED (no metadata collect); the only collect is the θ job below,
        # which carries the per-term metadata (global max, block_range) along as
        # tagged rows in the same result.
        # rk=1 row doubles as the per-term global max AND carries the stored
        # block_range (constant within a term) — one pass gives seeds, tmax, ranges.
        # Two-phase (salted) top-S: a 10^12-scale stopword term has millions of
        # block-metadata rows, and a plain partitionBy(term) window would funnel
        # them through ONE task. Phase A takes top-S per (term, salt) — 32-way
        # parallel per term; phase B re-ranks the ≤ 32·S survivors per term.
        # The phase-A pass is SKIPPED when the driver's block estimate (the
        # same order-of-magnitude bound the phase-2 gate uses — see below) says
        # the whole metadata relation is small: w_seed alone computes the
        # identical top-S then, and the salted pre-rank is one whole
        # shuffle+sort of pure overhead per query (r6; same-result proof:
        # phase A only pre-filters rows that cannot be in phase B's top-S).
        _PHASE2_DRIVER_CAP = 200_000
        _est_blocks = sum(
            min(d, -(-n // max(cfg.block_range_for_term(d, n), 1)))
            for d in _df_by_term.values()
        )
        w_seed = Window.partitionBy("term").orderBy(F.desc("block_max_score"), F.asc("block_id"))
        seed_src = qmeta
        # same trust condition as the phase-2 gate: merged uncompacted indexes
        # can hold blocks cut at a smaller stored range than the estimate
        # assumes, so the estimate can undercount — keep the salted pre-rank
        # whenever the estimate is untrustworthy (review finding, r6)
        if _est_blocks > _PHASE2_DRIVER_CAP or idx.merges_since_compaction > 0:
            w_pre = Window.partitionBy("term", "__salt").orderBy(
                F.desc("block_max_score"), F.asc("block_id")
            )
            seed_src = (
                seed_src.withColumn("__salt", F.pmod(F.xxhash64("block_id"), F.lit(32)))
                .withColumn("rk1", F.row_number().over(w_pre))
                .filter(F.col("rk1") <= n_seed)
                .drop("__salt", "rk1")
            )
        seed_sel = (
            seed_src
            .withColumn("rk", F.row_number().over(w_seed))
            .filter(F.col("rk") <= n_seed)
            .select("term", "block_id", "block_range", "block_max_score", "rk")
            .persist()
        )
        _persisted.append(seed_sel)
        ranges_sel = seed_sel.filter(F.col("rk") == 1).select(
            "term",
            F.col("block_range").cast("long").alias("rng"),
            F.col("block_max_score").alias("tmax"),
        )

        # ---- θ from seed candidates, EXACT-rescored ----
        # Partial seed sums pick the candidates; their covering blocks (pure function
        # of the stored ranges, ≤ k·|q|·|terms| blocks) are decoded and the candidates
        # scored exactly. θ = k-th best exact score — a lower bound of the true k-th
        # (k-doc-subset argument) that is dramatically tighter than the r1 partial θ.
        seed_blocks = qblocks.join(
            F.broadcast(seed_sel.select("term", "block_id")), ["term", "block_id"], "left_semi"
        ).select(*_BLOCK_COLS)
        seed_scores = _score_decoded_lit(decode_blocks(seed_blocks), all_qids_map)
        w_theta = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_ord"))
        seed_top = (
            seed_scores.withColumn("rk", F.row_number().over(w_theta))
            .filter(F.col("rk") <= k)
            .select("query_id", "doc_ord")
        )
        seed_needed = (
            # query→terms via literal explode; only the per-term rng (still
            # distributed pre-collect) needs a real broadcast join here
            seed_top.select(
                "doc_ord", F.explode(F.element_at(q2terms_lit, F.col("query_id"))).alias("term")
            )
            .join(F.broadcast(ranges_sel.select("term", "rng")), "term")
            .select(
                "term",
                F.floor(F.col("doc_ord") / F.col("rng")).cast("long").alias("block_id"),
            )
            .dropDuplicates(["term", "block_id"])
        )
        seed_cover = qblocks.join(seed_needed, ["term", "block_id"], "left_semi")
        seed_exact = _score_decoded_lit(decode_blocks(seed_cover.select(*_BLOCK_COLS)), all_qids_map).join(
            seed_top, ["query_id", "doc_ord"], "left_semi"
        )
        # ONE collect for θ AND the per-term metadata (tagged union) — the scalars
        # phases 2-3 need on the driver to build literal map expressions.
        theta_rows = (
            seed_exact.withColumn("rk", F.row_number().over(w_theta))
            .filter(F.col("rk") == k)
            .select(
                F.lit("theta").alias("tag"),
                F.col("query_id").cast("long").alias("qid"),
                F.lit(None).cast("string").alias("term"),
                F.col("score").alias("v1"),
                F.lit(None).cast("long").alias("v2"),
            )
        )
        meta_rows = ranges_sel.select(
            F.lit("meta").alias("tag"),
            F.lit(None).cast("long").alias("qid"),
            "term",
            F.col("tmax").alias("v1"),
            F.col("rng").alias("v2"),
        )
        # ---- driver-side phase 2 gate (r4) ----
        # Phase 2 is pure metadata math over Σ_t n_blocks(t) rows — bounded and
        # driver-estimable BEFORE the collect (df is known; block_range_for_term
        # is the deterministic cut rule; merges can keep older/smaller stored
        # ranges, so this is an order-of-magnitude gate, not an exact count).
        # When it fits, the per-block metadata rides the SAME tagged-union
        # collect as θ and phase 2 runs in NumPy on the driver: the r4 profile
        # showed the distributed phase-2/3 tree cost ~2.9 s of pure Catalyst
        # planning plus ~10 broadcast-exchange subjobs per batch — none of
        # which touches data that isn't already driver-sized.
        # Per-term non-empty block count is bounded by BOTH the postings count d
        # (each non-empty block holds ≥1 posting) and the ordinal-space tiling
        # ceil(n / range) (blocks tile [0, n)). ceil(d / range) alone assumes
        # ~range postings per block and underestimates by ~n/d for mid-frequency
        # terms whose postings are spread one-per-block — at df=10^9 over n=10^12
        # that reads ~8k where the actual count is ~8M, letting the cap pass and
        # the tagged-union collect pull millions of rows to the driver. Merges can
        # keep older (smaller-range) stored blocks, so this stays an
        # order-of-magnitude gate with known slack in that direction.
        # (_est_blocks itself is computed once, above the seed selection, which
        # reuses it to skip the salted pre-rank on small metadata.)
        # Merged indexes can retain blocks cut at a SMALLER stored range than
        # the current cfg predicts, so the tiling bound above can undercount
        # non-empty blocks and let the cap admit oversized collects (ADVICE
        # r5). The distributed phase 2 is lossless and unconditionally safe —
        # take it whenever uncompacted merges make the estimate untrustworthy.
        _driver_phase2 = (
            _est_blocks <= _PHASE2_DRIVER_CAP and idx.merges_since_compaction == 0
        )
        union_rows = theta_rows.unionByName(meta_rows)
        if _driver_phase2:
            block_rows = qmeta.select(
                F.lit("block").alias("tag"),
                F.lit(None).cast("long").alias("qid"),
                "term",
                F.col("block_max_score").alias("v1"),
                F.col("block_id").cast("long").alias("v2"),
            )
            union_rows = union_rows.unionByName(block_rows)
        _t0_theta = time.monotonic()
        collected = union_rows.collect()
        _t_theta = time.monotonic() - _t0_theta
        _t0_final = time.monotonic()
        seed_sel.unpersist()
        theta = {int(r["qid"]): r["v1"] for r in collected if r["tag"] == "theta"}
        tmax = {r["term"]: r["v1"] for r in collected if r["tag"] == "meta"}
        range_by_term = {r["term"]: int(r["v2"]) for r in collected if r["tag"] == "meta"}
        _blk_lists: dict[str, list[tuple[int, float]]] = {}
        if _driver_phase2:
            for r in collected:
                if r["tag"] == "block":
                    _blk_lists.setdefault(r["term"], []).append((int(r["v2"]), float(r["v1"])))

        # ---- phase 2: ordinal-aligned segment pruning (exact, lossless) ----
        # Every term's blocks TILE the doc-ordinal axis (block_id = ord // range), so
        # the tightest metadata upper bound at ordinal x is
        #     s_q(x) = Σ_{t ∈ q} block_max(t, x // range_t)
        # — piecewise constant, changing only at block starts. A block of t survives
        # for q iff some segment it overlaps has s_q ≥ θ_q. This strictly dominates
        # the classic  block_max(t,b) + Σ_{t'≠t} global_max(t')  bound (which prunes
        # NOTHING when per-term maxima come from short spike docs that cannot
        # co-occur: global maxima sum to far above any real doc's score).
        # Safety: score(d) ≤ s_q(ord(d)) for every doc d, so any top-k doc's segment
        # clears θ and every block containing d overlaps that segment.
        # All joins below are EQUI-joins on metadata relations (O(Σ blocks · |q|)):
        # boundaries → active block per (boundary, term) via x // range — no range
        # join, no window, safe for stopword terms with millions of blocks.
        if not tmax:  # no query term has any block → empty result
            qblocks.unpersist()
            qmeta.unpersist()
            return spark.createDataFrame(
                [],
                "query_id int, rank int, doc_id string, score double",
            )
        theta_map = F.create_map(
            *[
                x
                for qid in sorted({q for q, _, _ in qt_stats_rows})
                for x in (F.lit(int(qid)), F.lit(float(theta.get(qid, float("-inf")))))
            ]
        )
        if not _blk_lists:
            range_map = F.create_map(
                *[x for t, r in sorted(range_by_term.items()) for x in (F.lit(t), F.lit(int(r)))]
            )
            block_meta = qmeta.select(
                "term", "block_id", (F.col("block_id") * F.col("block_range")).alias("x"), "block_max_score"
            )
            # distinct segment boundaries per query (starts of any query term's blocks),
            # PRE-FILTERED by the classic bound before the ×|q| fan-out (r2 advisor: a
            # stopword term contributes millions of boundaries, and expanding every one
            # against every query term made the metadata job O(|boundaries|·|q|)).
            # For a boundary x contributed by term t:
            #     s_q(x) ≤ block_max(t, x) + Σ_{t'≠t} global_max(t')   (classic bound)
            # so s_q(x) ≥ θ implies EVERY contributing term's classic bound clears θ —
            # filtering on min(classic) ≥ θ is lossless and removes the fan-out for
            # segments only a weak stopword block opened.
            tmax_map = F.create_map(
                *[x for t, m in sorted(tmax.items()) for x in (F.lit(t), F.lit(float(m)))]
            )
            qsum = {
                qid: sum(tmax.get(t, 0.0) for q2, t, _ in qt_stats_rows if q2 == qid)
                for qid in sorted({q for q, _, _ in qt_stats_rows})
            }
            qsum_map = F.create_map(
                *[x for qid, s in sorted(qsum.items()) for x in (F.lit(int(qid)), F.lit(float(s)))]
            )
            bounds = (
                block_meta.select(
                    "term",
                    "x",
                    "block_max_score",
                    F.explode(F.element_at(all_qids_map, F.col("term"))).alias("query_id"),
                )
                .groupBy("query_id", "x")
                .agg(
                    F.min(
                        F.col("block_max_score")
                        + F.element_at(qsum_map, F.col("query_id"))
                        - F.element_at(tmax_map, F.col("term"))
                    ).alias("classic_bound")
                )
                .filter(F.col("classic_bound") >= F.element_at(theta_map, F.col("query_id")))
                .select("query_id", "x")
            )
            # active block of EVERY query term at each boundary; inner join drops terms
            # with no block there (they contribute 0 to the sum — correct)
            active = (
                bounds.select(
                    "query_id", "x", F.explode(F.element_at(q2terms_lit, F.col("query_id"))).alias("term")
                )
                .select(
                    "query_id",
                    "x",
                    "term",
                    F.floor(F.col("x") / F.element_at(range_map, F.col("term")))
                    .cast("long")
                    .alias("block_id"),
                )
                .join(block_meta.select("term", "block_id", "block_max_score"), ["term", "block_id"])
            )
            surviving_x = (
                active.groupBy("query_id", "x")
                .agg(F.sum("block_max_score").alias("s"))
                .filter(F.col("s") >= F.element_at(theta_map, F.col("query_id")))
            )
        # ---- MaxScore essential-term partition (driver-side, from θ + tmax) ----
        # Sort each query's terms by global max ascending; the maximal prefix whose
        # cumulative Σtmax stays BELOW θ is NON-ESSENTIAL: those terms alone cannot
        # lift any doc to θ, so every top-k doc contains ≥1 essential term.
        # Candidates therefore come from ESSENTIAL surviving blocks only, and
        # non-essential terms are decoded later, only for candidates that can still
        # clear θ. This is what makes mixed rare+hot queries cheap: for
        # "rare_term the", θ (driven by the rare term's idf) exceeds tmax("the"),
        # so "the" is non-essential and its millions of postings are decoded only
        # for the handful of rare-term candidates within reach of θ — the
        # ordinal-tiled segment bound alone cannot do this, because the rare term's
        # wide tiles carry its high max into every segment (measured: 618/682
        # blocks survived for "iceberg3 the"; with MaxScore only the rare term's
        # blocks are candidate sources).
        qids = sorted({q for q, _, _ in qt_stats_rows})
        ess_pairs_rows: list[tuple[int, str]] = []
        ness_pairs_rows: list[tuple[int, str]] = []
        ness_sum: dict[int, float] = {}
        for qid in qids:
            tq = sorted((tmax.get(t, 0.0), t) for q2, t, _ in qt_stats_rows if q2 == qid and t in tmax)
            th = theta.get(qid, float("-inf"))
            cum, n_ness = 0.0, 0
            for m, t in tq:
                if cum + m < th:
                    cum += m
                    n_ness += 1
                else:
                    break
            # ≥1 essential term always: if θ equals Σ tmax (one doc attains every
            # term's max) a one-ulp difference between this ascending Python sum
            # and Spark's deterministic fold could classify EVERY term
            # non-essential, leaving no candidate source and silently returning
            # zero rows (ADVICE r3). Keeping the max-tmax term essential is always
            # sound — MaxScore only requires the non-essential prefix sum < θ.
            if n_ness == len(tq) and tq:
                n_ness -= 1
                cum -= tq[-1][0]
            ness_sum[qid] = cum
            ness_pairs_rows += [(qid, t) for _, t in tq[:n_ness]]
            ess_pairs_rows += [(qid, t) for _, t in tq[n_ness:]]
        ness_map = F.create_map(
            *[x for qid in qids for x in (F.lit(int(qid)), F.lit(float(ness_sum[qid])))]
        )
        # essential/non-essential sets as LITERALS (driver-computed above):
        # term → qids it is essential for; qid → its essential terms; and, with
        # the collected per-term ranges, qid → array<struct<term, rng>> so the
        # covering-block derivations below are pure projections, not joins.
        _ess_by_term: dict[str, list[int]] = {}
        _ess_by_qid: dict[int, list[str]] = {}
        for _q, _t in ess_pairs_rows:
            _ess_by_term.setdefault(_t, []).append(_q)
            _ess_by_qid.setdefault(_q, []).append(_t)
        _ness_by_qid: dict[int, list[str]] = {}
        for _q, _t in ness_pairs_rows:
            _ness_by_qid.setdefault(_q, []).append(_t)
        ess_qids_map = _qids_map_lit(_ess_by_term)

        def _term_rng_map_lit(by_qid: dict[int, list[str]]):
            return F.create_map(
                *[
                    x
                    for qid2, ts in sorted(by_qid.items())
                    for x in (
                        F.lit(int(qid2)),
                        F.array(
                            *[
                                F.struct(
                                    F.lit(t).alias("term"),
                                    F.lit(int(range_by_term[t])).alias("rng"),
                                )
                                for t in sorted(ts)
                                if t in range_by_term
                            ]
                        ),
                    )
                ]
            )

        q2ess_tr_lit = _term_rng_map_lit(_ess_by_qid)
        q2ess_terms_lit = F.create_map(
            *[
                x
                for qid2, ts in sorted(_ess_by_qid.items())
                for x in (F.lit(int(qid2)), F.array(*[F.lit(t) for t in sorted(ts)]))
            ]
        )

        # back to block keys: the boundary x lies in block x // range_t of each
        # ESSENTIAL term (candidate sources; non-essential blocks are never
        # candidate sources — see the MaxScore argument above)
        _full_survival = False
        if _blk_lists:
            # ---- phase 2 on the driver (NumPy over the collected metadata) ----
            # Semantics identical to the distributed branch below: per query,
            # boundaries = block starts of its terms; upper bound at x =
            # Σ_t block_max(t, x // range_t); blocks of ESSENTIAL terms that
            # overlap a surviving segment are candidate sources. The surviving
            # filter carries a 1e-6 pad (admits blocks — lossless; the
            # distributed sum's order is nondeterministic at the same ulp).
            surv_by_term = _phase2_driver(
                _blk_lists, range_by_term, _terms_by_qid, theta, _ess_by_qid
            )
            _n_keys = sum(len(v) for v in surv_by_term.values())
            # Full-survival detection (r6, driver-side — the metadata is already
            # here): when EVERY block of EVERY essential term survived phase 2
            # (the unprunable regime — e.g. forced WAND on a corpus where each
            # block max equals θ), the surviving set is exactly "all blocks of
            # the essential terms", so (a) the block-key filter collapses to a
            # term IN predicate, and (b) downstream, the candidate set equals
            # the decode's own explode pairs and the covering-block completion
            # is empty — three shuffles and two persists become identities and
            # are skipped below.
            _ess_terms_all = sorted(
                {t for ts in _ess_by_qid.values() for t in ts if t in _blk_lists}
            )
            _full_survival = bool(_ess_terms_all) and all(
                len(surv_by_term.get(t, ())) == len(_blk_lists[t])
                for t in _ess_terms_all
            )
            # literal-IN only while the predicate stays small: a measured 15k-key
            # isin (unprunable stopword batch) bloated every task binary to ~1MB
            # and wrecked codegen — past the cap a broadcast semi-join against a
            # driver-built relation is one cheap subjob instead.
            if _full_survival:
                _surv_term_expr = F.col("term").isin(_ess_terms_all)
                surviving = qblocks.filter(_surv_term_expr)

                def _not_surv(df_: DataFrame) -> DataFrame:
                    return df_.filter(~_surv_term_expr)

            elif _n_keys <= 2_000:
                # literal IN-filters on the cached qblocks: no join, no
                # broadcast-exchange subjob, tiny plan tree
                _surv_expr = F.lit(False)
                for _t2, _ids in sorted(surv_by_term.items()):
                    _surv_expr = _surv_expr | (
                        (F.col("term") == F.lit(_t2)) & F.col("block_id").isin(_ids)
                    )
                surviving = qblocks.filter(_surv_expr)

                def _not_surv(df_: DataFrame) -> DataFrame:
                    return df_.filter(~_surv_expr)

            else:
                _sk = spark.createDataFrame(
                    [(t2, int(b2)) for t2, ids2 in sorted(surv_by_term.items()) for b2 in ids2],
                    "term string, block_id long",
                )
                surviving = qblocks.join(F.broadcast(_sk), ["term", "block_id"], "left_semi")

                def _not_surv(df_: DataFrame) -> DataFrame:
                    return df_.join(F.broadcast(_sk), ["term", "block_id"], "left_anti")

        else:
            surviving_keys = (
                surviving_x.select(
                    "x", F.explode(F.element_at(q2ess_terms_lit, F.col("query_id"))).alias("term")
                )
                .select(
                    "term",
                    F.floor(F.col("x") / F.element_at(range_map, F.col("term")))
                    .cast("long")
                    .alias("block_id"),
                )
                .dropDuplicates(["term", "block_id"])
            )
            surviving = qblocks.join(surviving_keys, ["term", "block_id"], "left_semi")

            def _not_surv(df_: DataFrame) -> DataFrame:
                return df_.join(
                    surviving.select("term", "block_id"), ["term", "block_id"], "left_anti"
                )

        # ---- decode-volume-aware width (r6, guide §2.5: partitioning derived
        # from actual data size, not a constant) ----
        # The session width was scoped to Σdf//1M for the METADATA jobs, which
        # is right in the routed regime (tiny decode) but single-threads the
        # unprunable/forced regime, where phase 3 decodes ~every posting of the
        # query terms on 1-3 tasks. After driver-side phase 2 the survival is
        # KNOWN: widen every later exchange to the estimated decode volume and
        # spread the surviving block rows to match (block rows are ~KB — the
        # repartition moves metadata+payload once, then decode/score run wide).
        if _blk_lists:
            if _full_survival:
                _est_rows = sum(_df_by_term.get(t, 0) for t in _ess_terms_all)
            else:
                _est_rows = sum(len(v) for v in surv_by_term.values()) * cfg.block_size
            _w2 = max(
                _width,
                min(spark.sparkContext.defaultParallelism, _est_rows // _DECODE_ROWS_PER_TASK),
            )
            if _w2 > _width:
                spark.conf.set("spark.sql.shuffle.partitions", str(_w2))
                surviving = surviving.repartition(_w2, "term", "block_id")

        # ---- phase 3a: candidates + exact ESSENTIAL score ----
        # decoded is persisted: it feeds the candidate derivation AND is REUSED as
        # the bulk of the essential-rescore input — only the needed-but-not-
        # surviving remainder is decoded on top.
        decoded = decode_blocks(surviving.select(*_BLOCK_COLS)).persist()
        _persisted.append(decoded)
        if _full_survival:
            # Every block of every essential term survived, so (proof in-line):
            # candidates = {(q, d): d in a surviving block of a term essential
            # to q} = exactly the (q, d) pairs _score_decoded_lit's explode over
            # ess_qids_map generates from decoded — the dropDuplicates shuffle,
            # the doc_ord equi-join and the left-semi are identities; and the
            # covering-block completion needed_ess ⊆ (all essential blocks) =
            # surviving, so extra_ess = ∅ and full_ess = decoded (second persist
            # skipped). s_ess is the plain scored aggregate of decoded.
            candidates = None
            extra_ess = None
            full_ess = decoded
            s_ess = _score_decoded_lit(decoded, ess_qids_map)
        else:
            # per-query candidates: docs in any surviving block of a term ESSENTIAL
            # to that query. Lazily persisted (no eager count — VERDICT r1).
            candidates = (
                decoded.select(
                    F.explode(F.element_at(ess_qids_map, F.col("term"))).alias("query_id"), "doc_ord"
                )
                .dropDuplicates(["query_id", "doc_ord"])
                .persist()
            )
            _persisted.append(candidates)
            # blocks that can hold any posting of a candidate: block_id = ord // range
            # with the range STORED in the blocks themselves (collected at rk=1 above)
            # — valid even for blocks kept across incremental merges under older
            # corpus stats.
            needed_ess = (
                candidates.select(
                    "doc_ord", F.explode(F.element_at(q2ess_tr_lit, F.col("query_id"))).alias("tr")
                )
                .select(
                    F.col("tr.term").alias("term"),
                    F.floor(F.col("doc_ord") / F.col("tr.rng")).cast("long").alias("block_id"),
                )
                .dropDuplicates(["term", "block_id"])
            )
            extra_ess = _not_surv(qblocks.join(needed_ess, ["term", "block_id"], "left_semi"))
            full_ess = decoded.unionByName(decode_blocks(extra_ess.select(*_BLOCK_COLS))).persist()
            _persisted.append(full_ess)
            s_ess = _score_decoded_lit(
                full_ess.join(candidates.select("doc_ord").distinct(), "doc_ord"), ess_qids_map
            ).join(candidates, ["query_id", "doc_ord"], "left_semi")

        # ---- θ-filter before the non-essential completion ----
        # score(d) = s_ess(d) + s_ness(d) ≤ s_ess(d) + Σ_{t non-ess} tmax(t), so a
        # candidate below θ on that bound can never reach the top-k; only the
        # survivors pay the non-essential decode. ε pads the float comparison
        # (scores are O(10); 1e-6 admits a few extra candidates, never drops one).
        _strong_cond = (
            F.col("score") + F.element_at(ness_map, F.col("query_id"))
            >= F.element_at(theta_map, F.col("query_id")) - F.lit(1e-6)
        )

        # ---- phase 3b: non-essential completion for the strong candidates ----
        # Skipped entirely when no query has a non-essential term (the common
        # WAND-routed shape — stopword-heavy queries where every term is
        # essential): the 3b subplan otherwise adds ~6 broadcast-exchange subjobs
        # and real Catalyst planning time for provably-empty relations, and
        # s_ess over the essential completion IS the full exact score.
        non_blocks = None
        strong = None
        if ness_pairs_rows:
            strong = s_ess.filter(_strong_cond).select("query_id", "doc_ord").persist()
            _persisted.append(strong)
            q2ness_tr_lit = _term_rng_map_lit(_ness_by_qid)
            needed_non = (
                strong.select(
                    "doc_ord",
                    F.explode(F.element_at(q2ness_tr_lit, F.col("query_id"))).alias("tr"),
                )
                .select(
                    F.col("tr.term").alias("term"),
                    F.floor(F.col("doc_ord") / F.col("tr.rng")).cast("long").alias("block_id"),
                )
                .dropDuplicates(["term", "block_id"])
            )
            # a term can be essential for one query and non-essential for another —
            # excluding EVERYTHING already decoded (surviving via _not_surv,
            # extras via the anti-join) keeps postings duplicate-free (a
            # duplicated posting would double-count in the fold)
            non_blocks = _not_surv(
                qblocks.join(needed_non, ["term", "block_id"], "left_semi")
            )
            if extra_ess is not None:
                non_blocks = non_blocks.join(
                    extra_ess.select("term", "block_id"), ["term", "block_id"], "left_anti"
                )
            full = full_ess.unionByName(decode_blocks(non_blocks.select(*_BLOCK_COLS)))
            scored = _score_decoded_lit(
                full.join(strong.select("doc_ord").distinct(), "doc_ord"), all_qids_map
            )
            scored = scored.join(strong, ["query_id", "doc_ord"], "left_semi")
        else:
            # every term essential → s_ess is already the exact full score for
            # every candidate, and the left-semi of s_ess against its own
            # θ-filter IS that filter — apply it directly: no persist, no
            # broadcast-join subjob (r6; plan: 1 join + 1 persist removed).
            # Diagnostics-only: persist the (strong-candidate-sized) result so
            # n_strong below reads the cache the final job fills instead of
            # re-deriving s_ess.
            scored = s_ess.filter(_strong_cond)
            if stats_out is not None:
                scored = scored.persist()
                _persisted.append(scored)

        # map ordinals back to docIDs: scored is candidate-bounded (small), so it is
        # BROADCAST against the docs relation — no shuffle of the 10^12-row docs table.
        docs = idx.docs.select("doc_id", "doc_ord")
        out = F.broadcast(scored).join(docs, "doc_ord").select("query_id", "doc_id", "score")
        final_df = topk(out, k)
        if stats_out is not None and stats_out.get("capture_plans"):
            # plan-audit hook (tools/explain_audit.py): the returned frame is
            # localCheckpointed below, so its own explain() is opaque — capture
            # the pre-checkpoint formatted plans on request only.
            import io
            from contextlib import redirect_stdout

            def _fmt_plan(df_: DataFrame) -> str:
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df_.explain("formatted")
                return buf.getvalue()

            stats_out["plan_surviving"] = _fmt_plan(surviving)
            stats_out["plan_final"] = _fmt_plan(final_df)
        # Materialize the k·|q|-row result NOW (localCheckpoint is eager): the final
        # job must run WHILE the qblocks/decoded/candidates caches are alive — an
        # unpersist before the caller's collect would silently recompute both decode
        # branches. The returned frame reads the checkpointed rows, lineage-free.
        result = final_df.localCheckpoint(eager=True)
        if stats_out is not None:
            # diagnostic counts AFTER the final materialization: they reuse the
            # still-alive caches instead of recomputing phase 2, and never sit on
            # the timed hot path.
            # block totals/survivors are DRIVER-KNOWN when phase 2 ran on the
            # driver (the metadata was collected): no count job at all; the
            # .count() fallbacks serve the distributed-phase-2 path only.
            if _blk_lists:
                stats_out["blocks_total"] = sum(len(v) for v in _blk_lists.values())
                stats_out["blocks_surviving"] = (
                    sum(len(_blk_lists[t]) for t in _ess_terms_all)
                    if _full_survival
                    else sum(len(v) for v in surv_by_term.values())
                )
            else:
                stats_out["blocks_total"] = qmeta.count()
                stats_out["blocks_surviving"] = surviving.count()
            stats_out["blocks_extra_decoded"] = (
                extra_ess.count() if extra_ess is not None else 0
            ) + (non_blocks.count() if non_blocks is not None else 0)
            # full-survival fast path: candidates == s_ess's (q, d) pairs (the
            # identity the fast path rests on) — count those instead.
            stats_out["n_candidates"] = (
                candidates.count() if candidates is not None else s_ess.count()
            )
            # strong is only materialized when phase 3b needs it; on the
            # all-essential path scored == the strong set and was persisted
            stats_out["n_strong"] = (
                strong.count() if strong is not None else scored.count()
            )
            stats_out["essential_terms"] = {
                qid: sorted(t for q2, t in ess_pairs_rows if q2 == qid) for qid in qids
            }
            stats_out["theta"] = dict(theta)
            stats_out["t_theta_sec"] = round(_t_theta, 3)
            stats_out["t_final_sec"] = round(time.monotonic() - _t0_final, 3)
        qblocks.unpersist()
        qmeta.unpersist()
        decoded.unpersist()
        full_ess.unpersist()
        if candidates is not None:
            candidates.unpersist()
        if strong is not None:
            strong.unpersist()
        return result

    finally:
        for _df in _persisted:
            _df.unpersist()
