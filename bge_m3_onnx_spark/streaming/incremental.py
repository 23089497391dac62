"""Incremental indexing over snapshot ranges (and a Structured Streaming wrapper).

The reference is strictly one-shot batch (SURVEY.md §2.9); the north rule's
"resumable from Iceberg-snapshot checkpoints" maps to batch-over-snapshot-ranges:
each increment reads only the new snapshots, tokenizes only the new turns, and
merges delta postings into the index. The merge is associative, so the same
function also serves as a ``foreachBatch`` sink for ``readStream`` if a true
streaming feed is wired up.

Merge semantics (exactly equivalent to a full rebuild, tests assert it):

    postings' = (postings ∪ delta_postings) groupBy(term, doc_id) sum(tf)
                -- new docs only add rows; (term, doc_id) never collides across
                   snapshots because docIDs are unique per turn, so the sum is a
                   disjoint union in practice (kept as a sum for idempotence)
    docs'     = docs ∪ delta_docs       (ordinals reassigned: new docs get ordinals
                                         after the current max — append-only, so
                                         existing blocks stay VALID and only blocks
                                         touching new ordinals are (re)built)
    terms'    = postings' groupBy(term) count
    stats'    = recomputed from docs'   (N, avgdl shift → idf/norms shift, so BM25
                                         scores are always w.r.t. the full corpus)

Block delta-rebuild: a new doc with ordinal o touches, per term t it contains,
exactly block ``o // block_range(t)``; but block_range depends on df(t), which
changes as df grows. We therefore rebuild blocks only for terms whose df changed
(the delta's term set) — at 10^12 scale the delta term set of an hourly increment
is a tiny fraction of the vocabulary, and rebuilds read only those terms' postings
via the bucketed layout's term pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bge_m3_onnx_spark.config import DEFAULT_CONFIG, EngineConfig
from bge_m3_onnx_spark.operators import postings as P
from bge_m3_onnx_spark.operators.compress import build_blocks
from bge_m3_onnx_spark.operators.ordinals import assign_dense_ordinals
from bge_m3_onnx_spark.plans.build_index import InvertedIndex


def merge_delta(
    spark: SparkSession,
    idx: InvertedIndex,
    delta_transcripts: DataFrame,
    cfg: EngineConfig | None = None,
) -> InvertedIndex:
    """Merge a batch of new transcripts into an existing logical index."""
    cfg = cfg or idx.cfg
    has_ord = "doc_ord" in idx.postings.columns

    tok = P.counted_docs(delta_transcripts, cfg)
    if has_ord:
        base = int(idx.docs.agg(F.max("doc_ord")).collect()[0][0] or -1) + 1
        tok = assign_dense_ordinals(tok, "doc_id", "doc_ord").withColumn(
            "doc_ord", F.col("doc_ord") + F.lit(base)
        )
    tok = tok.persist()

    delta_postings = P.postings_from_counted(tok)
    postings = (
        idx.postings.unionByName(delta_postings)
        .groupBy("term", "doc_id")
        .agg(
            F.sum("tf").cast("int").alias("tf"),
            F.max("dl").alias("dl"),
            *([F.max("doc_ord").alias("doc_ord")] if has_ord else []),
        )
    ).persist()
    docs = idx.docs.unionByName(P.doc_stats(tok)).persist()
    terms = P.term_stats(postings, cfg)
    row = docs.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)

    blocks = None
    if idx.blocks is not None and has_ord:
        # N and avgdl changed globally → block_max_score metadata is stale for ALL
        # blocks w.r.t. exact BM25. Rather than rebuild everything eagerly, we
        # rebuild the delta's term set exactly and degrade the rest to a still-safe
        # bound: old block_max computed under old (N, avgdl) may differ, so for
        # correctness at small scale we rebuild all blocks here; the materialized
        # path amortizes this by batching increments. (Lossless pruning must never
        # rest on stale maxima.)
        blocks = build_blocks(postings, terms, n_docs, avgdl, cfg)

    return InvertedIndex(
        postings=postings,
        terms=terms,
        docs=docs,
        n_docs=n_docs,
        avgdl=avgdl,
        cfg=cfg,
        blocks=blocks,
    )


def index_snapshot_range(
    spark: SparkSession,
    table,  # SnapshotTable
    idx: InvertedIndex | None,
    from_exclusive: int | None,
    to_inclusive: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> InvertedIndex:
    """Advance the index across a snapshot range — the checkpointed unit of work."""
    delta = table.read_incremental(from_exclusive, to_inclusive)
    if idx is None:
        from bge_m3_onnx_spark.plans.build_index import build_index

        return build_index(delta, cfg, with_ordinals=True)
    return merge_delta(spark, idx, delta, cfg)


def stream_build(
    spark: SparkSession,
    input_dir: str,
    schema,
    on_batch,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Structured Streaming wrapper: file-source stream of transcript Parquet →
    foreachBatch(on_batch). The engine's merge is batch-associative, so the sink
    simply calls merge_delta per micro-batch; exactly-once comes from the
    checkpointed source offsets + idempotent (term, doc_id) merge."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(lambda df, bid: on_batch(df, bid))
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
