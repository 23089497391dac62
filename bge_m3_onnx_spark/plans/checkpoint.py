"""Resumable, staged index materialization with per-partition lineage + metrics.

North rule: "resumable from checkpoint with per-partition lineage + metrics".

The build is a linear DAG of stages, each materialized to Parquet under the index
directory and recorded in ``_manifest/manifest.json``:

    tokenized   (doc_id, doc_ord, dl, terms)   -- the one expensive UDF pass
    docs        (doc_id, doc_ord, dl)          -- sorted by doc_ord (ord→id lookups prune)
    postings    (term, doc_id, doc_ord, tf, dl)-- bucketed by hash(term) (term pruning)
    terms       (term, df)
    stats       stats.json (N, avgdl, k1, b)
    blocks      compressed block rows           -- bucketed by hash(term)

Restarting after a failure skips every stage whose manifest entry is ``done`` and
whose Parquet commit marker (_SUCCESS) exists — downstream stages read the
materialized output of upstream stages, never recompute them. Lineage per stage
records the pinned input snapshot, wall time, and per-output-file rows/bytes read
straight from the Parquet footers (the per-partition metrics: one file per output
partition).

With an Iceberg catalog the input read is snapshot-pinned via
``option('snapshot-id', ...)``; on plain Parquet the input path itself is the
snapshot (see sources/catalog.py's SnapshotTable for the versioned-directory
emulation).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bge_m3_onnx_spark.config import DEFAULT_CONFIG, EngineConfig
from bge_m3_onnx_spark.operators import postings as P
from bge_m3_onnx_spark.operators.compress import build_blocks
from bge_m3_onnx_spark.operators.ordinals import assign_dense_ordinals

STAGES = ["tokenized", "docs", "postings", "terms", "stats", "blocks"]


class StageFailure(RuntimeError):
    """Injected by tests to simulate a mid-build crash."""


def _file_lineage(path: str) -> list[dict]:
    """Per-partition metrics from Parquet footers: (file, rows, bytes)."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if name.endswith(".parquet") and os.path.isfile(full):
            out.append(
                {
                    "file": name,
                    "rows": pq.ParquetFile(full).metadata.num_rows,
                    "bytes": os.path.getsize(full),
                }
            )
        elif os.path.isdir(full):  # partitioned layout (bucket=N/...)
            for sub in sorted(os.listdir(full)):
                if sub.endswith(".parquet"):
                    fp = os.path.join(full, sub)
                    out.append(
                        {
                            "file": f"{name}/{sub}",
                            "rows": pq.ParquetFile(fp).metadata.num_rows,
                            "bytes": os.path.getsize(fp),
                        }
                    )
    return out


@dataclass
class BuildManifest:
    index_dir: str
    input_path: str = ""
    snapshot_id: int | None = None
    stages: dict = field(default_factory=dict)

    @property
    def path(self) -> str:
        return os.path.join(self.index_dir, "_manifest", "manifest.json")

    @classmethod
    def load_or_new(cls, index_dir: str, input_path: str, snapshot_id: int | None) -> "BuildManifest":
        p = os.path.join(index_dir, "_manifest", "manifest.json")
        if os.path.exists(p):
            with open(p) as f:
                d = json.load(f)
            if d.get("input_path") == input_path and d.get("snapshot_id") == snapshot_id:
                return cls(index_dir=index_dir, input_path=input_path,
                           snapshot_id=snapshot_id, stages=d.get("stages", {}))
        return cls(index_dir=index_dir, input_path=input_path, snapshot_id=snapshot_id)

    def save(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "input_path": self.input_path,
                    "snapshot_id": self.snapshot_id,
                    "stages": self.stages,
                },
                f,
                indent=2,
            )
        os.replace(tmp, self.path)

    def is_done(self, stage: str) -> bool:
        info = self.stages.get(stage)
        if not info or info.get("status") != "done":
            return False
        out = info.get("output")
        if out and not os.path.exists(os.path.join(out, "_SUCCESS")):
            return False  # manifest says done but commit marker is gone → redo
        return True

    def mark_done(self, stage: str, output: str | None, wall_ms: float, extra: dict | None = None) -> None:
        entry = {"status": "done", "wall_ms": round(wall_ms, 1), "output": output}
        if output and os.path.isdir(output):
            lineage = _file_lineage(output)
            entry["partitions"] = len(lineage)
            entry["rows"] = sum(x["rows"] for x in lineage)
            entry["bytes"] = sum(x["bytes"] for x in lineage)
            entry["lineage"] = lineage
        if extra:
            entry.update(extra)
        self.stages[stage] = entry
        self.save()


def materialize_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    input_path: str = "",
    snapshot_id: int | None = None,
    n_buckets: int = 16,
    fail_after: str | None = None,
    on_stage: Callable[[str], None] | None = None,
) -> BuildManifest:
    """Run (or resume) the staged build. ``fail_after`` injects a crash after the
    named stage commits — the resume test kills and restarts the build with it."""
    os.makedirs(index_dir, exist_ok=True)
    man = BuildManifest.load_or_new(index_dir, input_path, snapshot_id)

    def stage(name: str, fn: Callable[[], tuple[str | None, dict | None]]) -> None:
        if man.is_done(name):
            return
        if on_stage:
            on_stage(name)
        t0 = time.monotonic()
        output, extra = fn()
        man.mark_done(name, output, (time.monotonic() - t0) * 1000.0, extra)
        if fail_after == name:
            raise StageFailure(f"injected failure after stage {name!r}")

    tok_path = os.path.join(index_dir, "tokenized")
    docs_path = os.path.join(index_dir, "docs")
    post_path = os.path.join(index_dir, "postings")
    terms_path = os.path.join(index_dir, "terms")
    blocks_path = os.path.join(index_dir, "blocks")
    stats_path = os.path.join(index_dir, "stats.json")

    def st_tokenized():
        # boundary sample + bucket counts run on the light count-only twin —
        # the fat term_tfs kernel runs exactly once, inside the write
        from bge_m3_onnx_spark.sources.transcripts import doc_id_col

        tok = assign_dense_ordinals(
            P.counted_docs(transcripts, cfg), "doc_id", "doc_ord",
            stats_df=P.doc_len_docs(transcripts, cfg),
            key_df=transcripts.select(doc_id_col().alias("doc_id")),
        )
        tok.write.mode("overwrite").parquet(tok_path)
        return tok_path, None

    def st_docs():
        tok = spark.read.parquet(tok_path)
        (
            tok.select("doc_id", "doc_ord", "dl")
            .repartitionByRange(n_buckets, "doc_ord")
            .sortWithinPartitions("doc_ord")
            .write.mode("overwrite")
            .parquet(docs_path)
        )
        return docs_path, None

    def st_postings():
        tok = spark.read.parquet(tok_path)
        posts = P.postings_from_counted(tok).withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
        (
            posts.repartition("bucket")
            .sortWithinPartitions("term", "doc_ord")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(post_path)
        )
        return post_path, None

    def st_terms():
        posts = spark.read.parquet(post_path)
        P.term_stats(posts, cfg).coalesce(max(1, n_buckets // 4)).write.mode(
            "overwrite"
        ).parquet(terms_path)
        return terms_path, None

    def st_stats():
        docs = spark.read.parquet(docs_path)
        row = docs.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
        with open(stats_path, "w") as f:
            json.dump(
                {
                    "n_docs": int(row["n"]),
                    "avgdl": float(row["avgdl"] or 0.0),
                    "k1": cfg.k1,
                    "b": cfg.b,
                    "block_size": cfg.block_size,
                    # bucket modulus of the postings/blocks partition layout —
                    # needed at load time for driver-side bucket pruning (an
                    # empty bucket writes NO directory, so the layout cannot be
                    # inferred from the bucket=* dirs)
                    "term_buckets": n_buckets,
                },
                f,
                indent=2,
            )
        return None, {"rows": int(row["n"])}

    def st_blocks():
        posts = spark.read.parquet(post_path)
        terms = spark.read.parquet(terms_path)
        with open(stats_path) as f:
            stats = json.load(f)
        blocks = build_blocks(posts, terms, stats["n_docs"], stats["avgdl"], cfg)
        (
            blocks.withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
            .repartition("bucket")
            .sortWithinPartitions("term", "block_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(blocks_path)
        )
        return blocks_path, None

    stage("tokenized", st_tokenized)
    stage("docs", st_docs)
    stage("postings", st_postings)
    stage("terms", st_terms)
    stage("stats", st_stats)
    stage("blocks", st_blocks)
    return man


def load_materialized(spark: SparkSession, index_dir: str, cfg: EngineConfig = DEFAULT_CONFIG):
    from bge_m3_onnx_spark.plans.build_index import InvertedIndex, reconcile_cfg

    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    cfg = reconcile_cfg(cfg, stats, index_dir)
    post_path = os.path.join(index_dir, "postings")
    blocks_path = os.path.join(index_dir, "blocks")
    postings_b = spark.read.parquet(post_path)
    blocks_b = spark.read.parquet(blocks_path)
    # bucket modulus from stats.json (st_stats persists it — an EMPTY bucket
    # writes no directory, so the dir listing cannot recover the modulus).
    # Query paths push ``bucket IN (driver-hashed term buckets)`` so the scan
    # partition-prunes; the bucket-free ``postings``/``blocks`` keep every
    # other consumer (merges, unions) on the unchanged schema. Indexes
    # materialized before this field existed load with pruning disabled.
    n_buckets = int(stats.get("term_buckets") or 0)
    return InvertedIndex(
        postings=postings_b.drop("bucket"),
        terms=spark.read.parquet(os.path.join(index_dir, "terms")),
        docs=spark.read.parquet(os.path.join(index_dir, "docs")),
        n_docs=int(stats["n_docs"]),
        avgdl=float(stats["avgdl"]),
        cfg=cfg,
        blocks=blocks_b.drop("bucket"),
        term_buckets=n_buckets or None,
        postings_bucketed=postings_b if n_buckets else None,
        blocks_bucketed=blocks_b if n_buckets else None,
    )
