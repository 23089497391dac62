"""Transcripts source: the engine's authoritative input shape.

``BASELINE.json.input_hint``: Iceberg table of multi-turn conversation / agent
transcripts with columns (conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp); docID = conv_id:turn_idx.

Three ways to get one:

* :func:`read_transcripts` — read a real table (``format('iceberg')`` when the session
  has an Iceberg catalog configured, Parquet otherwise; snapshot pinning honored).
* :func:`synth_transcripts` — deterministic synthetic corpus (hash-based, no RNG in
  executors; content recipe from FIXTURES.md §1: empty turns, multilingual turns,
  digits+symbols, repeated terms, Zipf-skewed hot terms, cross-conv duplicate texts).
* :func:`transcripts_from_documents` — deterministic reshaping of the driver's
  ``documents`` parquet into transcript shape, expressible in identical ANSI SQL so
  DuckDB oracles can replay it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# Vocabulary for the synthetic corpus: a few Zipf-hot "stopword" terms that appear in
# >50% of turns (exercises salted skew handling at small scale) plus topical tails.
_HOT_TERMS = ["the", "a", "to", "and", "of"]
_TAIL_TERMS = [
    "spark", "shuffle", "partition", "index", "postings", "bm25", "query", "token",
    "merge", "compress", "varbyte", "block", "score", "rank", "join", "broadcast",
    "salt", "skew", "checkpoint", "lineage", "snapshot", "iceberg", "parquet",
    "arrow", "pandas", "vector", "dense", "sparse", "colbert", "onnx", "model",
    "latency", "throughput", "executor", "driver", "catalyst", "tungsten", "codegen",
]
# Reference edge-case texts (generate_reference_embeddings.py:60-69): empty string,
# multilingual scripts, digits + symbols.
_EDGE_TEXTS = [
    "",
    "English, Español, Русский, 中文, العربية, हिन्दी, Ελληνικά, עברית, 日本語, 한국어",
    "Text with numbers: 12345 and symbols: !@#$%^&*()",
    "duplicate shared text across conversations",
]
_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["bash", "search", "python", None, None, None]


def doc_id_col(conv_id: str | Column = "conv_id", turn_idx: str | Column = "turn_idx") -> Column:
    """north_star: docID = conv_id:turn_idx."""
    c = F.col(conv_id) if isinstance(conv_id, str) else conv_id
    t = F.col(turn_idx) if isinstance(turn_idx, str) else turn_idx
    return F.concat_ws(":", c, t.cast("string")).alias("doc_id")


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 500,
    turns_per_conv: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic transcripts, generated *distributed* (spark.range →
    native SQL expressions only — no driver-side materialization, no RNG; every value
    is a pure function of (conv, turn) so any two runs at any parallelism agree).

    Scales linearly: n_convs=10^10 would produce the north rule's 10^12 turns with
    the same code path.
    """
    n_rows = n_convs * turns_per_conv
    df = spark.range(0, n_rows, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    conv = (F.col("id") / turns_per_conv).cast("long")
    turn = (F.col("id") % turns_per_conv).cast("int")
    # xxhash64 gives a deterministic per-cell pseudo-random stream.
    h = F.abs(F.xxhash64(F.col("id"), F.lit(42)))

    hot = F.array(*[F.lit(t) for t in _HOT_TERMS])
    tail = F.array(*[F.lit(t) for t in _TAIL_TERMS])
    # Zipf-ish: every turn gets 1-3 hot terms; tail terms chosen by hash; ~8% of turns
    # are reference edge-case texts; repeated terms appear (same tail term twice).
    words = F.concat(
        F.slice(hot, (h % 5 + 1).cast("int"), 2),
        F.array(
            F.element_at(tail, (h % len(_TAIL_TERMS) + 1).cast("int")),
            F.element_at(tail, (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % len(_TAIL_TERMS) + 1).cast("int")),
            F.element_at(tail, (F.abs(F.xxhash64(F.col("id"), F.lit(2))) % len(_TAIL_TERMS) + 1).cast("int")),
            # deliberate intra-turn repetition (exercises A2 dedupe→tf semantics)
            F.element_at(tail, (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % len(_TAIL_TERMS) + 1).cast("int")),
        ),
    )
    edge = F.array(*[F.lit(t) for t in _EDGE_TEXTS])
    text = F.when(
        h % 12 == 0, F.element_at(edge, (h % len(_EDGE_TEXTS) + 1).cast("int"))
    ).otherwise(F.array_join(words, " "))
    roles = F.array(*[F.lit(r) for r in _ROLES])
    tools = F.array(*[F.lit(t) for t in _TOOLS])
    role = F.element_at(roles, (turn % 3 + 1).cast("int"))
    return df.select(
        # format_string, NOT lpad: Spark lpad TRUNCATES to the target length, so at
        # >10^6 convs ten 7-digit convs collapsed onto one 6-digit conv_id —
        # 11 distinct texts sharing a docID (caught by the r3 10M post-merge
        # soak as WAND != exact). %06d pads identically and never truncates,
        # so every fixture below 10^6 convs stays byte-stable.
        F.format_string("conv-%06d", conv).alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool", F.element_at(tools, (h % 6 + 1).cast("int"))).alias("tool"),
        (F.lit(1704067200) + conv * 3600 + turn * 30).cast("timestamp").alias("ts"),
    )


def synth_transcripts_skewed(
    spark: SparkSession,
    n_convs: int = 500,
    turns_per_conv: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic transcripts with REALISTIC score variance.

    :func:`synth_transcripts` (kept byte-stable — goldens and resume tests pin
    it) emits near-constant turns: dl ≈ 6 and tf ∈ {1, 2} for every posting, so
    every document of a term scores identically and block-max pruning is
    mathematically impossible (every block max == θ). This variant exists to
    exercise and benchmark the pruning regime:

    * turn length 4..~120 tokens, long-tailed (product of two uniform hashes);
    * Zipf-ish term choice per slot (product-of-uniforms index into a hot-first
      vocabulary) → tf varies 1..10+ for hot terms, df spans 4 orders;
    * tail terms carry a hashed digit suffix ("index7"), expanding the effective
      vocabulary ~16× — with only ~42 distinct terms every 128-posting block
      contains a near-maximal scorer of every term (integer tf/dl quantize the
      score range), and no block-max structure can discriminate;
    * ~1/61 of turns are SPIKES: one term repeated 2-10× in an otherwise tiny
      turn. BM25's dl-normalization makes these the per-term score maxima (tf
      proportional to length cancels out under tf-saturation — without spikes
      every block's max is within a few % of θ and nothing can prune, which is
      exactly what the flat synth_transcripts corpus demonstrates).

    Same guarantees as synth_transcripts: distributed generation, no RNG, every
    cell a pure function of (conv, turn) — identical at any parallelism.
    """
    n_rows = n_convs * turns_per_conv
    df = spark.range(0, n_rows, 1, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    conv = (F.col("id") / turns_per_conv).cast("long")
    turn = (F.col("id") % turns_per_conv).cast("int")
    h1 = F.abs(F.xxhash64(F.col("id"), F.lit(7)))
    h2 = F.abs(F.xxhash64(F.col("id"), F.lit(11)))
    vocab = F.array(*[F.lit(t) for t in _HOT_TERMS + _TAIL_TERMS])
    v = len(_HOT_TERMS) + len(_TAIL_TERMS)
    # long-tailed length: 4 + (u16 * u16) / 2 ∈ [4, ~116]
    length = (F.lit(4) + (h1 % 16) * (h2 % 16) / 2).cast("int")
    n_hot = len(_HOT_TERMS)

    # Zipf-ish slot pick: product of two uniforms skews toward index 0 (hot
    # terms); tail picks get a hashed digit suffix to expand the vocabulary.
    def word(i):
        idx = (
            (F.abs(F.xxhash64(F.col("id"), i, F.lit(3))) % v)
            * (F.abs(F.xxhash64(F.col("id"), i, F.lit(5))) % v)
            / v
        ).cast("int")
        base = F.element_at(vocab, idx + 1)
        suffix = (F.abs(F.xxhash64(F.col("id"), i, F.lit(13))) % 16).cast("string")
        return F.when(idx < n_hot, base).otherwise(F.concat(base, suffix))

    body = F.array_join(F.transform(F.sequence(F.lit(1), length), word), " ")
    sidx = (h2 % v).cast("int")
    sbase = F.element_at(vocab, sidx + 1)
    spike_term = F.when(sidx < n_hot, sbase).otherwise(
        F.concat(sbase, (F.abs(F.xxhash64(F.col("id"), F.lit(17))) % 16).cast("string"))
    )
    spike = F.array_join(F.array_repeat(spike_term, (h2 % 9 + 2).cast("int")), " ")
    text = F.when(h1 % 61 == 0, spike).otherwise(body)
    roles = F.array(*[F.lit(r) for r in _ROLES])
    role = F.element_at(roles, (turn % 3 + 1).cast("int"))
    return df.select(
        # format_string, NOT lpad: Spark lpad TRUNCATES to the target length, so at
        # >10^6 convs ten 7-digit convs collapsed onto one 6-digit conv_id —
        # 11 distinct texts sharing a docID (caught by the r3 10M post-merge
        # soak as WAND != exact). %06d pads identically and never truncates,
        # so every fixture below 10^6 convs stays byte-stable.
        F.format_string("conv-%06d", conv).alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.lit(1704067200) + conv * 3600 + turn * 30).cast("timestamp").alias("ts"),
    )


# Shared Spark/DuckDB derivation of transcript shape from the driver's `documents`
# table (doc_id:int64, text, lang, source, n_chars). Keep in exact sync with
# TRANSCRIPTS_FROM_DOCUMENTS_SQL below — the DuckDB oracle replays it.
_CONVS_MOD = 97

TRANSCRIPTS_FROM_DOCUMENTS_SQL = f"""
SELECT
  'conv-' || LPAD(CAST(doc_id % {_CONVS_MOD} AS VARCHAR), 4, '0') AS conv_id,
  CAST(FLOOR(doc_id / {_CONVS_MOD}) AS INT)                       AS turn_idx,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
  text,
  CASE WHEN doc_id % 3 = 2 THEN 'search' END                      AS tool,
  TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 1 MINUTE * doc_id    AS ts
FROM documents
"""


def transcripts_from_documents(documents: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    return documents.select(
        F.concat(F.lit("conv-"), F.lpad((d % _CONVS_MOD).cast("string"), 4, "0")).alias("conv_id"),
        F.floor(d / _CONVS_MOD).cast("int").alias("turn_idx"),
        F.when(d % 3 == 0, "user").when(d % 3 == 1, "assistant").otherwise("tool").alias("role"),
        F.col("text"),
        F.when(d % 3 == 2, "search").alias("tool"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.make_interval(mins=d.cast("int"))).alias("ts"),
    )


def read_transcripts(
    spark: SparkSession,
    path_or_table: str,
    fmt: str = "parquet",
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read a transcripts table. With ``fmt='iceberg'`` uses the Iceberg source with
    optional snapshot pinning (built-in ``option('snapshot-id', ...)``); with Parquet
    it is a plain scan (snapshotting is provided by sources.catalog.SnapshotTable)."""
    reader = spark.read.format(fmt)
    if snapshot_id is not None and fmt == "iceberg":
        reader = reader.option("snapshot-id", str(snapshot_id))
    if fmt == "iceberg":
        return reader.load(path_or_table)
    return reader.load(path_or_table)
