"""Positional postings + phrase queries.

The reference emits bag-of-words sparse weights only (token order is consumed by
the model, never exposed — samples/python/bge_m3_embedder.py:133-143), but its
tokenizer DOES preserve sequence order (pos-sorted (pos, token) pairs,
bge_m3_embedder.py:88-92). This module keeps that order all the way into the
index: a positional posting list (term, doc_id, positions[]) and an n-term
phrase-match operator over it — the classic fulltext capability a user of a
lexical index expects next after BM25.

Scale shape (10^12 turns):
* positional postings are built from the same tokenize pass as the tf postings —
  one extra ``posexplode`` + ``sort_array(collect_list(...))`` per (term, doc_id)
  group; the shuffle key is identical to the tf-postings build, so on a bucketed
  index both land co-partitioned.
* phrase match touches ONLY the phrase's terms: the `term IN (...)` literal
  filter is pushed into the postings scan (same discipline as plans/query.py),
  then one hash join per additional phrase term, each co-partitioned on doc_id.
  Positions never explode: consecutive-position matching is per-row array
  algebra (``array_intersect(transform(p, x -> x+1), p_next)``), so a k-term
  phrase over docs with hundreds of occurrences stays O(|positions|) per doc
  with zero extra shuffle rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def positional_postings(tokenized: DataFrame) -> DataFrame:
    """(doc_id, terms:array<string>) → (term, doc_id, positions:array<int>).

    Positions are 1-based and sorted ascending; one row per (term, doc_id), the
    positional analog of the tf posting (tf == size(positions) by construction).
    """
    return (
        tokenized.select("doc_id", F.posexplode("terms").alias("pos0", "term"))
        .select("doc_id", "term", (F.col("pos0") + 1).cast("int").alias("pos"))
        .groupBy("term", "doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
    )


def phrase_match(positional: DataFrame, phrase: list[str]) -> DataFrame:
    """Docs containing the exact consecutive phrase, with occurrence counts.

    Returns (doc_id, n_phrase) for docs with >= 1 occurrence. Algorithm: start
    from the first term's positions; for each following term, keep only start
    positions whose successor position appears in that term's list —
    ``starts := array_intersect(transform(starts, x -> x + 1), positions_i)``.
    After the last term, ``n_phrase = size(starts)``.

    A repeated term in the phrase joins the same posting row twice — correct,
    since positions are per (term, doc); duplicates in the phrase are allowed.
    """
    if not phrase:
        raise ValueError("empty phrase")
    # one pushed-down scan for all phrase terms, then per-term splits
    needed = positional.filter(F.col("term").isin(list(set(phrase))))
    acc = (
        needed.filter(F.col("term") == phrase[0])
        .select("doc_id", F.col("positions").alias("starts"))
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = needed.filter(F.col("term") == term).select(
            "doc_id", F.col("positions").alias(f"p{i}")
        )
        acc = (
            acc.join(nxt, "doc_id")
            .select(
                "doc_id",
                F.array_intersect(
                    F.transform("starts", lambda x: x + 1), F.col(f"p{i}")
                ).alias("starts"),
            )
            .filter(F.size("starts") > 0)
        )
    return acc.select("doc_id", F.size("starts").cast("int").alias("n_phrase"))


def proximity_match(
    positional: DataFrame, term_a: str, term_b: str, slop: int
) -> DataFrame:
    """Ordered proximity ("a ... b" within ``slop`` tokens): docs where some
    occurrence of ``term_b`` follows an occurrence of ``term_a`` at distance
    1..slop. Returns (doc_id, n_prox) counting the ``term_a`` start positions
    with at least one in-window partner (Lucene sloppy-phrase-style, collapsed
    to start-anchored counts so repeated close pairs don't double-count).

    Same scale shape as :func:`phrase_match`: one pushed ``term IN`` scan, one
    doc_id-co-partitioned join, and the window test is per-row array algebra —
    ``size(filter(p_a, x -> exists(p_b, y -> y - x BETWEEN 1 AND slop)))`` —
    positions never explode into rows.
    """
    if slop < 1:
        raise ValueError("slop must be >= 1")
    needed = positional.filter(F.col("term").isin([term_a, term_b]))
    pa = needed.filter(F.col("term") == term_a).select("doc_id", F.col("positions").alias("pa"))
    pb = needed.filter(F.col("term") == term_b).select("doc_id", F.col("positions").alias("pb"))
    near = F.filter(
        F.col("pa"),
        lambda x: F.exists(F.col("pb"), lambda y: (y - x >= 1) & (y - x <= slop)),
    )
    return (
        pa.join(pb, "doc_id")
        .select("doc_id", F.size(near).cast("int").alias("n_prox"))
        .filter(F.col("n_prox") > 0)
    )


def first_match_positions(
    positional: DataFrame, docs: DataFrame, terms: list[str]
) -> DataFrame:
    """Highlight support: for each (doc, query term) present, the first match
    position and occurrence count — what a snippet renderer needs to window the
    text around hits. ``docs`` is a top-k result slice (k rows), so it is
    broadcast; the positional scan is pruned by the pushed ``term IN`` literal.
    Returns ``docs``'s columns + (term, first_pos, n_occ).
    """
    pos = positional.filter(F.col("term").isin(list(set(terms))))
    return F.broadcast(docs).join(pos, "doc_id").select(
        *docs.columns,
        "term",
        F.element_at("positions", 1).alias("first_pos"),
        F.size("positions").cast("int").alias("n_occ"),
    )
