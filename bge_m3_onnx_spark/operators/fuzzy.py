"""Fuzzy term lookup — SymSpell-style deletion-neighborhood matching.

A misspelled query term should still hit the dictionary ("qurey" → "query").
The naive plan — ``levenshtein(query_term, term) <= 1`` against the whole term
dictionary — is a cross join: O(|dict|) per lookup, a non-starter at a 10^9-term
vocabulary. The SymSpell reformulation makes it an EQUI-join:

    dist(a, b) <= 1  ⇒  variants(a) ∩ variants(b) ≠ ∅,
    variants(s) = {s} ∪ { s with one character deleted }

(substitution = both sides delete at the same position; insert/delete = one side
deletes). The converse does not hold — e.g. "ab"/"ba" share variants at distance
2 — so shared-variant pairs are CANDIDATES, verified with the exact
``levenshtein`` builtin (JVM-side, per candidate pair, never per dictionary
entry). Index side: explode each dictionary term into ≤ len+1 variants once
(build-time relation, re-usable, bucketable by variant); query side: the same
explosion of the (tiny) query terms, broadcast. The join fans out by shared
variants only.

Scale shape: |dict| · avg_len variant rows — linear metadata, hash-partitioned
by variant; hot variants (short strings) bound the fan-in, and the verify step
caps false positives. No cross join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(df: DataFrame, col: str = "term") -> DataFrame:
    """Explode each string into itself + all single-character deletions.

    → (original columns..., variant). Pure Spark expressions: transform over
    positions + the identity variant; no UDF.
    """
    s = F.col(col)
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))),
    )
    variants = F.array_union(F.array(F.col(col)), dels)
    return df.select("*", F.explode(variants).alias("variant"))


def fuzzy_term_match(
    dictionary: DataFrame, query_terms: DataFrame, max_dist: int = 1
) -> DataFrame:
    """(dictionary: term [, df...]) × (query_terms: qterm) → matches within
    edit distance ``max_dist`` (only 1 is supported — the deletion neighborhood
    is depth-1).

    Returns dictionary columns + (qterm, dist), deduplicated per (qterm, term).
    """
    if max_dist != 1:
        raise ValueError("deletion-neighborhood depth 1 supports max_dist=1 only")
    d = deletion_variants(dictionary, "term")
    q = deletion_variants(query_terms.select("qterm"), "qterm")
    cand = (
        d.join(F.broadcast(q), "variant")
        .drop("variant")
        .dropDuplicates(["qterm", "term"])
    )
    return cand.withColumn("dist", F.levenshtein("qterm", "term")).filter(
        F.col("dist") <= max_dist
    )
