"""Deterministic, vectorized tokenizer.

Plays the role of the reference's ONNX-exported XLM-RoBERTa tokenizer
(/root/reference/samples/python/bge_m3_embedder.py:114; exported at
bge-m3-to-onnx.ipynb cell-9 via ``gen_processing_models``), re-designed for a
distributed engine: a self-contained BGE-M3-*style* normalizer + word splitter that is

* identical between the Spark pandas UDF and the pure-Python oracle (same function),
* NFKC + lowercase (SentencePiece-style normalization),
* unicode word extraction (``[^\\W_]+``) so multilingual turns tokenize
  (the reference corpus includes 10-script lines and the empty string —
  /root/reference/samples/python/generate_reference_embeddings.py:60-69),
* reference filter semantics preserved (SURVEY.md §2.2):
  - P5 truncation to ``max_tokens`` (M3Embedder.cs:191),
  - P3 special-term exclusion (bge_m3_embedder.py:30,135),
  - P4 zero-tf postings never exist (tf comes from counting kept tokens),
  - A2 group-by-term dedupe happens downstream via groupBy(term, doc).count().

On pure-ASCII text the token stream equals ``regexp_extract_all(lower(text),
'[a-z0-9]+')`` — this is what lets the DuckDB SQL oracles in ``__spark_entry__.py``
cross-check the Spark plans exactly.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterable

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# \w includes underscore; BGE-M3's SentencePiece treats '_' as the word-boundary
# marker, so we exclude it from tokens.
TOKEN_PATTERN = r"[^\W_]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN, re.UNICODE)


def tokenize_text(
    text: str | None,
    max_tokens: int = 8192,
    special_terms: frozenset[str] = frozenset(),
) -> list[str]:
    """Single-string tokenizer — the oracle path. The Spark path
    (:func:`tokenize_udf`) must produce exactly this, which tests assert."""
    if text is None:
        return []
    norm = unicodedata.normalize("NFKC", text).lower()
    toks = _TOKEN_RE.findall(norm)
    if max_tokens is not None and len(toks) > max_tokens:
        toks = toks[:max_tokens]  # P5 clamp — truncate BEFORE the special filter,
        # mirroring the reference order (tokenize → clamp → filter specials)
    if special_terms:
        toks = [t for t in toks if t not in special_terms]  # P3
    return toks


def _tokenize_series(
    s: pd.Series, max_tokens: int, special_terms: frozenset[str]
) -> pd.Series:
    """pandas-vectorized kernel: NFKC → lower → findall, all via pandas .str ops
    (no per-row Python loop except the cheap special-term filter)."""
    filled = s.fillna("")
    toks = filled.str.normalize("NFKC").str.lower().str.findall(_TOKEN_RE)
    if max_tokens is not None:
        toks = toks.map(lambda xs: xs[:max_tokens] if len(xs) > max_tokens else xs)
    if special_terms:
        toks = toks.map(lambda xs: [t for t in xs if t not in special_terms])
    return toks


def tokenize_udf(max_tokens: int = 8192, special_terms: Iterable[str] = ()):  # noqa: ANN201
    """Arrow-batched Series→Series pandas UDF: text → array<string> of terms.

    This is the engine's ONE custom scalar op in the build path (SURVEY.md §2.10);
    everything downstream is native Spark SQL.
    """
    specials = frozenset(special_terms)

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return _tokenize_series(s, max_tokens, specials)

    return _tok


def token_count_udf(max_tokens: int = 8192, special_terms: Iterable[str] = ()):  # noqa: ANN201
    """text → int32 token count == ``len(tokenize_text(text, ...))``.

    The build's pass-1 statistics job (ordinal bucket counts, Σdl, avgdl —
    plans/build_index.py) needs ONLY dl per doc, but it historically ran the
    full :func:`term_counts_udf` kernel and shipped every (term, tf) struct
    back through Arrow just to aggregate its length. This kernel counts regex
    matches vectorized (``Series.str.count``) and returns 4 bytes per doc —
    no Counter, no struct array, no JVM-side nested-array conversion. With a
    non-empty special-terms set the clamp-then-filter order forces real
    tokenization, so that path falls back to findall (tests assert both equal
    the oracle tokenizer's length on every edge fixture)."""
    specials = frozenset(special_terms)

    @F.pandas_udf(IntegerType())
    def _tok_n(s: pd.Series) -> pd.Series:
        filled = s.fillna("")
        norm = filled.str.normalize("NFKC").str.lower()
        if specials:
            toks = norm.str.findall(_TOKEN_RE)
            if max_tokens is not None:
                toks = toks.map(lambda xs: xs[:max_tokens] if len(xs) > max_tokens else xs)
            return toks.map(lambda xs: sum(1 for t in xs if t not in specials)).astype("int32")
        n = norm.str.count(TOKEN_PATTERN)
        if max_tokens is not None:
            n = n.clip(upper=max_tokens)
        return n.astype("int32")

    return _tok_n


def term_counts_udf(max_tokens: int = 8192, special_terms: Iterable[str] = ()):  # noqa: ANN201
    """text → array<struct<term, tf>> — tokenize AND count inside the kernel.

    SPIMI in-mapper combining: the reference's group-by-token dedupe
    (bge_m3_embedder.py:140-143) is per-document, hence LOCAL — doing it inside
    the Arrow kernel means the downstream postings relation needs NO aggregation
    shuffle at all (measured: the (term, doc_id) hash agg over the exploded
    relation was the build's dominant, anti-scaling cost — 32 concurrent hash
    tables over ~tens of millions of mostly-unique groups spill against the
    shared memory pool). Term order within a doc is first-occurrence, which is
    deterministic; downstream consumers never depend on it.
    """
    from collections import Counter

    specials = frozenset(special_terms)
    out_type = ArrayType(
        StructType(
            [StructField("term", StringType(), False), StructField("tf", IntegerType(), False)]
        )
    )

    @F.pandas_udf(out_type)
    def _tok_tf(s: pd.Series) -> pd.Series:
        toks = _tokenize_series(s, max_tokens, specials)
        # tuples, not dicts: Arrow's struct conversion accepts either, and tuple
        # construction measured ~45% cheaper than dict-per-struct on this kernel
        # (the counting step cost more than tokenization itself with dicts).
        return toks.map(lambda xs: list(Counter(xs).items()))

    return _tok_tf
