"""bge_m3_onnx_spark — a PySpark-native distributed inverted-index + BM25 engine.

Re-imagines the sparse lexical-weight retrieval of the reference repo
(yuniko-software/bge-m3-onnx, see /root/reference/samples/python/bge_m3_embedder.py:133-143,
where ``encode(text)`` emits one document's worth of ``term -> weight`` postings) as a
from-scratch distributed engine:

* vectorized Arrow/pandas-UDF tokenization (no per-row Python),
* SPIMI-style map phase emitting ``(term, doc_id, tf)`` postings,
* term-partitioned merge with explicit skew handling,
* delta-gap + varbyte compressed posting blocks with per-block max-score metadata,
* query-time top-k BM25 (k1=1.2, b=0.75) with lossless block-max WAND pruning,
* resumable builds with per-partition lineage + metrics.

Everything is DataFrame-first: Catalyst plans the physical execution; Python only runs
inside Arrow-batched UDF kernels (tokenize, varbyte codec).
"""

from bge_m3_onnx_spark.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
