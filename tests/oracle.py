"""Pure-Python single-node reference engine — the independent oracle.

Plays the role FlagEmbedding plays in the reference's differential tests
(/root/reference/samples/python/bge_m3_tests.py:61-67,107-129: run both engines,
compare with thresholds). Exact BM25 (k1=1.2, b=0.75), float64, canonical summation
order (terms sorted) so scores are bit-stable; tiebreak (score DESC, doc_id ASC).

Uses the SAME tokenizer function as the Spark engine, so rank-identity between the
two is internally exact — the differential surface under test is everything *else*:
explode/groupBy semantics, join matching, float aggregation, top-k windowing.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from bge_m3_onnx_spark.config import DEFAULT_CONFIG, EngineConfig
from bge_m3_onnx_spark.functions.tokenizer import tokenize_text


@dataclass
class OracleIndex:
    cfg: EngineConfig = field(default_factory=lambda: DEFAULT_CONFIG)
    postings: dict[str, dict[str, int]] = field(default_factory=dict)  # term -> doc -> tf
    dl: dict[str, int] = field(default_factory=dict)

    @property
    def n_docs(self) -> int:
        return len(self.dl)

    @property
    def avgdl(self) -> float:
        return sum(self.dl.values()) / len(self.dl) if self.dl else 0.0

    def add(self, doc_id: str, text: str | None) -> None:
        toks = tokenize_text(text, self.cfg.max_tokens, self.cfg.special_terms)
        self.dl[doc_id] = len(toks)
        for term, tf in Counter(toks).items():
            self.postings.setdefault(term, {})[doc_id] = tf

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def score(self, query_text: str) -> dict[str, float]:
        cfg = self.cfg
        avgdl = self.avgdl
        terms = sorted(set(tokenize_text(query_text, cfg.max_tokens, cfg.special_terms)))
        scores: dict[str, float] = {}
        for term in terms:  # canonical order: sorted terms, then sorted docs
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = self.idf(term)
            for doc_id in sorted(plist):
                tf = float(plist[doc_id])
                s = idf * tf * (cfg.k1 + 1.0) / (tf + cfg.k1 * (1.0 - cfg.b + cfg.b * self.dl[doc_id] / avgdl))
                scores[doc_id] = scores.get(doc_id, 0.0) + s
        return scores

    def topk(self, query_text: str, k: int = 10) -> list[tuple[int, str, float]]:
        """[(rank, doc_id, score)] with tiebreak score DESC, doc_id ASC."""
        scores = self.score(query_text)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]


def oracle_from_rows(
    rows: list[tuple[str, int, str | None]], cfg: EngineConfig | None = None
) -> OracleIndex:
    """rows: (conv_id, turn_idx, text); docID = conv_id:turn_idx."""
    idx = OracleIndex(cfg=cfg or DEFAULT_CONFIG)
    for conv_id, turn_idx, text in rows:
        idx.add(f"{conv_id}:{turn_idx}", text)
    return idx
