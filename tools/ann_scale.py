"""ANN recall at volume — recall@k + scan fraction for LSH / multi-probe / IVF.

VERDICT r4 #7: the ANN slices are correctness-green as deterministic pipelines,
but no recall@10 vs brute cosine existed at ≥1M vectors. This measures it on a
clustered synthetic corpus (the regime where ANN is meaningful; on isotropic
noise every method degenerates to chance):

  * corpus: n vectors, dim d, C=64 latent clusters — vec = center(c) + 0.35·u
    where center dims and noise are hash-derived uniforms in [-1, 1] (fully
    deterministic, no RNG state).
  * ground truth: exact cosine top-k per query, computed with the 10^9-shape
    plan — a vectorized Arrow kernel does batch×query matmul and emits only its
    per-batch per-query top-k (map-side top-k), so the final agg sees
    batches·Q·k rows, never n·Q.
  * sign-LSH single-probe / multi-probe (Hamming ≤ 1): the engine's bucket
    definition (sign bits of the first 8 dims — entry.py ANN slices), candidate
    set via broadcast (bucket → query) probe join, exact cosine inside.
  * IVF: K=256 lists, deterministic seeds at vec_id multiples of n//K, one
    Lloyd step via per-batch partial (cluster, count, Σvec) sums (the same
    partial-agg shape a 10^9 build needs), probe the nprobe nearest lists.

Scan fraction = candidate (vector, query) pairs / (n·Q) — the fraction of the
corpus each method actually scores, the number that buys the speedup at scale.

    python tools/ann_scale.py [n_vecs] [dim] [n_queries] [json_out]
    # defaults 1,000,000 64 20
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bge_m3_onnx_spark.session import get_spark  # noqa: E402

C_CLUSTERS = 64
NOISE = 0.35
K_LISTS = 256
TOPK = 10


def _hash_uniform(ids: np.ndarray, dim: int, salt: int) -> np.ndarray:
    """(len(ids), dim) matrix of deterministic uniforms in [-1, 1) — splitmix64
    finalizer over (id, dim_index, salt); vectorized, no RNG state."""
    i = ids.astype(np.uint64).reshape(-1, 1)
    j = np.arange(dim, dtype=np.uint64).reshape(1, -1)
    x = i * np.uint64(0x9E3779B97F4A7C15) + j * np.uint64(0xBF58476D1CE4E5B9) + np.uint64(salt)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 52) - 1.0


def _vectors_for(ids: np.ndarray, dim: int) -> np.ndarray:
    centers = _hash_uniform(ids % C_CLUSTERS, dim, salt=101)
    return (centers + NOISE * _hash_uniform(ids, dim, salt=202)).astype(np.float32)


def _sign_bucket(m: np.ndarray) -> np.ndarray:
    """Engine bucket: sign bits of the first 8 dims, as a small int."""
    bits = (m[:, :8] >= 0).astype(np.int64)
    return (bits * (1 << np.arange(8, dtype=np.int64))).sum(axis=1)


def _topk_rows(cos: np.ndarray, vec_ids: np.ndarray, qids: np.ndarray, k: int):
    """Per-query local top-k of a (rows, Q) cosine matrix → record rows."""
    out = []
    kk = min(k, cos.shape[0])
    for qi, qid in enumerate(qids):
        part = np.argpartition(-cos[:, qi], kk - 1)[:kk]
        out.extend(
            {"query_id": int(qid), "vec_id": int(vec_ids[p]), "cos": float(cos[p, qi])}
            for p in part
        )
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    json_out = sys.argv[4] if len(sys.argv) > 4 else None
    spark = get_spark(app_name="ann-scale", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # ---- corpus (generated in the scoring kernels from vec_id — nothing but
    # the 8-byte id ever shuffles; at 10^9 vectors the embedding column would
    # come off parquet the same way: scanned in the kernel, never shuffled)
    base = spark.range(n).select(F.col("id").alias("vec_id")).persist()
    base.count()

    # queries: the first n_q vectors (clusters 0..n_q-1), normalized on driver
    q_ids = np.arange(n_q, dtype=np.int64)
    qraw = _vectors_for(q_ids, dim).astype(np.float64)
    qm = qraw / np.linalg.norm(qraw, axis=1, keepdims=True)

    def scored_topk(probe_bucket_of=None, probe_map=None, label=""):
        """mapInPandas kernel: regenerate batch vectors, optionally filter to
        each query's candidate set, emit per-batch per-query top-k."""

        def kern(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                m = _vectors_for(ids, dim).astype(np.float64)
                mn = m / np.linalg.norm(m, axis=1, keepdims=True)
                if probe_bucket_of is None:
                    cos = mn @ qm.T
                    rows = _topk_rows(cos, ids, q_ids, TOPK)
                else:
                    keys = probe_bucket_of(m)
                    rows = []
                    for qi, qid in enumerate(q_ids):
                        sel = np.isin(keys, probe_map[int(qid)])
                        if not sel.any():
                            continue
                        cos = mn[sel] @ qm[qi : qi + 1].T
                        rows.extend(_topk_rows(cos, ids[sel], [qid], TOPK))
                yield pd.DataFrame(rows, columns=["query_id", "vec_id", "cos"]) if rows else (
                    pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                                  "vec_id": pd.Series(dtype="int64"),
                                  "cos": pd.Series(dtype="float64")})
                )

        part = base.mapInPandas(kern, "query_id long, vec_id long, cos double")
        # final exact top-k over the batches·Q·k partials (tiny)
        rows = (
            part.groupBy("query_id")
            .agg(F.reverse(F.array_sort(F.collect_list(F.struct("cos", "vec_id")))).alias("s"))
            .select("query_id", F.slice("s", 1, TOPK).alias("s"))
            .collect()
        )
        return {r["query_id"]: [x["vec_id"] for x in r["s"]] for r in rows}

    # ---- ground truth (brute force)
    t0 = time.monotonic()
    truth = scored_topk()
    t_brute = time.monotonic() - t0

    # ---- candidate-set sizes per method (for scan fractions): one light pass
    def scan_pairs(probe_map) -> int:
        def kern(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                keys = _sign_bucket(_vectors_for(ids, dim))
                tot = sum(int(np.isin(keys, probe_map[int(q)]).sum()) for q in q_ids)
                yield pd.DataFrame({"pairs": [tot]})

        return base.mapInPandas(kern, "pairs long").agg(F.sum("pairs")).collect()[0][0]

    q_buckets = _sign_bucket(_vectors_for(q_ids, dim))
    single_map = {int(q): np.array([q_buckets[i]]) for i, q in enumerate(q_ids)}
    multi_map = {
        int(q): np.concatenate(
            ([q_buckets[i]], [q_buckets[i] ^ (1 << b) for b in range(8)])
        )
        for i, q in enumerate(q_ids)
    }

    results = {}
    for label, pmap in (("lsh_single", single_map), ("lsh_multiprobe", multi_map)):
        t0 = time.monotonic()
        got = scored_topk(probe_bucket_of=lambda m: _sign_bucket(m), probe_map=pmap, label=label)
        dt = time.monotonic() - t0
        pairs = scan_pairs(pmap)
        rec = np.mean([
            len(set(got.get(int(q), [])) & set(truth[int(q)])) / TOPK for q in q_ids
        ])
        results[label] = {
            "recall_at_10": round(float(rec), 4),
            "scan_fraction": round(pairs / (n * n_q), 6),
            "sec": round(dt, 1),
        }
        print(label, results[label])

    # ---- IVF: deterministic seeds, ONE Lloyd step via partial (cluster, count,
    # Σvec) sums — the 10^9-shape centroid update (batches·K rows, never n·dim)
    t0 = time.monotonic()
    seed_ids = np.arange(K_LISTS, dtype=np.int64) * (n // K_LISTS)
    seeds = _vectors_for(seed_ids, dim).astype(np.float64)

    def lloyd_kern(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = _vectors_for(ids, dim).astype(np.float64)
            # ||m - s||² argmin == argmax (m·s − ||s||²/2)
            a = np.argmax(m @ seeds.T - 0.5 * (seeds * seeds).sum(axis=1), axis=1)
            rows = []
            for c in np.unique(a):
                sel = a == c
                rows.append({"cluster": int(c), "cnt": int(sel.sum()),
                             "s": m[sel].sum(axis=0).tolist()})
            yield pd.DataFrame(rows, columns=["cluster", "cnt", "s"])

    parts = base.mapInPandas(lloyd_kern, "cluster int, cnt long, s array<double>").collect()
    cent = np.array(seeds)
    counts = np.zeros(K_LISTS)
    sums = np.zeros((K_LISTS, dim))
    for r in parts:
        counts[r["cluster"]] += r["cnt"]
        sums[r["cluster"]] += np.array(r["s"])
    nonzero = counts > 0
    cent[nonzero] = sums[nonzero] / counts[nonzero, None]
    t_build = time.monotonic() - t0

    def ivf_assign(m: np.ndarray) -> np.ndarray:
        return np.argmax(m @ cent.T - 0.5 * (cent * cent).sum(axis=1), axis=1)

    # list sizes under the FINAL assignment (for scan fractions)
    def size_kern(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            a = ivf_assign(_vectors_for(pdf["vec_id"].to_numpy(dtype=np.int64), dim)
                           .astype(np.float64))
            c, ct = np.unique(a, return_counts=True)
            yield pd.DataFrame({"cluster": c.astype(int), "cnt": ct.astype(int)})

    sizes = dict(
        base.mapInPandas(size_kern, "cluster int, cnt long")
        .groupBy("cluster").agg(F.sum("cnt").alias("n")).collect()
    )
    # probe ordering in the ASSIGNMENT space (raw vectors, same argmax form)
    qdist = np.argsort(-(qraw @ cent.T - 0.5 * (cent * cent).sum(axis=1)), axis=1)

    for nprobe in (4, 16):
        pmap = {int(q): qdist[i, :nprobe] for i, q in enumerate(q_ids)}
        t0 = time.monotonic()
        got = scored_topk(probe_bucket_of=ivf_assign, probe_map=pmap)
        dt = time.monotonic() - t0
        pairs = sum(sizes.get(int(c), 0) for q in q_ids for c in pmap[int(q)])
        rec = np.mean([
            len(set(got.get(int(q), [])) & set(truth[int(q)])) / TOPK for q in q_ids
        ])
        results[f"ivf_nprobe{nprobe}"] = {
            "recall_at_10": round(float(rec), 4),
            "scan_fraction": round(pairs / (n * n_q), 6),
            "sec": round(dt, 1),
        }
        print(f"ivf_nprobe{nprobe}", results[f"ivf_nprobe{nprobe}"])

    out = {
        "n_vecs": n,
        "dim": dim,
        "n_queries": n_q,
        "k": TOPK,
        "corpus": f"{C_CLUSTERS} latent clusters, noise {NOISE}, hash-deterministic",
        "brute_force_sec": round(t_brute, 1),
        "ivf": {"k_lists": K_LISTS, "build_sec": round(t_build, 1)},
        "methods": results,
    }
    print(json.dumps(out))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
