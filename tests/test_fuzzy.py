"""SymSpell deletion-neighborhood fuzzy matching == brute-force levenshtein.

The equi-join candidate generation must be COMPLETE for distance <= 1
(identity + substitution + insertion + deletion all covered) and the verify
step must kill the distance-2 false positives the neighborhood admits
(e.g. "ab" vs "ba")."""

from __future__ import annotations

from bge_m3_onnx_spark.operators.fuzzy import deletion_variants, fuzzy_term_match

DICT = [
    "query", "quer", "qury", "quarry", "value", "vale", "table", "tale",
    "ab", "ba", "a", "window", "widow", "spark", "sparks", "shark",
]


def brute(qterm: str, max_dist: int = 1) -> set[str]:
    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    return {t for t in DICT if lev(qterm, t) <= max_dist}


def test_deletion_variants_shape(spark):
    df = spark.createDataFrame([("abc",)], "term string")
    got = sorted(r["variant"] for r in deletion_variants(df).collect())
    assert got == ["ab", "abc", "ac", "bc"]


def test_fuzzy_equals_bruteforce(spark):
    d = spark.createDataFrame([(t,) for t in DICT], "term string")
    qs = ["query", "qurey", "ab", "tale", "window", "zzz", "sprak"]
    q = spark.createDataFrame([(t,) for t in qs], "qterm string")
    rows = fuzzy_term_match(d, q).collect()
    got: dict[str, set[str]] = {}
    for r in rows:
        got.setdefault(r["qterm"], set()).add(r["term"])
        assert r["dist"] <= 1
    for qterm in qs:
        assert got.get(qterm, set()) == brute(qterm), qterm
