"""Prefix-filtering set-similarity join: the EXACTNESS contract.

The oracle proves Spark/DuckDB agree; this test proves both agree with
the ground truth — a brute-force all-pairs Jaccard scan over the whole
fixture in plain Python. Prefix filtering is only correct if the
candidate generator is COMPLETE (no pair with Jaccard >= t lacks a
shared prefix token); a wrong prefix length or ordering loses pairs
silently, which the engine-vs-engine hash can never catch.
"""

from __future__ import annotations

from fractions import Fraction

from data_ingestion_auto_spark.plans.ppjoin import _T_DEN, _T_NUM


def _shingles(text: str) -> frozenset[str]:
    w = text.split(" ")
    return frozenset(
        " ".join(w[i : i + 3]) for i in range(len(w) - 2)
    ) if len(w) >= 3 else frozenset()


def test_matches_bruteforce_ground_truth(spark, sf_dir):
    from data_ingestion_auto_spark import plans
    from data_ingestion_auto_spark.plans.helpers import T

    docs = {
        r["doc_id"]: _shingles(r["text"])
        for r in T(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    t = Fraction(_T_NUM, _T_DEN)
    ids = sorted(docs)
    truth = {}
    for i, a in enumerate(ids):
        sa = docs[a]
        if not sa:
            continue
        for b in ids[i + 1 :]:
            sb = docs[b]
            if not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if Fraction(inter, union) >= t:
                truth[(a, b)] = (inter, union)

    got = {
        (r["a"], r["b"]): (r["n_inter"], r["n_union"])
        for r in plans.REGISTRY["prefix_filter_jaccard_join"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert got == truth


def test_prefix_length_formula_is_ceil(spark):
    # p = x - ceil(t*x) + 1 via integer arithmetic, for every set size
    for x in range(1, 200):
        p_int = x - (_T_NUM * x + _T_DEN - 1) // _T_DEN + 1
        import math

        p_ref = x - math.ceil(Fraction(_T_NUM, _T_DEN) * x) + 1
        assert p_int == p_ref, x
        assert 1 <= p_int <= x
