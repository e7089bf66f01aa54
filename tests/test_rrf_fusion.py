"""Reciprocal-rank fusion (plans/retrieval.py::rrf_retrieval_fusion):
integer RRF arithmetic and the ensemble property on the fixture."""

from __future__ import annotations


def test_rrf_arithmetic_and_ensemble_property(spark, sf_dir):
    from data_ingestion_auto_spark import plans

    rows = plans.REGISTRY["rrf_retrieval_fusion"].spark(spark, sf_dir).collect()
    assert len(rows) == 20
    seen_b, seen_c = set(), set()
    for r in rows:
        # exact micro-unit identity, recomputed in Python
        assert r.rrf_micro == 10**12 // (60 + r.rank_bm25) + 10**12 // (
            60 + r.rank_cov
        )
        assert r.rank_bm25 >= 1 and r.rank_cov >= 1
        seen_b.add(r.rank_bm25)
        seen_c.add(r.rank_cov)
    # ranks are distinct within each system (row_number semantics)
    assert len(seen_b) == 20 and len(seen_c) == 20
    # output is sorted by fused score
    scores = [r.rrf_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    # the fused winner is highly ranked by at least one constituent —
    # RRF can promote consensus docs but cannot invent relevance
    top = rows[0]
    assert min(top.rank_bm25, top.rank_cov) <= 5
