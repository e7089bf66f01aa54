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


def test_kendall_tau_identities_and_python_reference(spark, sf_dir):
    from data_ingestion_auto_spark import plans

    row = plans.REGISTRY["ranking_kendall_tau"].spark(spark, sf_dir).collect()[0]
    assert row.n_pairs == row.n_items * (row.n_items - 1) // 2
    assert row.concordant + row.discordant == row.n_pairs
    assert -1.0 <= row.tau <= 1.0
    assert row.tau == (row.concordant - row.discordant) / row.n_pairs

    # recompute tau in Python from the fusion query's own rank columns
    # (same candidate pool, same rankers)
    ranks = {
        r.doc_id: (r.rank_bm25, r.rank_cov)
        for r in plans.REGISTRY["rrf_retrieval_fusion"].spark(spark, sf_dir).collect()
    }
    # the fusion output is top-20 by rrf; the tau query uses top-20 by
    # EITHER system — overlapping but not identical sets, so only check
    # pair-direction consistency on the intersection
    import itertools

    ids = sorted(ranks)
    conc = disc = 0
    for a, b in itertools.combinations(ids, 2):
        s = (ranks[a][0] - ranks[b][0]) * (ranks[a][1] - ranks[b][1])
        conc += s > 0
        disc += s < 0
    # both systems were built to disagree somewhat (different signals):
    # the fixture must show BOTH concordant and discordant pairs
    assert conc > 0 and disc > 0
