"""k-core peeling (plans/graph.py::kcore_survivors): multi-round peel
correctness on a crafted graph, idempotence past convergence, and the
registered unroll's convergence on the fixture."""

from __future__ import annotations

from pyspark.sql import functions as F


def _surv_set(spark, edges_list, k, rounds):
    from data_ingestion_auto_spark.plans.graph import kcore_survivors

    pairs = spark.createDataFrame(edges_list, "a long, b long")
    _, surv = kcore_survivors(pairs, k=k, rounds=rounds)
    return {r.u for r in surv.collect()}


def test_chain_into_triangle_peels_over_multiple_rounds(spark):
    """1-2-3-4 path hanging off triangle 4-5-6, k=2: node 1 peels in
    round 1, which drops 2 below degree 2 (round 2), then 3 (round 3) —
    a peel that NEEDS multiple synchronized rounds. The 2-core is
    exactly the triangle."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (4, 6)]
    # too few rounds: the chain is only partially peeled
    assert _surv_set(spark, edges, k=2, rounds=1) == {2, 3, 4, 5, 6}
    assert _surv_set(spark, edges, k=2, rounds=2) == {3, 4, 5, 6}
    # enough rounds: converged to the true core
    assert _surv_set(spark, edges, k=2, rounds=3) == {4, 5, 6}
    # idempotence: extra rounds change nothing once converged
    assert _surv_set(spark, edges, k=2, rounds=8) == {4, 5, 6}


def test_whole_graph_can_peel_to_empty(spark):
    # a bare path has no 2-core at all
    edges = [(1, 2), (2, 3), (3, 4)]
    assert _surv_set(spark, edges, k=2, rounds=4) == set()


def test_registered_unroll_is_converged_on_fixture(spark, sf_dir):
    """R=10 must reach the true 3-core at the gate fixture: two extra
    rounds change no survivor (the idempotence-after-convergence
    property the fixed unroll relies on)."""
    from data_ingestion_auto_spark.operators import dedup as D
    from data_ingestion_auto_spark.plans.graph import kcore_survivors
    from data_ingestion_auto_spark.plans.helpers import T

    docs = T(spark, sf_dir, "documents")
    sig = D.minhash_signature(D.shingles(docs), num_perm=16)
    pairs = D.lsh_candidates(sig, bands=4, rows_per_band=4).localCheckpoint()
    _, s10 = kcore_survivors(pairs, k=3, rounds=10)
    _, s12 = kcore_survivors(pairs, k=3, rounds=12)
    a = {r.u for r in s10.collect()}
    b = {r.u for r in s12.collect()}
    assert a == b
    # core membership implies degree >= k inside the core, by definition
    from data_ingestion_auto_spark import plans

    rows = plans.REGISTRY["neardup_kcore"].spark(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} <= a or {r.doc_id for r in rows} == a
    for r in rows:
        assert r.core_degree >= 3
