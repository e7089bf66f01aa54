"""Cross-query consistency for the self-grading/audit tier: each new
readout must agree with the established query it grades or executes."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_lsh_audit_truth_equals_exact_pair_query(spark, sf_dir):
    """tp + fn is the total ground-truth positive count — which is, by
    construction, exactly the row count of `ngram_jaccard_pairs` (same
    subset, same threshold rule)."""
    from data_ingestion_auto_spark import plans

    row = plans.REGISTRY["lsh_quality_audit"].spark(spark, sf_dir).collect()[0]
    n_truth = plans.REGISTRY["ngram_jaccard_pairs"].spark(spark, sf_dir).count()
    assert row.tp + row.fn == n_truth
    assert 0 <= row.precision_ppm <= 1_000_000
    assert 0 <= row.recall_ppm <= 1_000_000
    assert row.tp > 0  # the fixture's dup families are found


def test_neyman_draw_matches_allocation(spark, sf_dir):
    """Per-source draw counts == min(alloc_n, stratum size) from the
    allocation query, and ranks are a 1..k prefix per source."""
    from data_ingestion_auto_spark import plans

    alloc = {
        r.source: (r.alloc_n, r.n_docs)
        for r in plans.REGISTRY["neyman_allocation"].spark(spark, sf_dir).collect()
    }
    drawn = (
        plans.REGISTRY["neyman_sample_rows"]
        .spark(spark, sf_dir)
        .groupBy("source")
        .agg(F.count("*").alias("k"), F.max("draw_rank").alias("mx"))
        .collect()
    )
    for r in drawn:
        a, n = alloc[r.source]
        assert r.k == min(a, n)
        assert r.mx == r.k  # dense 1..k prefix


def test_assortativity_moments_consistent(spark, sf_dir):
    from data_ingestion_auto_spark import plans
    from data_ingestion_auto_spark.operators import dedup as D
    from data_ingestion_auto_spark.plans.helpers import T

    row = plans.REGISTRY["degree_assortativity"].spark(spark, sf_dir).collect()[0]
    assert -1.0 <= row.assortativity <= 1.0
    # symmetric double-counted edge list: m == 2 |pairs|, sx == sy
    docs = T(spark, sf_dir, "documents")
    sig = D.minhash_signature(D.shingles(docs), num_perm=16)
    n_pairs = D.lsh_candidates(sig, bands=4, rows_per_band=4).count()
    assert row.m == 2 * n_pairs
    assert row.sx == row.sy and row.sxx == row.syy
