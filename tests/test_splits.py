"""Group-aware split assignment: the leakage-remediation invariants.

`split_leakage_audit` measures cross-split near-dup pairs under a naive
per-doc hash split; `group_aware_split_assign` re-keys the same split
rule on the near-dup component id. These tests prove the remediation on
the fixture in both directions, and pin the invariants the oracle's
row-hash can't express directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _pairs(spark, sf_dir):
    from data_ingestion_auto_spark.operators import dedup as D
    from data_ingestion_auto_spark.plans.helpers import T

    docs = T(spark, sf_dir, "documents")
    sig = D.minhash_signature(D.shingles(docs), num_perm=16)
    return D.lsh_candidates(sig, bands=4, rows_per_band=4)


def test_group_aware_split_has_zero_leakage_and_naive_does_not(spark, sf_dir):
    from data_ingestion_auto_spark import plans

    assign = (
        plans.REGISTRY["group_aware_split_assign"].spark(spark, sf_dir).cache()
    )
    pairs = _pairs(spark, sf_dir)

    def straddles(split_col: str) -> int:
        a = assign.select(F.col("doc_id").alias("a"), F.col(split_col).alias("sa"))
        b = assign.select(F.col("doc_id").alias("b"), F.col(split_col).alias("sb"))
        return pairs.join(a, "a").join(b, "b").filter("sa <> sb").count()

    # the remediation: no candidate pair crosses splits...
    assert straddles("split") == 0
    # ...and the baseline it fixes genuinely leaks on this fixture
    assert straddles("naive_split") > 0
    assign.unpersist()


def test_every_group_lands_in_exactly_one_split(spark, sf_dir):
    from data_ingestion_auto_spark import plans

    assign = plans.REGISTRY["group_aware_split_assign"].spark(spark, sf_dir)
    multi = (
        assign.groupBy("group_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
    )
    assert multi == 0


def test_assignment_is_total_and_moved_is_consistent(spark, sf_dir):
    from data_ingestion_auto_spark import plans
    from data_ingestion_auto_spark.plans.helpers import T

    assign = plans.REGISTRY["group_aware_split_assign"].spark(spark, sf_dir)
    n_docs = T(spark, sf_dir, "documents").count()
    rows = assign.count()
    assert rows == n_docs
    bad = assign.filter(
        (F.col("moved") != (F.col("split") != F.col("naive_split")))
        | ~F.col("split").isin("train", "val", "test")
    ).count()
    assert bad == 0
    # singletons (group_id == doc_id) never move: same key, same rule
    assert (
        assign.filter((F.col("group_id") == F.col("doc_id")) & F.col("moved")).count()
        == 0
    )


def test_kfold_zero_straddle_and_naive_leaks(spark, sf_dir):
    """K-fold mirror of the split proof: under the group-aware fold no
    LSH candidate pair straddles folds (zero by construction); under the
    naive per-doc fold the same pair set DOES straddle (the leakage the
    remediation removes)."""
    from pyspark.sql import functions as F

    from data_ingestion_auto_spark import plans
    from data_ingestion_auto_spark.operators import dedup as D
    from data_ingestion_auto_spark.plans.helpers import T

    assign = (
        plans.REGISTRY["group_aware_kfold"].spark(spark, sf_dir).localCheckpoint()
    )
    docs = T(spark, sf_dir, "documents")
    sig = D.minhash_signature(D.shingles(docs), num_perm=16)
    pairs = D.lsh_candidates(sig, bands=4, rows_per_band=4).localCheckpoint()

    fa = assign.select(F.col("doc_id").alias("a"), F.col("fold").alias("fold_a"),
                       F.col("naive_fold").alias("nf_a"))
    fb = assign.select(F.col("doc_id").alias("b"), F.col("fold").alias("fold_b"),
                       F.col("naive_fold").alias("nf_b"))
    j = pairs.join(fa, "a").join(fb, "b")
    assert j.filter(F.col("fold_a") != F.col("fold_b")).count() == 0
    assert j.filter(F.col("nf_a") != F.col("nf_b")).count() > 0
    # folds cover 0..4 and every component is fold-pure
    folds = {r.fold for r in assign.select("fold").distinct().collect()}
    assert folds <= set(range(5)) and len(folds) == 5
    per_group = assign.groupBy("group_id").agg(
        F.countDistinct("fold").alias("nf")
    )
    assert per_group.filter(F.col("nf") > 1).count() == 0
