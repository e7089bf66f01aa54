"""Equivalence of prefix-doubling suffix ranks (operators/suffix.py)
with the direct suffix sort that `plans/substring_sa.py` builds on —
the two constructions must induce the SAME suffix-array order, with
equal ranks exactly for identical suffixes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_auto_spark.operators.suffix import suffix_order_ranks


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    """~100-doc md5-deterministic slice — small enough for a collected
    reference, still containing engineered near-dup pairs (equal-suffix
    ties across documents)."""
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1", "2"))
        .select("doc_id", F.split("text", " ").alias("w"))
        .localCheckpoint()
    )


def test_prefix_doubling_matches_direct_suffix_sort(spark, corpus):
    positions = corpus.select(
        "doc_id", F.posexplode("w").alias("i", "tok")
    )
    ranked = suffix_order_ranks(positions).collect()

    # direct reference: materialize every suffix, sort lexicographically
    suf = {
        (r.doc_id, i): tuple(r.w[i:])
        for r in corpus.collect()
        for i in range(len(r.w))
    }
    assert len(ranked) == len(suf)

    by_rank: dict[int, set] = {}
    for row in ranked:
        by_rank.setdefault(row.r, set()).add(suf[(row.doc_id, row.i)])
    # 1) equal rank -> identical suffix
    for r, sufs in by_rank.items():
        assert len(sufs) == 1, f"rank {r} spans {len(sufs)} distinct suffixes"
    # 2) rank order == lexicographic suffix order
    ordered = [next(iter(by_rank[r])) for r in sorted(by_rank)]
    assert ordered == sorted(ordered)
    # 3) dense: ranks are 1..n_distinct
    assert sorted(by_rank) == list(range(1, len(by_rank) + 1))
    # 4) the fixture's engineered dups produce genuine cross-doc ties
    assert len(by_rank) < len(suf)


def test_dense_rank_helper_is_parallel(spark):
    """The helper's only ordered scan over ALL keys must be the ≤ _NP-row
    offset table: the plan's data-sized window partitions on
    spark_partition_id, never unpartitioned."""
    from data_ingestion_auto_spark.operators.suffix import _dense_rank

    df = spark.range(10_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    out = _dense_rank(df, ["k"], "r")
    got = {(r.k, r.r) for r in out.select("k", "r").distinct().collect()}
    assert got == {(k, k + 1) for k in range(97)}
