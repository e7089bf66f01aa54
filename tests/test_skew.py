"""Shuffle-topology operators: bucketed join skips the Exchange; salted
join preserves join semantics under skew (SCALE.md levers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_auto_spark.operators.skew import bucketed_join, salted_join, write_bucketed
from data_ingestion_auto_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", "l_orderkey", buckets=8)
    write_bucketed(od, "od_bucketed", "o_orderkey", buckets=8)
    return "li_bucketed", "od_bucketed"


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Identically-bucketed tables join without a shuffle: the physical
    plan must not contain an Exchange (this is the 'join a 100 TB fact
    table nightly without re-shuffling it per query' lever)."""
    lt, rt = bucketed_tables
    # disable AQE broadcast demotion so the bucket join is what we inspect
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join(spark, lt, rt, "l_orderkey", "o_orderkey")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
        assert "SortMergeJoin" in plan
        # semantics unchanged vs plain join
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    su = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    plain = li.join(su, "l_suppkey").count()
    salted = salted_join(li, su, "l_suppkey", salts=8).count()
    assert salted == plain


def test_salted_join_hot_keys_only(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    su = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    plain = li.join(su, "l_suppkey").count()
    salted = salted_join(li, su, "l_suppkey", salts=4, hot_keys=[0, 1]).count()
    assert salted == plain
    # salts distribute the hot keys' rows across >1 partition-key values
    dist = (
        salted_join(li, su, "l_suppkey", salts=4, hot_keys=[0, 1])
        .filter(F.col("b.l_suppkey").isin([0, 1]))
        .select("b._salt")
        .distinct()
        .count()
    )
    assert dist > 1