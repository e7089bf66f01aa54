"""Shuffle-topology operators: bucketed co-located joins and skew-salted
joins (SURVEY §4 / SCALE.md "Partitioning & shuffle").

These are the two manual levers beyond AQE:

- **Bucketing**: pre-shuffle a fact table once at write time
  (`bucketBy(n, key)`); every later equi-join/aggregate on the key reads
  co-located buckets and skips its Exchange entirely. The 100 TB payoff:
  a nightly-written bucketed lineitem joins orders with zero shuffle per
  query instead of one per query.
- **Salting**: a hot key (the boilerplate-shingle bucket, the NULL-ish
  default user) overwhelms one reducer. Explode the small side × salt,
  scatter the big side's hot rows across salts, join on (key, salt) —
  uniform reducers at the cost of replicating the small side salt-fold.
  AQE's skew-join handles moderate skew at runtime; salting is the
  deterministic fallback for pathological keys.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8, sort_by: str | None = None
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table. Joins
    and aggregations on `key` between tables bucketed the same way run
    without an Exchange."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A fresh session's catalog may not know the table while its warehouse
    # dir still exists on disk (LOCATION_ALREADY_EXISTS) — clear it.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").replace("file:", "")
    loc = os.path.join(warehouse, table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys — the
    physical plan should contain no Exchange on either side (asserted in
    tests/test_skew.py)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_l] == rt[key_r])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 8,
    hot_keys: list | None = None,
) -> DataFrame:
    """Skew-aware equi-join: scatter the big side's hot keys across
    `salts` sub-keys; replicate only the small side's hot rows per salt.

    hot_keys=None salts every key (uniform scatter — simple, small-side
    × salts cost). With hot_keys, only the pathological keys pay.
    """
    if hot_keys is None:
        big_s = big.withColumn("_salt", (F.rand(seed=42) * salts).cast("int"))
        small_s = small.withColumn(
            "_salt", F.explode(F.expr(f"sequence(0, {salts - 1})"))
        )
    else:
        is_hot_b = F.col(key).isin(hot_keys)
        big_s = big.withColumn(
            "_salt", F.when(is_hot_b, (F.rand(seed=42) * salts).cast("int")).otherwise(F.lit(0))
        )
        small_s = small.withColumn(
            "_salt",
            F.explode(
                F.when(F.col(key).isin(hot_keys), F.expr(f"sequence(0, {salts - 1})")).otherwise(
                    F.array(F.lit(0))
                )
            ),
        )
    return big_s.alias("b").join(
        small_s.alias("s"),
        (F.col(f"b.{key}") == F.col(f"s.{key}")) & (F.col("b._salt") == F.col("s._salt")),
    )
