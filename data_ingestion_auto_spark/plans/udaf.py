"""Grouped-aggregate Pandas UDF (UDAF) — the one UDF shape the rest of
the engine doesn't exercise (SURVEY §2.10 general surface: pandas_udf
grouped-agg). Arrow-batched: each group's column arrives as one pandas
Series; the return is a scalar per group.

Used only where built-ins genuinely can't express the aggregate — here
median absolute deviation (a robust spread measure needing two dependent
medians). The oracle computes the same thing relationally (two
quantile_cont passes); numpy's median and DuckDB's quantile_cont both use
average-of-middle-two interpolation, so results are bit-comparable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from .helpers import T
from .registry import query


def _mad_udf():
    # created lazily: pandas_udf registration needs an active SparkSession,
    # and this module imports before any session exists
    @F.pandas_udf("double")
    def _mad(v: pd.Series) -> float:
        med = v.median()
        return round(float((v - med).abs().median()), 6)

    return _mad


@query(
    "udaf_median_abs_deviation",
    oracle="""
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS m
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag AS l_returnflag,
       round(quantile_cont(abs(l.l_quantity - med.m), 0.5), 6) AS mad_qty,
       count(*) AS n
FROM lineitem l JOIN med ON l.l_returnflag = med.l_returnflag
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
    tags=("udaf", "pandas_udf", "robust-stats"),
)
def udaf_median_abs_deviation(spark, sf_dir):
    """Median absolute deviation of quantity per return flag via a
    grouped-agg pandas UDF. Scale note: a grouped-agg UDF materializes
    each group's column in one worker — fine for bounded groups (3 flags);
    for high-cardinality groups prefer the two-pass relational form the
    oracle uses (or approx_percentile)."""
    li = T(spark, sf_dir, "lineitem")
    mad = _mad_udf()
    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg —
    # compute the count separately and join (both tiny per-group results)
    mads = li.groupBy("l_returnflag").agg(mad("l_quantity").alias("mad_qty"))
    counts = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    return mads.join(counts, "l_returnflag").select(
        "l_returnflag", "mad_qty", "n"
    ).orderBy("l_returnflag")
