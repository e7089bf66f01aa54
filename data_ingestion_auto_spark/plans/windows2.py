"""RANGE-frame windows (value- and time-based frames — the remaining
frame-spec surface beyond the ROWS frames in plans/windows.py)."""

from __future__ import annotations

from pyspark.sql import Window as W  # noqa: F401 — used by the time-frame query
from pyspark.sql import functions as F

from .helpers import T
from .registry import query


@query(
    "range_frame_account_density",
    oracle="""
SELECT c_custkey, c_acctbal,
       count(*) OVER (ORDER BY c_acctbal RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING)
         AS n_within_500
FROM customer
ORDER BY c_custkey
""",
    tags=("window", "range-frame"),
)
def range_frame_account_density(spark, sf_dir):
    """Value-based RANGE frame: for each customer, how many customers have
    an account balance within ±500 — a windowed band count (the grid
    analogue: neighborhood density along a value axis). One global sort on
    the frame key; at scale this partitions by a coarse bucket first
    (same pattern as the bbox join's space bucketization)."""
    cu = T(spark, sf_dir, "customer")
    # PySpark's Window.rangeBetween only takes integer offsets; the
    # decimal-valued frame goes through the SQL expression form.
    return (
        cu.select(
            "c_custkey",
            "c_acctbal",
            F.expr(
                "count(*) OVER (ORDER BY c_acctbal "
                "RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING)"
            ).alias("n_within_500"),
        )
        .orderBy("c_custkey")
    )


@query(
    "time_range_frame_rolling_count",
    oracle="""
SELECT event_id, user_id,
       count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour
FROM events
ORDER BY event_id
""",
    tags=("window", "range-frame", "time"),
)
def time_range_frame_rolling_count(spark, sf_dir):
    """Time-based RANGE frame: events per user in the trailing hour —
    the rolling-window rate metric. Frame key = integer microsecond epoch
    (portable; interval-literal RANGE frames differ between engines)."""
    ev = T(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.select("event_id", "user_id", F.count("*").over(w).alias("n_last_hour"))
        .orderBy("event_id")
    )


@query(
    "scd2_priority_history",
    oracle="""
WITH ordered AS (
  SELECT o_custkey AS custkey, o_orderpriority AS priority, o_orderdate AS odate, o_orderkey,
         lag(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
),
changes AS (
  SELECT custkey, priority, odate, o_orderkey
  FROM ordered WHERE prev IS NULL OR priority <> prev
),
versions AS (
  SELECT custkey, priority,
         strftime(odate, '%Y-%m-%d') AS valid_from,
         strftime(lead(odate) OVER (PARTITION BY custkey ORDER BY odate, o_orderkey),
                  '%Y-%m-%d') AS valid_to,
         (lead(odate) OVER (PARTITION BY custkey ORDER BY odate, o_orderkey) IS NULL)
           AS is_current
  FROM changes
),
no_orders AS (
  SELECT c_custkey AS custkey, 'NONE' AS priority, '1992-01-01' AS valid_from,
         CAST(NULL AS VARCHAR) AS valid_to, TRUE AS is_current
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
)
SELECT * FROM versions
UNION ALL
SELECT * FROM no_orders
ORDER BY custkey, valid_from, priority
""",
    tags=("scd2", "window", "anti-join", "union", "W9"),
)
def scd2_priority_history(spark, sf_dir):
    """SCD2 slowly-changing-dimension build (VERDICT round-1 item #9, the
    W9 incremental-upsert generalization): each customer's order-priority
    timeline becomes type-2 version rows — consecutive duplicates dropped
    via lag (change detection), validity intervals closed via lead
    (valid_from/valid_to/is_current), and never-ordered customers get a
    default current row via anti-join + union. The pattern composes only
    shuffle-on-custkey windows and one broadcast-able anti-join — at scale
    this is the standard Delta-less SCD2 merge shape.
    """
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer")
    from pyspark.sql import Window as W2

    w = W2.partitionBy("custkey").orderBy("odate", "o_orderkey")
    ordered = od.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("odate"),
        "o_orderkey",
    ).withColumn("prev", F.lag("priority").over(w))
    changes = ordered.filter(F.col("prev").isNull() | (F.col("priority") != F.col("prev")))
    lead_date = F.lead("odate").over(w)
    versions = changes.select(
        "custkey",
        "priority",
        F.date_format("odate", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(lead_date, "yyyy-MM-dd").alias("valid_to"),
        lead_date.isNull().alias("is_current"),
    )
    no_orders = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left_anti")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.lit("NONE").alias("priority"),
            F.lit("1992-01-01").alias("valid_from"),
            F.lit(None).cast("string").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return versions.unionByName(no_orders).orderBy("custkey", "valid_from", "priority")


@query(
    "window_value_functions",
    oracle="""
SELECT user_id, event_id,
       first_value(value) OVER w AS first_v,
       nth_value(value, 3) OVER w AS third_v,
       last_value(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_v
FROM events
WHERE user_id < 30
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
""",
    tags=("window", "value-functions"),
)
def window_value_functions(spark, sf_dir):
    """Window VALUE functions (first_value / nth_value / last_value) with
    explicit frames — the remaining §2.6 analytic trio: per user in event
    order, the session's opening value, the third value once seen (NULL
    before — nth_value's frame-sensitive semantics), and the final value
    via an unbounded-following frame. Values pass through unchanged (no
    float arithmetic), so cross-engine parity is exact. One shuffle on
    user_id serves all three windows (same partitioning + ordering)."""
    from pyspark.sql import Window as W

    ev = T(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wfull = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return ev.select(
        "user_id",
        "event_id",
        F.first("value").over(w).alias("first_v"),
        F.nth_value("value", 3).over(w).alias("third_v"),
        F.last("value").over(wfull).alias("final_v"),
    ).orderBy("user_id", "event_id")
