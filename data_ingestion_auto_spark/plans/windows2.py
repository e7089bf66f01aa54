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
