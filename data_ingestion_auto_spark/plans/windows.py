"""Window-function / ordered-analytics queries (SURVEY §2.6).

The reference has no window machinery — its closest analogues are period
succession (dateutils.py:5-41), sorted listings, and first-feature
selections. The engine exposes the full native surface over the `events`
fixture: ranking, lag/lead, frame aggregates, top-k per group, and
gap-based sessionization (SURVEY W10's session grouping, done the batch way:
lag + cumulative flag sum).

Determinism: window SUM over doubles is association-order-sensitive (DuckDB
uses a segment tree; Spark accumulates over the frame), so frame sums run in
exact DECIMAL. Every ORDER BY inside a window carries `event_id` as a total
tiebreaker.

Scale: all windows partition by `user_id` — at 100 TB this is one shuffle on
a high-cardinality key (no global sort), and AQE handles skewed users.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .helpers import T
from .registry import query


@query(
    "window_rank_topk_per_user",
    oracle="""
SELECT user_id, event_id, value, rn
FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events
) t
WHERE rn <= 3
ORDER BY user_id, rn
""",
    tags=("window", "topk"),
)
def window_rank_topk_per_user(spark, sf_dir):
    """Top-k per group via row_number (the reference's limit(1)/head
    selections generalized, SURVEY O3). One shuffle on user_id; no global
    sort.
    """
    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("value"), F.col("event_id"))
    return (
        ev.select("user_id", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("user_id", "rn")
    )


@query(
    "window_lag_lead_delta",
    oracle="""
SELECT user_id, event_id,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       round(value - lag(value) OVER w, 6) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
""",
    tags=("window", "lag", "lead"),
)
def window_lag_lead_delta(spark, sf_dir):
    """lag/lead analytics — the engine's form of the reference's period
    succession (dateutils.py:5-41: "the partition after X").
    """
    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_running_sum",
    oracle="""
SELECT user_id, event_id,
       CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_value
FROM events
ORDER BY user_id, event_id
""",
    tags=("window", "frame"),
)
def window_running_sum(spark, sf_dir):
    """Running (prefix) aggregate with an explicit frame. DECIMAL
    accumulation keeps the prefix sums exact and engine-independent.
    """
    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, 0)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias("running_value"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_moving_avg",
    oracle="""
SELECT user_id, event_id,
       CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
            / count(value) OVER w AS DOUBLE) AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
""",
    tags=("window", "frame"),
)
def window_moving_avg(spark, sf_dir):
    """Sliding-frame mean (3-row moving average): exact decimal frame sum /
    frame count — one deterministic double division per row.
    """
    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    dec = F.col("value").cast("decimal(18,4)")
    return (
        ev.select(
            "user_id",
            "event_id",
            (F.sum(dec).over(w).cast("double") / F.count("value").over(w)).cast("double").alias("moving_avg"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "sessionize_events",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, event_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
    tags=("window", "session", "W10"),
)
def sessionize_events(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity gap), the batch analogue
    of `session_window` (SURVEY W10): lag-gap flag → prefix-sum session ids
    → per-session aggregate. Integer epoch arithmetic only — portable.
    """
    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, 0)
    prev_ts = F.lag("ts").over(w)
    # Micro-second integer epochs on both sides (DuckDB: epoch_us) — a
    # seconds-granularity gap would split sessions differently at the
    # boundary.
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    is_new = F.when(
        prev_ts.isNull() | ((us(F.col("ts")) - us(prev_ts)) > 1_800_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        ev.select("user_id", "event_id", "ts", is_new.alias("is_new"))
        .select("user_id", "event_id", F.sum("is_new").over(wrun).cast("bigint").alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy("user_id", "session_id")
    )
