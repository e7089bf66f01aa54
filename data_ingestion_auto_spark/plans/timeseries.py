"""Time-series densification over the events table.

Gap-fill is the relational analogue of the reference's catch-up iteration
(`reference/ingest/tamsat_rainfall/__init__.py:96-104` advances one period
per tick until the calendar is dense): here the engine materializes the
dense calendar declaratively — per-key date spine via `sequence`/`explode`,
left join, then last-observation-carried-forward with an
`ignorenulls` running window.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .helpers import T, dec_sum, sql_dec_sum
from .registry import query


@query(
    "densify_daily_gapfill",
    oracle=f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, {sql_dec_sum("value", "day_value")}
  FROM events WHERE user_id < 20
  GROUP BY user_id, CAST(ts AS DATE)
),
span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id),
spine AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
),
filled AS (
  SELECT s.user_id, s.day, d.day_value
  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       last_value(day_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       (day_value IS NOT NULL) AS observed
FROM filled
ORDER BY user_id, day
""",
    tags=("timeseries", "densify", "gapfill", "window"),
)
def densify_daily_gapfill(spark, sf_dir):
    """Calendar densification + LOCF gap-fill: per-user daily totals, a
    generated date spine spanning each user's own [min, max] range, and
    last-observation-carried-forward for missing days. The spine is
    `sequence()`/`explode` off a per-key aggregate — rows are generated
    executor-side in proportion to each key's span, never enumerated on
    the driver — and the spine⋈daily join plus the LOCF window all
    partition on user_id, so the whole fill is one shuffle."""
    daily = (
        T(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(dec_sum("value", "day_value"))
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("day_value").isNotNull().alias("observed"),
        )
        .orderBy("user_id", "day")
    )
