"""U4 as a query surface: dense-grid construction + bilinear/nearest warp.

The oracle re-implements the kernel arithmetic in SQL with the exact same
IEEE-double evaluation order as ``operators/warp.py`` (fixed parenthesized
bilinear weights, corner-aligned ``t*(n_in-1)/(n_out-1)`` coordinates), so
the hash match verifies the numpy kernel bit-for-bit — not just shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.warp import warp_resample
from .helpers import T, sort_small
from .registry import query

# Source raster: 10×12; bilinear upsample to 15×20; nearest downsample to 7×9.
_NY, _NX = 10, 12


def _dense_grid(spark, sf_dir):
    """Two-variable dense raster from events: per-cell max (variable 'a')
    and min (variable 'b') — both order-independent aggregates, so the
    float values are engine-portable; empty cells coalesce to 0.0."""
    ev = T(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("event_id") % _NY).alias("y"), (F.col("user_id") % _NX).alias("x")
    ).agg(F.max("value").alias("a"), F.min("value").alias("b"))
    ys = spark.range(_NY).select(F.col("id").alias("y"))
    xs = spark.range(_NX).select(F.col("id").alias("x"))
    # VALUES literal (LocalTableScan), not a Python-RDD-backed local list
    vs = spark.sql("SELECT variable FROM (VALUES ('a'), ('b')) AS t(variable)")
    cells_long = cells.selectExpr("y", "x", "stack(2, 'a', a, 'b', b) AS (variable, mval)")
    return (
        ys.crossJoin(xs)
        .crossJoin(F.broadcast(vs))
        .join(cells_long, ["y", "x", "variable"], "left")
        .select("variable", "y", "x", F.coalesce("mval", F.lit(0.0)).alias("value"))
    )


# the dense-raster CTE pair, shared verbatim with plans/warp_kernels.py
# (every kernel oracle replays the same source image)
DENSE_CTES = f"""cells AS (
  SELECT CAST(event_id % {_NY} AS BIGINT) AS y, CAST(user_id % {_NX} AS BIGINT) AS x,
         max(value) AS a, min(value) AS b
  FROM events GROUP BY 1, 2
),
dense AS (
  SELECT yy.y, xx.x, v.variable,
         coalesce(CASE WHEN v.variable = 'a' THEN c.a ELSE c.b END, 0.0) AS value
  FROM (SELECT unnest(generate_series(0, {_NY - 1})) AS y) yy
  CROSS JOIN (SELECT unnest(generate_series(0, {_NX - 1})) AS x) xx
  CROSS JOIN (SELECT unnest(['a', 'b']) AS variable) v
  LEFT JOIN cells c ON c.y = yy.y AND c.x = xx.x
)"""


@query(
    "warp_resample_grid",
    oracle=f"""
WITH {DENSE_CTES},
bl_c AS (
  SELECT ty.y AS yt, tx.x AS xt,
         CAST(floor(CAST(ty.y * {_NY - 1} AS DOUBLE) / 14.0) AS BIGINT) AS y0,
         CAST(floor(CAST(tx.x * {_NX - 1} AS DOUBLE) / 19.0) AS BIGINT) AS x0,
         LEAST(CAST(floor(CAST(ty.y * {_NY - 1} AS DOUBLE) / 14.0) AS BIGINT) + 1, {_NY - 1}) AS y1,
         LEAST(CAST(floor(CAST(tx.x * {_NX - 1} AS DOUBLE) / 19.0) AS BIGINT) + 1, {_NX - 1}) AS x1,
         CAST(ty.y * {_NY - 1} AS DOUBLE) / 14.0
           - floor(CAST(ty.y * {_NY - 1} AS DOUBLE) / 14.0) AS dy,
         CAST(tx.x * {_NX - 1} AS DOUBLE) / 19.0
           - floor(CAST(tx.x * {_NX - 1} AS DOUBLE) / 19.0) AS dx
  FROM (SELECT unnest(generate_series(0, 14)) AS y) ty
  CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS x) tx
),
bl AS (
  SELECT 'bilinear' AS kernel, s00.variable, c.yt AS y, c.xt AS x,
         (1.0 - c.dy) * ((1.0 - c.dx) * s00.value + c.dx * s01.value)
         + c.dy * ((1.0 - c.dx) * s10.value + c.dx * s11.value) AS value
  FROM bl_c c
  JOIN dense s00 ON s00.y = c.y0 AND s00.x = c.x0
  JOIN dense s01 ON s01.variable = s00.variable AND s01.y = c.y0 AND s01.x = c.x1
  JOIN dense s10 ON s10.variable = s00.variable AND s10.y = c.y1 AND s10.x = c.x0
  JOIN dense s11 ON s11.variable = s00.variable AND s11.y = c.y1 AND s11.x = c.x1
),
nn AS (
  SELECT 'nearest' AS kernel, s.variable, t.yt AS y, t.xt AS x, s.value
  FROM (
    SELECT ty.y AS yt, tx.x AS xt,
           CAST(ty.y * {_NY - 1} AS DOUBLE) / 6.0 AS fy,
           CAST(tx.x * {_NX - 1} AS DOUBLE) / 8.0 AS fx
    FROM (SELECT unnest(generate_series(0, 6)) AS y) ty
    CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS x) tx
  ) t
  JOIN dense s ON s.y = LEAST(CAST(floor(t.fy + 0.5) AS BIGINT), {_NY - 1})
              AND s.x = LEAST(CAST(floor(t.fx + 0.5) AS BIGINT), {_NX - 1})
)
SELECT * FROM (SELECT * FROM bl UNION ALL SELECT * FROM nn)
ORDER BY kernel, variable, y, x
""",
    tags=("U4", "warp", "applyInPandas"),
)
def warp_resample_grid(spark, sf_dir):
    """U4 warp/resample (reference ingest/modis/convertmodis.py:38-56,
    :376-378): a two-variable dense raster built from events is bilinear-
    upsampled 10×12 → 15×20 and nearest-downsampled → 7×9 by the numpy
    applyInPandas kernel. The SQL oracle replays the identical arithmetic,
    so values match bit-for-bit."""
    grid = _dense_grid(spark, sf_dir)
    bl = warp_resample(grid, _NY, _NX, 15, 20, "bilinear").withColumn(
        "kernel", F.lit("bilinear")
    )
    nn = warp_resample(grid, _NY, _NX, 7, 9, "nearest").withColumn("kernel", F.lit("nearest"))
    return sort_small(
        bl.unionByName(nn).select("kernel", "variable", "y", "x", "value"),
        "kernel",
        "variable",
        "y",
        "x",
    )
