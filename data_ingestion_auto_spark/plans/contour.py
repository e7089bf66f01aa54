"""U2 contour extraction as an ORACLED query (round-2 verdict item #9).

``operators/contour.py`` (the applyInPandas marching-squares UDTF,
reference utils.py:178-192 / ingest/__init__.py:116-136) was pytest-only:
"iterative raster tracing, no SQL equivalent". But the per-cell part IS
SQL-expressible: a marching-squares cell either side of each contour level
is a CASE over its 4 corner signs, the crossing points are fixed-form
linear interpolation, and the Python pairs crossings in edge order — all
replayable in DuckDB with the exact same IEEE-double evaluation order and
the same ``%.6f`` WKT formatting (the warp kernel proved numpy↔SQL
bit-for-bit parity is achievable; this applies the same discipline).

So the hash match verifies the REAL operator — the same
``contour_features`` applyInPandas that the streaming sink path uses —
not a SQL re-statement on the Spark side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.contour import contour_features
from .helpers import dec_avg, sort_small, sql_dec_avg
from .registry import query
from .warp import _dense_grid, _NX, _NY

_INT = 5.0  # contour interval, matching the reference's `gdal_contour -i 5`

# The dense 10×12 two-variable grid shared with warp_resample_grid: values
# are per-cell max/min of events.value (order-independent aggregates →
# engine-portable doubles), empty cells 0.0.
_DENSE_SQL = f"""
cells AS (
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
    "contour_segments_grid",
    oracle=f"""
WITH {_DENSE_SQL},
stats AS (
  SELECT variable, floor(min(value) / {_INT}) * {_INT} AS lo, max(value) AS hi
  FROM dense GROUP BY variable
),
levels AS (
  -- Python walks level = lo + i, lo + 2i, ... while < hi by repeated
  -- addition; with interval 5.0 and integer lo both forms are exact, so
  -- lo + n*5.0 reproduces the identical doubles. The series bound is
  -- DERIVED from the data range (round-3 advice: a fixed 200-level cap
  -- would silently drop levels if the value range ever grew past
  -- 200*interval while the Spark operator kept walking).
  SELECT s.variable, s.lo + CAST(ns.n AS DOUBLE) * {_INT} AS level_value
  FROM stats s,
       LATERAL (SELECT unnest(generate_series(
                    1, CAST(ceil((s.hi - s.lo) / {_INT}) AS BIGINT))) AS n) ns
  WHERE s.lo + CAST(ns.n AS DOUBLE) * {_INT} < s.hi
),
corners AS (
  SELECT l.variable, l.level_value, yy.y AS iy, xx.x AS ix,
         c0.value AS v0, c1.value AS v1, c2.value AS v2, c3.value AS v3
  FROM levels l
  CROSS JOIN (SELECT unnest(generate_series(0, {_NY - 2})) AS y) yy
  CROSS JOIN (SELECT unnest(generate_series(0, {_NX - 2})) AS x) xx
  JOIN dense c0 ON c0.variable = l.variable AND c0.y = yy.y     AND c0.x = xx.x
  JOIN dense c1 ON c1.variable = l.variable AND c1.y = yy.y     AND c1.x = xx.x + 1
  JOIN dense c2 ON c2.variable = l.variable AND c2.y = yy.y + 1 AND c2.x = xx.x + 1
  JOIN dense c3 ON c3.variable = l.variable AND c3.y = yy.y + 1 AND c3.x = xx.x
),
-- cell corner order 0:(iy,ix) 1:(iy,ix+1) 2:(iy+1,ix+1) 3:(iy+1,ix);
-- edge e joins corner e to corner (e+1) % 4 — same order as the Python.
edges AS (
  SELECT variable, level_value, iy, ix, es.e,
         CASE es.e WHEN 0 THEN v0 WHEN 1 THEN v1 WHEN 2 THEN v2 ELSE v3 END AS va,
         CASE es.e WHEN 0 THEN v1 WHEN 1 THEN v2 WHEN 2 THEN v3 ELSE v0 END AS vb,
         CASE es.e WHEN 0 THEN iy     WHEN 1 THEN iy     WHEN 2 THEN iy + 1 ELSE iy + 1 END AS ya,
         CASE es.e WHEN 0 THEN ix     WHEN 1 THEN ix + 1 WHEN 2 THEN ix + 1 ELSE ix     END AS xa,
         CASE es.e WHEN 0 THEN iy     WHEN 1 THEN iy + 1 WHEN 2 THEN iy + 1 ELSE iy     END AS yb,
         CASE es.e WHEN 0 THEN ix + 1 WHEN 1 THEN ix + 1 WHEN 2 THEN ix     ELSE ix     END AS xb
  FROM corners CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS e) es
),
crossings AS (
  SELECT variable, level_value, iy, ix, e,
         CAST(xa AS DOUBLE) + ((level_value - va) / (vb - va)) * (CAST(xb AS DOUBLE) - CAST(xa AS DOUBLE)) AS cx,
         CAST(ya AS DOUBLE) + ((level_value - va) / (vb - va)) * (CAST(yb AS DOUBLE) - CAST(ya AS DOUBLE)) AS cy
  FROM edges
  WHERE (va >= level_value) <> (vb >= level_value)
),
paired AS (
  SELECT *, row_number() OVER (
    PARTITION BY variable, level_value, iy, ix ORDER BY e) AS rn
  FROM crossings
),
segs AS (
  -- crossings pair sequentially in edge order: (1,2) then (3,4) — the
  -- Python's saddle handling exactly.
  SELECT variable, level_value, iy, ix, (rn - 1) // 2 AS sid,
         max(CASE WHEN rn % 2 = 1 THEN cx END) AS ax,
         max(CASE WHEN rn % 2 = 1 THEN cy END) AS ay,
         max(CASE WHEN rn % 2 = 0 THEN cx END) AS bx,
         max(CASE WHEN rn % 2 = 0 THEN cy END) AS byy
  FROM paired
  GROUP BY variable, level_value, iy, ix, (rn - 1) // 2
  HAVING count(*) = 2
)
SELECT variable, level_value, 'LineString' AS geom_type,
       printf('LINESTRING (%.6f %.6f, %.6f %.6f)', ax, ay, bx, byy) AS geom_wkt,
       CAST(count(*) OVER (PARTITION BY variable, level_value) AS BIGINT) AS n_segments
FROM segs
ORDER BY variable, level_value, geom_wkt
""",
    tags=("U2", "contour", "applyInPandas", "udtf"),
)
def contour_segments_grid(spark, sf_dir):
    """Marching-squares contours of the warp dense grid at interval 5,
    traced by the REAL ``contour_features`` applyInPandas operator; the
    DuckDB oracle replays the cell classification (16 corner-sign
    configurations as CASE), the edge-order crossing pairing, and the
    interpolation arithmetic with identical IEEE evaluation order and
    ``%.6f`` WKT formatting — a bit-for-bit hash match on the UDTF."""
    grid = _dense_grid(spark, sf_dir).withColumn(
        "time", F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    feats = contour_features(grid, interval=_INT)
    # sort_small: orderBy's range sampler would trace the contours twice
    # through the applyInPandas boundary (plans/helpers.py, r13)
    return sort_small(
        feats.select("variable", "level_value", "geom_type", "geom_wkt", "n_segments"),
        "variable",
        "level_value",
        "geom_wkt",
    )


@query(
    "focal_mean_3x3",
    oracle=f"""
WITH {_DENSE_SQL},
offsets AS (
  SELECT dy.v AS dy, dx.v AS dx
  FROM (SELECT unnest([-1, 0, 1]) AS v) dy
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS v) dx
),
contrib AS (
  SELECT d.variable, d.y + o.dy AS ty, d.x + o.dx AS tx, d.value
  FROM dense d CROSS JOIN offsets o
  WHERE d.y + o.dy BETWEEN 0 AND {_NY - 1}
    AND d.x + o.dx BETWEEN 0 AND {_NX - 1}
)
SELECT variable, CAST(ty AS BIGINT) AS y, CAST(tx AS BIGINT) AS x,
       CAST(count(*) AS BIGINT) AS n_neighbors,
       {sql_dec_avg("value", "focal_mean")}
FROM contrib
GROUP BY variable, ty, tx
ORDER BY variable, y, x
""",
    tags=("spatial", "raster", "focal", "neighborhood"),
)
def focal_mean_3x3(spark, sf_dir):
    """Focal (neighborhood) statistics — the classic raster smoothing
    operator the reference's GDAL stack provides via warp kernels: each
    cell's mean over its 3×3 neighborhood, edge cells averaging their
    in-bounds neighbors only. Spark shape: SCATTER, not gather — each
    source cell contributes itself to its 9 target positions via a 9-row
    offset explode (a projection), then one groupBy on target cell; no
    self-join chain, one shuffle total. The mean uses the helpers' exact
    integer micro-unit average (decimal division scale rules differ
    between engines at repeating decimals like sum/3), so both engines
    produce bit-identical doubles. At 100 TB the offset explode is
    map-side and the shuffle carries partial aggregates — linear in grid
    size."""
    grid = _dense_grid(spark, sf_dir)
    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    off_expr = "array(" + ", ".join(f"struct({dy} AS dy, {dx} AS dx)" for dy, dx in offsets) + ")"
    contrib = (
        grid.select(
            "variable", "y", "x", "value", F.explode(F.expr(off_expr)).alias("o")
        )
        .select(
            "variable",
            (F.col("y") + F.col("o.dy")).alias("ty"),
            (F.col("x") + F.col("o.dx")).alias("tx"),
            "value",
        )
        .filter(
            F.col("ty").between(0, _NY - 1) & F.col("tx").between(0, _NX - 1)
        )
    )
    return (
        contrib.groupBy("variable", "ty", "tx")
        .agg(
            F.count("*").cast("bigint").alias("n_neighbors"),
            dec_avg("value", "focal_mean"),
        )
        .select(
            "variable",
            F.col("ty").cast("bigint").alias("y"),
            F.col("tx").cast("bigint").alias("x"),
            "n_neighbors",
            "focal_mean",
        )
        .orderBy("variable", "y", "x")
    )
