"""Relational surface round-out: grid-binned spatial join (the scale
path for J3), unpivot/melt reshape, and distribution-position windows
(percent_rank / cume_dist).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .helpers import T
from .registry import query

_CELL = 20.0  # degrees; boxes span exactly 20×20 so each covers ≤ 2×2 cells


@query(
    "range_bbox_join_binned",
    oracle="""
WITH boxes AS (
  SELECT n_nationkey AS box_id,
         (n_nationkey * 14.0) - 180.0 AS xmin, (n_nationkey * 14.0) - 160.0 AS xmax,
         (n_nationkey * 7.0) - 90.0 AS ymin, (n_nationkey * 7.0) - 70.0 AS ymax
  FROM nation
),
pts AS (
  SELECT event_id,
         ((value * 7.3) % 360.0) - 180.0 AS lon,
         ((value * 3.7) % 180.0) - 90.0 AS lat
  FROM events
)
SELECT b.box_id, count(*) AS n_points
FROM pts p JOIN boxes b
  ON p.lon >= b.xmin AND p.lon < b.xmax AND p.lat >= b.ymin AND p.lat < b.ymax
GROUP BY 1
ORDER BY box_id
""",
    tags=("join", "range", "spatial", "binned", "J3"),
)
def range_bbox_join_binned(spark, sf_dir):
    """The 100 TB physical plan for the bbox containment join
    (`range_bbox_join` is the broadcast-NLJ tier; this produces the SAME
    answer — same oracle — through space bucketing): every point lands in
    exactly one 20° grid cell, every box explodes to the ≤4 cells it
    touches, the candidate join is a plain shuffle EQUI-join on
    (cx, cy) with the exact interval predicate as a residual. No nested
    loop ever sees the cross product, and because a point has exactly one
    cell, no post-join dedup is needed. This is the tile-grid trick of
    the reference's sinusoidal tiling (modis/pymodis.py:29-40) applied as
    a join strategy."""
    na = T(spark, sf_dir, "nation")
    ev = T(spark, sf_dir, "events")
    boxes = na.select(
        F.col("n_nationkey").alias("box_id"),
        ((F.col("n_nationkey") * 14.0) - 180.0).alias("xmin"),
        ((F.col("n_nationkey") * 14.0) - 160.0).alias("xmax"),
        ((F.col("n_nationkey") * 7.0) - 90.0).alias("ymin"),
        ((F.col("n_nationkey") * 7.0) - 70.0).alias("ymax"),
    )
    pts = ev.select(
        "event_id",
        (((F.col("value") * 7.3) % 360.0) - 180.0).alias("lon"),
        (((F.col("value") * 3.7) % 180.0) - 90.0).alias("lat"),
    ).select(
        "event_id", "lon", "lat",
        F.floor((F.col("lon") + 180.0) / _CELL).alias("cx"),
        F.floor((F.col("lat") + 90.0) / _CELL).alias("cy"),
    )
    bcells = boxes.select(
        "box_id", "xmin", "xmax", "ymin", "ymax",
        F.explode(
            F.sequence(
                F.floor((F.col("xmin") + 180.0) / _CELL),
                F.floor((F.col("xmax") + 180.0) / _CELL),
            )
        ).alias("cx"),
    ).select(
        "*",
        F.explode(
            F.sequence(
                F.floor((F.col("ymin") + 90.0) / _CELL),
                F.floor((F.col("ymax") + 90.0) / _CELL),
            )
        ).alias("cy"),
    )
    exact = (
        (F.col("lon") >= F.col("xmin"))
        & (F.col("lon") < F.col("xmax"))
        & (F.col("lat") >= F.col("ymin"))
        & (F.col("lat") < F.col("ymax"))
    )
    return (
        pts.join(bcells, ["cx", "cy"])
        .filter(exact)
        .groupBy("box_id")
        .agg(F.count("*").alias("n_points"))
        .orderBy("box_id")
    )


@query(
    "unpivot_part_measures",
    oracle="""
SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS val FROM part
UNION ALL
SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) AS val FROM part
ORDER BY p_partkey, measure
""",
    tags=("reshape", "unpivot", "melt"),
)
def unpivot_part_measures(spark, sf_dir):
    """Wide→long reshape via Spark's native unpivot (melt) — the inverse
    of `pivot_segment_status`. The oracle states the semantics as the
    UNION ALL it desugars to. Unpivot is a projection-time explode: no
    shuffle, output rows = rows × measures, columns pruned to ids +
    measures at the scan."""
    pa = T(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_retailprice"), F.col("p_size").cast("double").alias("p_size")
    )
    return pa.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="measure",
        valueColumnName="val",
    ).orderBy("p_partkey", "measure")


@query(
    "window_distribution_position",
    oracle="""
WITH w AS (
  SELECT l_returnflag, l_linestatus,
         percent_rank() OVER (PARTITION BY l_returnflag, l_linestatus ORDER BY l_quantity) AS pr,
         cume_dist() OVER (PARTITION BY l_returnflag, l_linestatus ORDER BY l_quantity) AS cd
  FROM lineitem
)
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CASE WHEN pr <= 0.25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bottom_quartile,
       CAST(sum(CASE WHEN cd <= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_cume_half
FROM w
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("window", "percent_rank", "cume_dist"),
)
def window_distribution_position(spark, sf_dir):
    """Distribution-position windows: percent_rank ((rank-1)/(n-1)) and
    cume_dist (rank_from_top/n) are exact rationals of integer rank and
    count, so the quartile/median-half memberships compare identically
    across engines even with ties (tie groups share a rank by the SQL
    standard).

    Optimization r13 (guide §2.3 "aggregate before you shuffle"): every
    row of a tie group has the SAME pr and cd, so the row-level window
    collapses to a value histogram — aggregate to (flag, status,
    quantity, cnt) first (partial-aggregating groupBy: ~6×50 rows cross
    the exchange instead of all of lineitem), then rank/cume over the
    tiny histogram (rank = 1 + running count of strictly-smaller values;
    cume = running count inclusive / n) and weight each tie group by
    cnt. The divisions replay Spark's own PercentRank/CumeDist
    arithmetic — (rank-1)/(n-1) and cum_le/n in IEEE double (n=1 guard
    matching percent_rank's 0.0) — so the 0.25/0.5 memberships are
    bit-identical to the window form; the old 6-partition full-data sort
    is gone. Before: window over all of lineitem (1.68 s); after:
    map-side partial agg + 300-row window."""
    hist = (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus", "l_quantity")
        .agg(F.count("*").alias("cnt"))
    )
    wg = Window.partitionBy("l_returnflag", "l_linestatus")
    wo = wg.orderBy("l_quantity")
    cum_le = F.sum("cnt").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    n = F.sum("cnt").over(wg)
    ranked = hist.select(
        "l_returnflag",
        "l_linestatus",
        "cnt",
        cum_le.alias("cum_le"),
        n.alias("n"),
    ).select(
        "l_returnflag",
        "l_linestatus",
        "cnt",
        "n",
        # rank of every row in this tie group = count of smaller rows + 1;
        # percent_rank = (rank-1)/(n-1) with the n=1 -> 0.0 special case
        # (PercentRank's own definition); cume_dist = cum_le/n.
        F.when(F.col("n") == 1, F.lit(0.0))
        .otherwise(
            (F.col("cum_le") - F.col("cnt")).cast("double")
            / (F.col("n") - 1).cast("double")
        )
        .alias("pr"),
        (F.col("cum_le").cast("double") / F.col("n").cast("double")).alias("cd"),
    )
    return (
        ranked.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("cnt").cast("bigint").alias("n"),
            F.sum(F.when(F.col("pr") <= 0.25, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_bottom_quartile"),
            F.sum(F.when(F.col("cd") <= 0.5, F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_cume_half"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
