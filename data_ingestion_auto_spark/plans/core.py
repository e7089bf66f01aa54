"""Core relational queries: the flagship anomaly pipeline + scan/filter/
project/join/aggregate coverage (SURVEY §2.1, §2.3-2.5, §7.5).

Scale notes on each query's physical plan are in the docstrings; the shared
principles: filters/projections sit directly on the parquet scan (pushdown +
pruning), small sides of joins are broadcast explicitly, and aggregations
are expressed so Catalyst plans partial (map-side) aggregation before the
shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .helpers import REVENUE, T, dec_avg, dec_sum, spread, sql_dec_avg, sql_dec_sum
from .registry import query

# ---------------------------------------------------------------------------
# Flagship (SURVEY §7.5): monthly revenue anomaly by market segment.
# Models the CHIRPS current-vs-climatology anomaly pipeline
# (reference ingest/chirps_rainfall/__init__.py:94-104,228-275): per-group
# mean over history = "climatological normal" (A1), broadcast join of current
# period against the normal (J1), null-safe anomaly projection (F13).
# ---------------------------------------------------------------------------


@query(
    "flagship_revenue_anomaly",
    oracle=f"""
WITH joined AS (
  SELECT c.c_mktsegment AS mktsegment,
         strftime(o.o_orderdate, '%Y-%m') AS month,
         CAST(month(o.o_orderdate) AS INTEGER) AS moy,
         {REVENUE} AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
),
monthly AS (
  SELECT mktsegment, month, moy, {sql_dec_sum('rev', 'revenue')}
  FROM joined GROUP BY 1, 2, 3
),
normal AS (
  SELECT mktsegment, moy, {sql_dec_avg('revenue', 'normal_revenue', 2)}
  FROM monthly GROUP BY 1, 2
)
SELECT m.mktsegment, m.month, m.revenue, n.normal_revenue,
       round(m.revenue - n.normal_revenue, 2) AS anomaly
FROM monthly m JOIN normal n ON m.mktsegment = n.mktsegment AND m.moy = n.moy
ORDER BY m.mktsegment, m.month
""",
    tags=("flagship", "join", "agg", "A1", "J1", "F13"),
)
def flagship_revenue_anomaly(spark, sf_dir):
    """Current-vs-climatology anomaly join (A1 + J1 + F13).

    Physical plan: lineitem⋈orders shuffles on orderkey; customer grows
    with SF (150k×SF rows), so it carries NO broadcast hint — AQE picks
    broadcast while it fits (it does at bench scale; the plan pin
    asserts the realized BroadcastHashJoin) and degrades to a shuffle
    join at the scale where a forced broadcast would be the bug. The
    per-(segment, month-of-year) climatology normal is a PARTITION
    WINDOW over the monthly aggregate (optimization r13) — the old
    groupBy + broadcast self-join re-planned the whole join subtree
    under both branches (six scans); the window computes the identical
    dec_avg arithmetic in one pass and is partitioned (≤ 5×12 groups,
    never a single-partition window).
    """
    # lineitem is pruned to the 3 needed columns and scan-spread before
    # the join (optimization r13: the fixture file is one row group, so
    # the join + partial aggregation otherwise fuse into a single task;
    # no-op at real multi-file scale)
    li = spread(
        T(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
    )
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .select(
            F.col("c_mktsegment").alias("mktsegment"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.month("o_orderdate").alias("moy"),
            F.expr(REVENUE).alias("rev"),
        )
    )
    monthly = joined.groupBy("mktsegment", "month", "moy").agg(dec_sum("rev", "revenue"))
    # Climatology normal as a PARTITION WINDOW over the monthly frame
    # (optimization r13, guide §2.4): the old groupBy + broadcast-join
    # form re-planned the whole lineitem⋈orders⋈customer + monthly
    # subtree under BOTH join branches — six scans for one logical pass.
    # The window computes dec_avg's EXACT arithmetic (decimal micro-unit
    # sum, integer round-half-away, one IEEE divide — helpers._avg_sql)
    # partitioned by (mktsegment, moy): identical values, one subtree,
    # and never a single-partition window.
    wspec = "PARTITION BY mktsegment, moy"
    s = f"CAST(sum(CAST(revenue AS DECIMAL(38,6))) OVER ({wspec}) * 1000000 AS BIGINT)"
    n = f"count(revenue) OVER ({wspec})"
    m = 10 ** (6 - 2)
    sgn = f"(CASE WHEN {s} < 0 THEN -1 ELSE 1 END)"
    mag = f"((2 * abs({s}) + {n} * {m}) div (2 * {n} * {m}))"
    normal = f"CAST(({sgn} * {mag} * {m}) AS DOUBLE) / 1000000.0"
    return (
        monthly.select(
            "mktsegment",
            "month",
            "revenue",
            F.expr(normal).alias("normal_revenue"),
        )
        .withColumn(
            "anomaly", F.round(F.col("revenue") - F.col("normal_revenue"), 2)
        )
        .orderBy("mktsegment", "month")
    )


@query(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dec_sum('l_quantity', 'sum_qty')},
       {sql_dec_sum('l_extendedprice', 'sum_base_price')},
       {sql_dec_sum(REVENUE, 'sum_disc_price')},
       {sql_dec_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_dec_avg('l_quantity', 'avg_qty')},
       {sql_dec_avg('l_extendedprice', 'avg_price')},
       {sql_dec_avg('l_discount', 'avg_disc')},
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("agg", "A1", "F1"),
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped grouped aggregation: 8 aggregates over a pushed-down
    time filter. The shipdate predicate reaches the parquet scan
    (PushedFilters) and only 8 of 11 columns are read (ReadSchema); partial
    aggregation runs map-side so the shuffle carries ≤ (4 groups × partial
    states), not rows.
    """
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity", "sum_qty"),
            dec_sum("l_extendedprice", "sum_base_price"),
            dec_sum(REVENUE, "sum_disc_price"),
            dec_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"),
            dec_avg("l_quantity", "avg_qty"),
            dec_avg("l_extendedprice", "avg_price"),
            dec_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "top_orders_by_revenue",
    oracle=f"""
SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
       {sql_dec_sum(REVENUE, 'revenue')}
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
    tags=("join", "agg", "topk", "O3"),
)
def top_orders_by_revenue(spark, sf_dir):
    """Join + aggregate + global top-k (SURVEY O1/O3). Spark executes the
    LIMIT as TakeOrderedAndProject — per-partition top-10 then a single
    driver merge; no global sort materializes at any scale.
    """
    li = T(spark, sf_dir, "lineitem")
    od = T(spark, sf_dir, "orders")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(REVENUE, "revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@query(
    "regional_revenue",
    oracle=f"""
SELECT r.r_name AS region, n.n_name AS nation, {sql_dec_sum(REVENUE, 'revenue')}
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
ORDER BY region, nation
""",
    tags=("join", "agg", "broadcast"),
)
def regional_revenue(spark, sf_dir):
    """Five-way star join (SURVEY §2.4 general surface). nation/region
    are structurally constant (25/5 rows) and carry broadcast hints;
    customer is SF-proportional, so broadcast-vs-shuffle is AQE's call
    (broadcast at bench scale, shuffle once it outgrows the threshold).
    The only guaranteed shuffle is lineitem⋈orders on orderkey, then the
    partial-aggregated shuffle to (region, nation). At 100 TB the
    fact-fact join dominates.
    """
    li = T(spark, sf_dir, "lineitem")
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = T(spark, sf_dir, "nation")
    re = T(spark, sf_dir, "region")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(dec_sum(REVENUE, "revenue"))
        .orderBy("region", "nation")
    )


# ---------------------------------------------------------------------------
# Projection / scalar-conversion layer (SURVEY F1-F3, P1-P5).
# ---------------------------------------------------------------------------


@query(
    "unit_convert_projection",
    oracle="""
SELECT event_id,
       round(value - 273.15, 6) AS value_celsius,
       round(value * 1000.0, 6) AS value_milli,
       CAST(floor(value / 100.0) AS INTEGER) AS value_hpa,
       round(value + 0.5, 6) AS value_offset
FROM events
ORDER BY event_id
""",
    tags=("projection", "F1", "F3"),
)
def unit_convert_projection(spark, sf_dir):
    """Config-compiled unit conversion (F1): the reference's
    ``convert_data`` (reference ingest/utils.py:165-175) supports {*,/,-,+}
    with a constant; here each becomes a codegen'd Column expression — pure
    projection, no shuffle, whole-stage codegen. The Pa→hPa integer label
    (F3, reference ecmwf_opendata/__init__.py:397) is the floor-divide cast.
    """
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(F.col("value") - 273.15, 6).alias("value_celsius"),
        F.round(F.col("value") * 1000.0, 6).alias("value_milli"),
        F.floor(F.col("value") / 100.0).cast("int").alias("value_hpa"),
        F.round(F.col("value") + 0.5, 6).alias("value_offset"),
    ).orderBy("event_id")


@query(
    "derived_wind_speed",
    oracle="""
SELECT p_partkey,
       round(sqrt(p_size * p_size + p_retailprice * p_retailprice), 6) AS speed
FROM part
ORDER BY p_partkey
""",
    tags=("projection", "F2", "J2"),
)
def derived_wind_speed(spark, sf_dir):
    """Derived-variable computation sqrt(u²+v²) (F2/J2, reference
    ecmwf_opendata/__init__.py:495-497). In the wide data model the u⋈v
    "join" is a multi-column projection — no join, no shuffle (SURVEY J2's
    preferred mapping).
    """
    pa = T(spark, sf_dir, "part")
    return pa.select(
        "p_partkey",
        F.round(
            F.sqrt(F.col("p_size") * F.col("p_size") + F.col("p_retailprice") * F.col("p_retailprice")),
            6,
        ).alias("speed"),
    ).orderBy("p_partkey")


@query(
    "time_slice_filter",
    oracle="""
SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_iso, user_id, event_type, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-02 00:00:00' AND ts < TIMESTAMP '2024-01-03 00:00:00'
ORDER BY event_id
""",
    tags=("filter", "P2", "F4"),
)
def time_slice_filter(spark, sf_dir):
    """Time-slice selection (P2: the reference's ``isel(time=i)`` loop) as a
    pushed-down range predicate on the scan, plus the reference's ISO
    timestamp formatting (F4, ecmwf_opendata/__init__.py:311-312). At scale
    the time predicate prunes entire partitions of a time-partitioned table.
    """
    ev = T(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-02 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-03 00:00:00").cast("timestamp"))
        )
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("ts_iso"),
            "user_id",
            "event_type",
            "value",
        )
        .orderBy("event_id")
    )


@query(
    "nodata_normalize",
    oracle="""
SELECT event_id,
       CASE WHEN value < 10.0 THEN NULL ELSE value END AS value_clean,
       (value >= 10.0) AS is_valid
FROM events
ORDER BY event_id
""",
    tags=("filter", "P4", "P5", "F13"),
)
def nodata_normalize(spark, sf_dir):
    """Sentinel→NULL nodata normalization (P4/P5; SURVEY §7.4's one-rule
    policy: sentinel becomes NULL at scan, arithmetic propagates NULL,
    sentinel re-materializes only at sink). Models
    reference dustforecast/__init__.py:130-138 and
    chirps_rainfall/__init__.py:100-102 mask semantics.
    """
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") < 10.0, F.lit(None).cast("double")).otherwise(F.col("value")).alias("value_clean"),
        (F.col("value") >= 10.0).alias("is_valid"),
    ).orderBy("event_id")
