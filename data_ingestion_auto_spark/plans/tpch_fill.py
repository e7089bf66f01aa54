"""TPC-H fill: q2, q9, q11, q20 — the four shapes previously missing
from the numbered set (all partsupp-dependent in standard TPC-H; the
fixture schema has no partsupp table, so each is adapted to derive the
part↔supplier relation from lineitem, preserving the query SHAPE —
correlated min, multi-join profit rollup, global-threshold HAVING,
nested semi-join chain — which is what exercises the optimizer).

With these the registry covers all 22 numbered TPC-H query shapes.

Scale notes: dimension sides broadcast explicitly; the only fact-fact
shuffles are lineitem⋈orders (q9) and the lineitem self-derived catalog
aggregations, all keyed on their join columns with map-side partial
aggregation. The q11 global threshold is one scalar broadcast, not a
second pass.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .helpers import T
from .registry import query


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
cat AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2
),
ranked AS (
  SELECT p.p_partkey, p.p_name, e.s_name, e.n_name, e.s_acctbal, c.unit_cost,
         row_number() OVER (PARTITION BY p.p_partkey ORDER BY c.unit_cost, c.l_suppkey) AS rn
  FROM cat c JOIN eu e ON c.l_suppkey = e.s_suppkey
  JOIN part p ON c.l_partkey = p.p_partkey
  WHERE p.p_type = 'STANDARD' AND p.p_size <= 10
)
SELECT p_partkey, p_name, s_name, n_name, s_acctbal,
       floor(unit_cost * 10000) / 10000.0 AS unit_cost
FROM ranked WHERE rn = 1 ORDER BY p_partkey
""",
    tags=("tpch", "q2", "correlated-min"),
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H q2 shape (minimum-cost supplier; reference has no partsupp,
    so the part↔supplier catalog derives from lineitem: unit_cost =
    min observed l_extendedprice/l_quantity per pair). For each small
    STANDARD part, the EUROPE supplier achieving the minimum unit cost —
    the classic correlated-min, expressed as a row_number window with a
    deterministic (cost, suppkey) tie-break instead of a re-aggregating
    self-join: one window over the already-shuffled catalog, no second
    scan. nation/region keep broadcast hints (constant cardinality);
    the supplier slice and filtered part are SF-proportional — AQE
    decides broadcast-vs-shuffle for them.

    The displayed unit_cost TRUNCATES to 4 decimals (floor of an
    identical double is engine-portable) rather than rounding: an sf0.1
    row landed exactly on a .XXXX5 half-boundary where Spark's
    exact-expansion HALF_UP and DuckDB's scaled-double rounding disagree
    by one ulp — the precise hazard plans/helpers.py documents for
    aggregates, surfacing here on a scalar."""
    li = T(spark, sf_dir, "lineitem")
    eu = (
        T(spark, sf_dir, "supplier")
        .join(
            F.broadcast(T(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = T(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    # Optimization r13 (guide §3.2 — reduce the big side before
    # shuffling it): the part filter (STANDARD, size<=10, ~1/25 of part)
    # and the EUROPE supplier slice (~1/5) only ever DROP whole
    # (partkey, suppkey) groups downstream of the catalog aggregate —
    # min-per-group is untouched by removing other groups — so both
    # prune as semi-joins BEFORE the groupBy: the catalog exchange
    # carries ~1/125 of lineitem instead of all of it. The attribute
    # joins below are unchanged (they now match every surviving row by
    # construction). NO broadcast hints on the semi sides (optimization
    # r14, verdict r13 #2): part and supplier are SF-proportional, so a
    # forced broadcast OOMs at 100 TB — AQE/stats still broadcast them
    # at the scales where that is right (verified at sf0.1: the realized
    # plan keeps both BroadcastHashJoin LeftSemi without the hint),
    # exactly the rule r12 applied to regional_revenue's customer side.
    cat = (
        li.filter(F.col("l_quantity") > 0)
        .join(
            parts.select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            eu.select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_cost", "l_suppkey")
    return (
        # eu (region-restricted supplier slice) and parts (filtered
        # part slice) are SF-proportional — no hints, AQE decides.
        cat.join(eu, cat.l_suppkey == eu.s_suppkey)
        .join(parts, cat.l_partkey == parts.p_partkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            "s_acctbal",
            (F.floor(F.col("unit_cost") * 10000) / 10000.0).alias("unit_cost"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q9_product_type_profit",
    oracle="""
SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           - p.p_retailprice * l.l_quantity * 0.1 AS DECIMAL(38,6))), 2)
            AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget'
GROUP BY 1, 2 ORDER BY n_name, o_year
""",
    tags=("tpch", "q9", "profit"),
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H q9 shape (product-type profit by nation and year). Without
    partsupp's ps_supplycost the cost term is proxied as
    p_retailprice * l_quantity * 0.1 — same expression structure
    (revenue minus quantity-scaled cost), summed in exact DECIMAL(38,6)
    so both engines agree bit-for-bit. The '%widget' part filter prunes
    before the joins; nation keeps its broadcast hint, part/supplier are
    SF-proportional (AQE decides); lineitem⋈orders is the one fact-fact
    shuffle."""
    li = T(spark, sf_dir, "lineitem")
    od = T(spark, sf_dir, "orders")
    parts = T(spark, sf_dir, "part").filter(F.col("p_name").like("%widget"))
    sup = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation")
    profit = (
        "CAST(l_extendedprice * (1 - l_discount)"
        " - p_retailprice * l_quantity * 0.1 AS DECIMAL(38,6))"
    )
    return (
        # parts (name-filtered slice) and sup (full supplier) are
        # SF-proportional — no hints, AQE decides; nation keeps its.
        li.join(parts, li.l_partkey == parts.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.expr(f"CAST(round(sum({profit}), 2) AS DOUBLE)").alias("profit"))
        .orderBy("n_name", "o_year")
    )


@query(
    "q11_important_parts",
    oracle="""
WITH vals AS (
  SELECT l.l_partkey, sum(CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(38,6))) AS val
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY 1
),
tot AS (SELECT sum(val) AS total FROM vals)
SELECT v.l_partkey AS p_partkey,
       CAST(round(v.val, 2) AS DOUBLE) AS part_value
FROM vals v CROSS JOIN tot t
WHERE CAST(v.val AS DOUBLE) > CAST(t.total AS DOUBLE) / 1000.0
ORDER BY p_partkey
""",
    tags=("tpch", "q11", "global-threshold"),
)
def q11_important_parts(spark, sf_dir):
    """TPC-H q11 shape (important stock): per-part inventory value for
    one nation's suppliers (value proxied from lineitem flow, exact
    DECIMAL sums), kept only when above a fraction of the NATION-WIDE
    total — the global-scalar HAVING. The total is one scalar aggregate
    cross-joined (broadcast) back; the threshold compare runs in DOUBLE
    with identical IEEE evaluation on both engines. One shuffle for the
    per-part aggregate; the scalar pass reuses its result."""
    from ..checkpoints import ckpt

    li = T(spark, sf_dir, "lineitem")
    sup = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    # per-part values are read twice (global scalar + the threshold
    # filter); cut once so the lineitem⋈supplier join + aggregate don't
    # re-plan and re-execute under both consumers (optimization r14)
    vals = ckpt(
        # supplier is SF-proportional — no hint, AQE decides; the
        # 1-nation filter keeps its hint (nation is constant-sized).
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.expr("sum(CAST(l_extendedprice * l_quantity AS DECIMAL(38,6)))").alias("val")
        )
    )
    tot = vals.agg(F.sum("val").alias("total"))
    return (
        vals.crossJoin(F.broadcast(tot))
        .filter(F.col("val").cast("double") > F.col("total").cast("double") / 1000.0)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.expr("CAST(round(val, 2) AS DOUBLE)").alias("part_value"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q20_promotion_suppliers",
    oracle="""
WITH promo AS (SELECT p_partkey FROM part WHERE p_name LIKE '%widget'),
qty AS (
  SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS q
  FROM lineitem l JOIN promo p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
hot AS (SELECT DISTINCT l_suppkey FROM qty WHERE q > 50)
SELECT s.s_name, n.n_name, s.s_acctbal
FROM supplier s JOIN hot h ON s.s_suppkey = h.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
ORDER BY s_name
""",
    tags=("tpch", "q20", "nested-semi"),
)
def q20_promotion_suppliers(spark, sf_dir):
    """TPC-H q20 shape (potential part promotion): suppliers who moved
    more than a threshold quantity of promo-candidate ('%widget') parts
    in 1996 — the nested subquery chain (parts IN → quantities per
    (supplier, part) HAVING → suppliers IN) expressed as semi-join
    shapes whose build sides AQE broadcasts while they fit. The date predicate reaches the lineitem scan; quantity
    sums are per-(supplier, part) with map-side combine; the final hot
    supplier set broadcasts into the supplier dimension."""
    li = T(spark, sf_dir, "lineitem")
    promo = T(spark, sf_dir, "part").filter(F.col("p_name").like("%widget")).select("p_partkey")
    qty = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        # promo is a name-filtered part slice — SF-proportional, no hint.
        .join(promo, li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    hot = qty.filter(F.col("q") > 50).select("l_suppkey").distinct()
    sup = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation")
    return (
        # hot is a HAVING-selected supplier-key set — selectivity-
        # bounded, not structural: no hint, AQE decides.
        sup.join(hot, sup.s_suppkey == hot.l_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select("s_name", "n_name", "s_acctbal")
        .orderBy("s_name")
    )
