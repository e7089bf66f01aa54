"""Multi-dimensional and analytic aggregates (SURVEY §2.5's "new engine
exposes" list): rollup, cube, grouping sets, pivot, exact/approximate
distinct, percentiles, histograms, ordered string aggregation.

The reference has no distinct/rollup/approx aggregates (SURVEY §2.5) —
these are the native-Spark surface the engine ships on top of the
reference's semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .helpers import REVENUE, T, dec_sum, sql_dec_sum
from .registry import query


@query(
    "rollup_revenue",
    oracle=f"""
SELECT coalesce(r.r_name, 'ALL') AS region,
       coalesce(n.n_name, 'ALL') AS nation,
       {sql_dec_sum(REVENUE, 'revenue')},
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
ORDER BY region, nation
""",
    tags=("agg", "rollup"),
)
def rollup_revenue(spark, sf_dir):
    """ROLLUP (region → nation) with subtotal and grand-total rows; NULL
    grouping markers coalesced to 'ALL' so the hierarchy is explicit in the
    output (and hashable by the oracle). Rollup costs ONE shuffle — Spark
    expands grouping sets map-side.
    """
    li = T(spark, sf_dir, "lineitem")
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    na = T(spark, sf_dir, "nation")
    re = T(spark, sf_dir, "region")
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        # customer is SF-proportional — no hint, AQE decides; nation/
        # region are structurally constant (25/5 rows) and keep theirs.
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
    )
    # Aggregate BEFORE the rollup Expand (optimization r13, guide §2.3
    # "aggregate before you shuffle"): rollup(a, b) expands every input
    # row 3× ahead of the aggregate, so rolling up the raw join paid the
    # decimal partial-agg over ~3× lineitem rows. Both keys are non-null
    # (inner-join images of nation/region), and the DECIMAL(38,6) sum is
    # exact and associative, so summing per (region, nation) first — one
    # ordinary map-side-combining groupBy — and rolling up the ≤25-row
    # image is bit-identical (the final round(…, 2) happens once, on the
    # exact recombined sum).
    pre = joined.groupBy("r_name", "n_name").agg(
        F.expr(f"sum(CAST({REVENUE} AS DECIMAL(38,6)))").alias("rev_dec"),
        F.count("*").alias("n_pre"),
    )
    return (
        pre.rollup("r_name", "n_name")
        .agg(
            F.expr("CAST(round(sum(rev_dec), 2) AS DOUBLE)").alias("revenue"),
            F.sum("n_pre").cast("bigint").alias("n_items"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
            "n_items",
        )
        .orderBy("region", "nation")
    )


@query(
    "cube_order_counts",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
""",
    tags=("agg", "cube"),
)
def cube_order_counts(spark, sf_dir):
    """CUBE over (status, priority): all four grouping sets in one pass."""
    od = T(spark, sf_dir, "orders")
    return (
        od.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
        .orderBy("status", "priority")
    )


@query(
    "grouping_sets_shipmode",
    oracle=f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       {sql_dec_sum('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
ORDER BY returnflag, linestatus
""",
    tags=("agg", "grouping_sets"),
)
def grouping_sets_shipmode(spark, sf_dir):
    """Explicit GROUPING SETS (a set the rollup/cube shorthands don't
    cover). Written in SQL — Catalyst plans it identically to the
    DataFrame form."""
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               {sql_dec_sum('l_quantity', 'sum_qty')}
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        ORDER BY returnflag, linestatus
        """
    )


@query(
    "pivot_segment_status",
    oracle="""
SELECT c_mktsegment AS segment,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
ORDER BY segment
""",
    tags=("agg", "pivot"),
)
def pivot_segment_status(spark, sf_dir):
    """Pivot orderstatus into columns per segment — conditional aggregation
    (count FILTER), the portable form of `.pivot()`."""
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # customer is SF-proportional — no broadcast hint, AQE decides.
    joined = od.join(cu, od.o_custkey == cu.c_custkey)
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_pending"),
        )
        .orderBy("segment")
    )


@query(
    "distinct_counts",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(*) AS n_rows
FROM lineitem
GROUP BY 1
ORDER BY l_returnflag
""",
    tags=("agg", "distinct"),
)
def distinct_counts(spark, sf_dir):
    """Exact multi-distinct aggregation (Spark expands to one Expand +
    two-phase aggregate). The approximate HLL variant is
    `approx_distinct_counts` (rows-only — sketches aren't
    oracle-comparable across engines)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "approx_distinct_counts",
    oracle=None,  # HLL sketches differ across engines: rows-only check
    tags=("agg", "approx"),
)
def approx_distinct_counts(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++): the 100 TB cardinality path —
    fixed-size sketch per group, no distinct expansion. Non-oracle: sketch
    estimates are engine-specific (exact twin: `distinct_counts`)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "quantity_histogram",
    oracle="""
SELECT CAST(floor(l_quantity / 10.0) AS INTEGER) AS bucket,
       count(*) AS n,
       CAST(min(l_quantity) AS DOUBLE) AS lo,
       CAST(max(l_quantity) AS DOUBLE) AS hi
FROM lineitem
GROUP BY 1
ORDER BY bucket
""",
    tags=("agg", "histogram"),
)
def quantity_histogram(spark, sf_dir):
    """Fixed-width histogram via floor-bucket groupBy — the scalable
    histogram shape (single shuffle on bucket id; min/max are exact
    order-independent aggregates)."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.floor(F.col("l_quantity") / 10.0).cast("int").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("l_quantity").cast("double").alias("lo"),
            F.max("l_quantity").cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "median_quantity_per_flag",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS median_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty
FROM lineitem
GROUP BY 1
ORDER BY l_returnflag
""",
    tags=("agg", "percentile"),
)
def median_quantity_per_flag(spark, sf_dir):
    """Exact interpolated percentiles (median, p90). Spark `percentile` and
    DuckDB `quantile_cont` both use linear interpolation on the sorted
    values — deterministic given identical inputs. (The scale path is
    `approx_percentile`; exact percentile shuffles the group's values.)"""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "ordered_string_agg",
    oracle="""
SELECT n_regionkey AS regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation
GROUP BY 1
ORDER BY regionkey
""",
    tags=("agg", "string_agg"),
)
def ordered_string_agg(spark, sf_dir):
    """Ordered string aggregation: deterministic (explicitly sorted)
    collect — never rely on collect_list's arrival order."""
    na = T(spark, sf_dir, "nation")
    return (
        na.groupBy(F.col("n_regionkey").alias("regionkey"))
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("regionkey")
    )


@query(
    "table_profile_lineitem",
    oracle="""
SELECT 'l_quantity' AS col, CAST(count(l_quantity) AS BIGINT) AS n_non_null,
       CAST(count(*) - count(l_quantity) AS BIGINT) AS n_null,
       CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
       CAST(min(l_quantity) AS DOUBLE) AS min_val, CAST(max(l_quantity) AS DOUBLE) AS max_val
FROM lineitem
UNION ALL
SELECT 'l_discount', CAST(count(l_discount) AS BIGINT),
       CAST(count(*) - count(l_discount) AS BIGINT),
       CAST(count(DISTINCT l_discount) AS BIGINT),
       CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_linenumber', CAST(count(l_linenumber) AS BIGINT),
       CAST(count(*) - count(l_linenumber) AS BIGINT),
       CAST(count(DISTINCT l_linenumber) AS BIGINT),
       CAST(min(l_linenumber) AS DOUBLE), CAST(max(l_linenumber) AS DOUBLE)
FROM lineitem
ORDER BY col
""",
    tags=("profile", "quality", "llm"),
)
def table_profile_lineitem(spark, sf_dir):
    """Dataset profiling — the first pass of any ingest/quality pipeline:
    per-column non-null/null/distinct counts and min/max, emitted long
    (one row per column). All three column profiles compute in ONE scan
    (single multi-aggregate), then unpivot via stack — not one scan per
    column; at 100 TB that difference is the whole game."""
    li = T(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count("l_quantity").alias("nn_q"),
        F.count(F.when(F.col("l_quantity").isNull(), 1)).alias("nu_q"),
        F.countDistinct("l_quantity").alias("nd_q"),
        F.min("l_quantity").cast("double").alias("mn_q"),
        F.max("l_quantity").cast("double").alias("mx_q"),
        F.count("l_discount").alias("nn_d"),
        F.count(F.when(F.col("l_discount").isNull(), 1)).alias("nu_d"),
        F.countDistinct("l_discount").alias("nd_d"),
        F.min("l_discount").cast("double").alias("mn_d"),
        F.max("l_discount").cast("double").alias("mx_d"),
        F.count("l_linenumber").alias("nn_l"),
        F.count(F.when(F.col("l_linenumber").isNull(), 1)).alias("nu_l"),
        F.countDistinct("l_linenumber").alias("nd_l"),
        F.min("l_linenumber").cast("double").alias("mn_l"),
        F.max("l_linenumber").cast("double").alias("mx_l"),
    )
    return agg.selectExpr(
        "stack(3, "
        "'l_quantity', nn_q, nu_q, nd_q, mn_q, mx_q, "
        "'l_discount', nn_d, nu_d, nd_d, mn_d, mx_d, "
        "'l_linenumber', nn_l, nu_l, nd_l, mn_l, mx_l) "
        "AS (col, n_non_null, n_null, n_distinct, min_val, max_val)"
    ).orderBy("col")


@query(
    "fk_integrity_audit",
    oracle="""
SELECT * FROM (
  SELECT 'lineitem_orphan_orderkey' AS check_name,
         CAST((SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_violations,
         CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_total
  UNION ALL
  SELECT 'orders_childless',
         CAST((SELECT count(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) AS BIGINT),
         CAST((SELECT count(*) FROM orders) AS BIGINT)
  UNION ALL
  SELECT 'orders_orphan_custkey',
         CAST((SELECT count(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
         CAST((SELECT count(*) FROM orders) AS BIGINT)
  UNION ALL
  SELECT 'lineitem_orphan_partkey',
         CAST((SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS BIGINT),
         CAST((SELECT count(*) FROM lineitem) AS BIGINT)
  UNION ALL
  SELECT 'lineitem_orphan_suppkey',
         CAST((SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT),
         CAST((SELECT count(*) FROM lineitem) AS BIGINT)
  UNION ALL
  SELECT 'customer_orphan_nationkey',
         CAST((SELECT count(*) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT),
         CAST((SELECT count(*) FROM customer) AS BIGINT)
)
ORDER BY check_name
""",
    tags=("audit", "integrity", "quality", "observability"),
)
def fk_integrity_audit(spark, sf_dir):
    """Referential-integrity audit — the dbt-test family as ONE exact
    readout: every declared foreign key checked by anti-join (orphan
    lineitems/orders by each FK, childless orders, dangling nation
    keys), reported as (check, violations, total). The post-ingest
    gate a pipeline runs before publishing a snapshot: a nonzero row
    here means the upstream extract dropped or duplicated a parent
    table — caught at load time, not at query time.

    Scale: each check is one anti-join (left_anti — AQE broadcasts the
    dimension side where it fits, shuffles where it doesn't) folded to
    a single count; checks are independent and share nothing, so the
    whole audit is a union of parallel 1-row aggregates. Output 6 rows
    at any corpus."""
    li = T(spark, sf_dir, "lineitem")
    od = T(spark, sf_dir, "orders")
    cu = T(spark, sf_dir, "customer")
    pa = T(spark, sf_dir, "part")
    su = T(spark, sf_dir, "supplier")
    na = T(spark, sf_dir, "nation")

    def check(name, child, key, parent, pkey, total_df):
        viol = child.join(
            parent.select(F.col(pkey).alias(key)).distinct(), [key], "left_anti"
        ).agg(F.count("*").cast("bigint").alias("n_violations"))
        tot = total_df.agg(F.count("*").cast("bigint").alias("n_total"))
        return viol.crossJoin(tot).select(
            F.lit(name).alias("check_name"), "n_violations", "n_total"
        )

    checks = [
        check("lineitem_orphan_orderkey", li.select("l_orderkey"), "l_orderkey", od, "o_orderkey", li),
        check("orders_childless", od.select("o_orderkey").withColumnRenamed("o_orderkey", "k"),
              "k", li.select(F.col("l_orderkey")), "l_orderkey", od),
        check("orders_orphan_custkey", od.select("o_custkey"), "o_custkey", cu, "c_custkey", od),
        check("lineitem_orphan_partkey", li.select("l_partkey"), "l_partkey", pa, "p_partkey", li),
        check("lineitem_orphan_suppkey", li.select("l_suppkey"), "l_suppkey", su, "s_suppkey", li),
        check("customer_orphan_nationkey", cu.select("c_nationkey"), "c_nationkey", na, "n_nationkey", cu),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")


@query(
    "customer_rfm_segments",
    oracle="""
WITH base AS (
  SELECT o_custkey AS custkey,
         max(o_orderdate) AS last_date,
         CAST(count(*) AS BIGINT) AS n_orders,
         sum(CAST(o_totalprice AS DECIMAL(38,6))) AS spend
  FROM orders GROUP BY 1
),
mx AS (SELECT max(last_date) AS corpus_max FROM base),
feat AS (
  SELECT custkey, n_orders, spend,
         CAST(date_diff('day', last_date, mx.corpus_max) AS BIGINT) AS recency_days
  FROM base CROSS JOIN mx
),
t AS (
  SELECT custkey, n_orders, spend, recency_days,
         ntile(3) OVER (ORDER BY recency_days, custkey) AS r_t,
         ntile(3) OVER (ORDER BY n_orders DESC, custkey) AS f_t,
         ntile(3) OVER (ORDER BY spend DESC, custkey) AS m_t
  FROM feat
)
SELECT 'R' || r_t || 'F' || f_t || 'M' || m_t AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(n_orders) AS BIGINT) AS total_orders,
       CAST(round(sum(spend), 2) AS DOUBLE) AS total_spend,
       CAST(min(recency_days) AS BIGINT) AS min_recency_days,
       CAST(max(recency_days) AS BIGINT) AS max_recency_days
FROM t
GROUP BY 1
ORDER BY segment
""",
    tags=("analytics", "rfm", "segmentation", "windows"),
)
def customer_rfm_segments(spark, sf_dir):
    """RFM segmentation (Hughes 1994; the direct-marketing classic):
    per purchasing customer, recency (days since last order, against
    the corpus max date), frequency (order count) and monetary (exact
    DECIMAL spend) each cut into terciles by deterministic
    tie-broken ntile, then the 27 R×F×M segments aggregated —
    customers, orders, spend, recency range per segment. The
    cohort-targeting table every retention campaign starts from;
    'R1F1M1' is the prize cohort, 'R3F1M1' the big-spender churn risk.

    Float discipline: spend is summed in DECIMAL(38,6) end-to-end and
    rounded ONCE at the segment level (the house reduce-order rule).

    Scale: the base aggregate shrinks orders to one row per customer
    (map-side combinable); the three ntile windows run on the
    CUSTOMER-sized frame, not orders — the exact tier; at corpora where
    even customers outgrow a sort partition, the sampled-edge tercile
    construction (`order_value_deciles_binned`) is the documented
    ladder. Output ≤ 27 rows at any corpus."""
    from pyspark.sql import Window as W

    from ..checkpoints import ckpt

    # the per-customer base is read twice (corpus-max scalar + the
    # feature projection); cut it once so the orders scan + aggregate
    # don't re-plan under both consumers (optimization r14)
    base = ckpt(
        T(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_date"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("spend"),
        )
    )
    mx = base.agg(F.max("last_date").alias("corpus_max"))
    feat = base.crossJoin(F.broadcast(mx)).select(
        "custkey",
        "n_orders",
        "spend",
        F.datediff("corpus_max", "last_date").cast("bigint").alias("recency_days"),
    )
    t = feat.select(
        "custkey",
        "n_orders",
        "spend",
        "recency_days",
        F.ntile(3).over(W.orderBy("recency_days", "custkey")).alias("r_t"),
        F.ntile(3).over(W.orderBy(F.desc("n_orders"), "custkey")).alias("f_t"),
        F.ntile(3).over(W.orderBy(F.desc("spend"), "custkey")).alias("m_t"),
    )
    return (
        t.select(
            F.concat(
                F.lit("R"), F.col("r_t"), F.lit("F"), F.col("f_t"), F.lit("M"), F.col("m_t")
            ).alias("segment"),
            "n_orders",
            "spend",
            "recency_days",
        )
        .groupBy("segment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("n_orders").cast("bigint").alias("total_orders"),
            F.round(F.sum("spend"), 2).cast("double").alias("total_spend"),
            F.min("recency_days").cast("bigint").alias("min_recency_days"),
            F.max("recency_days").cast("bigint").alias("max_recency_days"),
        )
        .orderBy("segment")
    )
