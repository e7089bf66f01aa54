"""Additional classic relational shapes (general surface, SURVEY §2.4
"absent from the reference ... exercised by the driver's fixtures"):
EXISTS-with-range (Q4), CASE-bucketed counts (Q12), conditional-aggregate
ratio (Q14), NOT-IN + distinct (Q16), HAVING-subquery top-k (Q18), and a
cross-modal documents⋈embeddings composition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .helpers import REVENUE, T, dec_sum, sql_dec_sum
from .registry import query


@query(
    "q4_order_priority_check",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1995-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("tpch", "semi", "subquery"),
)
def q4_order_priority_check(spark, sf_dir):
    """Q4 shape: EXISTS with a correlated range condition → left-semi join
    with a non-equi conjunct. The date filter prunes the orders scan
    first; the semi join carries no lineitem payload."""
    od = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        od.join(
            li,
            (od.o_orderkey == li.l_orderkey) & (li.l_shipdate > od.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q12_shipmode_priority_buckets",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_priority_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS low_priority_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("tpch", "agg", "case"),
)
def q12_shipmode_priority_buckets(spark, sf_dir):
    """Q12 shape: CASE-bucketed conditional counts after a fact-fact
    join — the priority split computes map-side."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    od = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_priority_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_priority_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q14_promo_revenue_share",
    oracle=f"""
SELECT round(
         100.0 * CAST(sum(CASE WHEN p.p_type LIKE 'STAND%'
                               THEN CAST({REVENUE.replace('l_', 'l.l_')} AS DECIMAL(38,6))
                               ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
         / CAST(sum(CAST({REVENUE.replace('l_', 'l.l_')} AS DECIMAL(38,6))) AS DOUBLE), 4)
       AS standard_share_pct,
       count(*) AS n
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
""",
    tags=("tpch", "agg", "ratio"),
)
def q14_promo_revenue_share(spark, sf_dir):
    """Q14 shape: conditional-aggregate ratio (STANDARD-type revenue share; the fixture has no PROMO types).
    Both the numerator and denominator sum in exact DECIMAL, then one
    double division — the ratio is bit-identical across engines."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    pa = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_dec = F.expr(f"CAST({REVENUE} AS DECIMAL(38,6))")
    promo = F.when(F.col("p_type").like("STAND%"), rev_dec).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    return (
        # part is SF-proportional — no broadcast hint, AQE decides.
        li.join(pa, li.l_partkey == pa.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(rev_dec).cast("double"), 4
            ).alias("standard_share_pct"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q16_supplier_part_variety",
    oracle="""
SELECT p.p_brand, p.p_type, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 3000)
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
""",
    tags=("tpch", "anti", "distinct"),
)
def q16_supplier_part_variety(spark, sf_dir):
    """Q16 shape: NOT IN (anti join against a filtered dim) + multi-key
    distinct count. NOT IN's null trap doesn't bite (s_suppkey is
    non-null) but the anti join is the safe plan either way."""
    pa = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad_supp = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 3000).select("s_suppkey")
    return (
        # bad_supp (selectivity-bounded supplier subset) and pa (part,
        # SF-proportional) carry no hints — AQE decides.
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(pa, F.col("l_partkey") == pa.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
    )


@query(
    "q18_large_volume_customers",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150
)
SELECT c.c_custkey, o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       {sql_dec_sum('l.l_quantity', 'total_qty')}
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
""",
    tags=("tpch", "having", "semi"),
)
def q18_large_volume_customers(spark, sf_dir):
    """Q18 shape: HAVING-filtered aggregate joined to dims. The per-order
    aggregate computes ONCE (one shuffle on orderkey) carrying both the
    HAVING predicate column and the output sum — no re-join against raw
    lineitem afterwards (the naive two-pass plan re-scanned and re-joined
    600k rows and benched 6× slower). orderkey → (custkey, orderdate) is
    functional, so joining dims after the aggregate is equivalent to the
    oracle's aggregate-after-join."""
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"), dec_sum("l_quantity", "total_qty"))
        .filter(F.col("q") > 150)
    )
    od = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cu = T(spark, sf_dir, "customer").select("c_custkey")
    return (
        big.join(od, big.l_orderkey == od.o_orderkey)
        # customer is SF-proportional — no broadcast hint, AQE decides.
        .join(cu, od.o_custkey == cu.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


@query(
    "crossmodal_doc_embedding_profile",
    oracle="""
WITH joined AS (
  SELECT d.doc_id, d.lang, e.label,
         len(string_split(d.text, ' ')) AS n_tokens
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
)
SELECT lang, label, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
FROM joined
GROUP BY lang, label
ORDER BY lang, label
""",
    tags=("crossmodal", "join", "text", "embedding"),
)
def crossmodal_doc_embedding_profile(spark, sf_dir):
    """Cross-modal composition: text table ⋈ embedding table on shared id,
    profiled by (language, embedding cluster label) — the join a training
    pipeline runs to stratify corpus statistics by embedding cluster.
    Both sides scan pruned (text only for token counts, no vector read)."""
    do = T(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    em = T(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        do.join(em, do.doc_id == em.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("lang", "label")
    )
