"""Driver-gated queries for the shuffle-topology and data-layout
operators (operators/skew.py, operators/layout.py) — previously
pytest-only; these give the skew and Z-order machinery oracle rows.

Scale notes:
- Salted two-phase aggregation is THE skew lever for hot grouping keys:
  phase 1 aggregates on (key, salt) so no reducer sees a whole hot key,
  phase 2 combines the ≤ salts partials per key. Exact DECIMAL partial
  sums make the two-phase result bit-identical to the direct aggregate —
  which is precisely what the oracle checks.
- The Z-order key interleaves per-dimension bits so parquet row-group
  min/max stats stay narrow on every dimension at once; the query below
  drives the REAL `zorder_key` operator and checks its arithmetic
  (affine scaling, truncation, bit placement) bit-for-bit in SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.layout import zorder_key
from .helpers import T
from .registry import query

_SALTS = 16


@query(
    "salted_two_phase_revenue",
    oracle="""
SELECT l_returnflag,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2)
            AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("skew", "salting", "aggregate"),
)
def salted_two_phase_revenue(spark, sf_dir):
    """Skew-salted aggregation (operators/skew.py rationale, deterministic
    salt so the oracle can replay it): revenue by l_returnflag computed
    in TWO phases — phase 1 groups on (l_returnflag, l_orderkey % 16) so
    a pathologically hot flag spreads over 16 reducers, phase 2 combines
    the ≤16 partials per flag. Partial sums stay in exact DECIMAL(38,6)
    (associative, order-independent), so the salted result is
    bit-identical to the direct single-phase aggregate — the oracle IS
    the direct aggregate, proving the skew mitigation changes the
    topology, not the answer. At 100 TB phase 1's map-side combine still
    applies; the extra exchange carries |flags|×16 rows."""
    li = T(spark, sf_dir, "lineitem")
    salted = li.select(
        "l_returnflag",
        (F.col("l_orderkey") % _SALTS).alias("_salt"),
        F.expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))").alias("rev"),
    )
    phase1 = salted.groupBy("l_returnflag", "_salt").agg(
        F.sum("rev").alias("partial_rev"), F.count("*").alias("partial_n")
    )
    return (
        phase1.groupBy("l_returnflag")
        .agg(
            F.expr("CAST(round(sum(partial_rev), 2) AS DOUBLE)").alias("revenue"),
            F.sum("partial_n").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


_ZBITS = 6


def _zorder_oracle() -> str:
    """SQL replay of zorder_key(df, [x, y], bits=6): affine scale each
    dimension to [0, 63] (Spark's double->bigint cast truncates toward
    zero => trunc() in DuckDB, whose plain CAST rounds), clamp, then
    place bit b of dim i at position b*2+i."""
    def scaled(col, mn, mx):
        span = f"(CASE WHEN {mx} - {mn} = 0 THEN 1.0 ELSE CAST({mx} - {mn} AS DOUBLE) END)"
        raw = f"CAST(trunc((CAST({col} AS DOUBLE) - {mn}) / {span} * 63.0) AS BIGINT)"
        return f"least(CAST(63 AS BIGINT), greatest(CAST(0 AS BIGINT), {raw}))"

    zx = " + ".join(f"(((sx >> {b}) & 1) << {2 * b})" for b in range(_ZBITS))
    zy = " + ".join(f"(((sy >> {b}) & 1) << {2 * b + 1})" for b in range(_ZBITS))
    return f"""
WITH c AS (
  SELECT event_id,
         CAST(user_id % 64 AS BIGINT) AS x,
         CAST(event_id % 64 AS BIGINT) AS y
  FROM events
),
b AS (SELECT min(x) AS mnx, max(x) AS mxx, min(y) AS mny, max(y) AS mxy FROM c),
s AS (
  SELECT event_id, x, y,
         {scaled('x', 'CAST(mnx AS DOUBLE)', 'CAST(mxx AS DOUBLE)')} AS sx,
         {scaled('y', 'CAST(mny AS DOUBLE)', 'CAST(mxy AS DOUBLE)')} AS sy
  FROM c CROSS JOIN b
),
z AS (SELECT event_id, x, y, CAST({zx} + {zy} AS BIGINT) AS zkey FROM s)
SELECT CAST(zkey // 64 AS BIGINT) AS zbucket,
       CAST(count(*) AS BIGINT) AS n_events,
       min(x) AS min_x, max(x) AS max_x,
       min(y) AS min_y, max(y) AS max_y
FROM z
GROUP BY CAST(zkey // 64 AS BIGINT)
ORDER BY zbucket
"""


@query(
    "zorder_curve_buckets",
    oracle=_zorder_oracle(),
    tags=("layout", "zorder", "pruning"),
)
def zorder_curve_buckets(spark, sf_dir):
    """Z-order (Morton) clustering profile over two bucketed event
    dimensions, driving the REAL operators/layout.py::zorder_key (affine
    min/max scaling, truncating cast, bit interleave — the oracle
    replays each step bit-for-bit). Each zbucket of 64 consecutive curve
    positions covers a tight (x, y) rectangle — exactly the property
    that keeps parquet row-group min/max stats narrow on BOTH dimensions
    after a zkey-sorted write, so scans prune on either predicate. The
    min/max per bucket in the output IS that locality evidence. Bounds
    collection is one scalar aggregate (bounded driver model state);
    everything else is codegen bit arithmetic."""
    ev = T(spark, sf_dir, "events").select(
        "event_id",
        (F.col("user_id") % 64).cast("bigint").alias("x"),
        (F.col("event_id") % 64).cast("bigint").alias("y"),
    )
    z = ev.withColumn("zkey", zorder_key(ev, ["x", "y"], bits=_ZBITS))
    return (
        z.groupBy(F.expr("zkey div 64").cast("bigint").alias("zbucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .orderBy("zbucket")
    )
