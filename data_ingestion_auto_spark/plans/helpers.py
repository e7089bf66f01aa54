"""Shared helpers for registered queries.

Determinism convention (SURVEY §7.4 "order-insensitive hashing vs floats"):
double summation is order-dependent in floating point, and Spark/DuckDB
aggregate in different orders — and even `round()` on identical doubles can
disagree between engines at exact half boundaries (Spark rounds the exact
decimal expansion HALF_UP; other engines may round the scaled double).
Therefore every float aggregate here:

- SUM: sums in exact DECIMAL(38,6) (order-independent), rounds the DECIMAL
  (well-defined half-up in both engines), casts to DOUBLE;
- AVG: converts the exact decimal sum to integer micro-units and performs
  round-half-up with pure integer arithmetic, then one exact double divide.

Both engines then produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread  # noqa: F401 — spread re-exported


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def sort_small(df: DataFrame, *cols) -> DataFrame:
    """Presentation sort for a SMALL result whose subtree is expensive —
    one shuffle to a single partition, then an in-partition sort: the
    global order is identical to ``orderBy`` (one partition ⇔ total
    order) but there is NO range-boundary sampling job. ``orderBy``'s
    RangePartitioning samples its child by running an extra job over the
    segment since the last exchange; when that segment contains a Python
    boundary (mapInPandas / applyInPandas) the whole Python evaluation
    runs TWICE — measured on simplify_linestrings_fix: 2.55 s with
    orderBy vs 1.38 s without the sort, on a 1.5k-row result
    (optimization r13; guide §4 — the boundary is the cost, don't pay it
    for a sampler). Only for outputs BOUNDED BY CONSTRUCTION (fixed
    raster dims, segment inventories of a fixed grid) that fit one task
    comfortably; DATA-SIZED results use ``sort_cut`` below, which keeps
    the parallel range sort."""
    return df.repartition(1).sortWithinPartitions(*cols)


def sort_cut(df: DataFrame, *cols) -> DataFrame:
    """Presentation sort for a DATA-SIZED result whose subtree is
    expensive — same sampler-double-execution hazard as ``sort_small``
    (see there), different remedy: cut lineage first, so the range
    sampler and the sort both read the materialized blocks instead of
    re-running the Python boundary, and the sort stays PARALLEL — the
    right shape when the output grows with the corpus (per-user,
    per-doc outputs)."""
    from ..checkpoints import ckpt_local

    return ckpt_local(df).orderBy(*cols)


def _sum_sql(expr: str, alias: str, scale: int) -> str:
    return f"CAST(round(sum(CAST({expr} AS DECIMAL(38,6))), {scale}) AS DOUBLE) AS {alias}"


def _avg_sql(expr: str, alias: str, scale: int, intdiv: str) -> str:
    # Exact integer round-half-away-from-zero of (sum / n) at `scale`
    # decimals: work in micro-units (10^-6), round to multiples of
    # m = 10^(6-scale). The division runs on |s| so Spark's `div`
    # (truncate toward zero) and DuckDB's `//` (floor) agree even for
    # negative sums (e.g. c_acctbal); the sign is reapplied in integer
    # space afterwards.
    m = 10 ** (6 - scale)
    s = f"CAST(sum(CAST({expr} AS DECIMAL(38,6))) * 1000000 AS BIGINT)"
    n = f"count({expr})"
    sgn = f"(CASE WHEN {s} < 0 THEN -1 ELSE 1 END)"
    mag = f"((2 * abs({s}) + {n} * {m}) {intdiv} (2 * {n} * {m}))"
    return f"CAST(({sgn} * {mag} * {m}) AS DOUBLE) / 1000000.0 AS {alias}"


def dec_sum(expr: str, alias: str, scale: int = 2):
    """Exact, order-independent SUM of a double expression → rounded DOUBLE."""
    return F.expr(_sum_sql(expr, alias, scale).rsplit(" AS ", 1)[0]).alias(alias)


def dec_avg(expr: str, alias: str, scale: int = 6):
    """Portable AVG: exact decimal sum, integer half-up rounding, DOUBLE."""
    return F.expr(_avg_sql(expr, alias, scale, "div").rsplit(" AS ", 1)[0]).alias(alias)


def sql_dec_sum(expr: str, alias: str, scale: int = 2) -> str:
    return _sum_sql(expr, alias, scale)


def sql_dec_avg(expr: str, alias: str, scale: int = 6) -> str:
    return _avg_sql(expr, alias, scale, "//")


REVENUE = "l_extendedprice * (1 - l_discount)"
