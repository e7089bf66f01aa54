"""Deterministic sketch-tier operators WITH oracles.

The sketch tier usually trades oracle-checkability for scale (HLL's
estimate depends on engine internals — `approx_distinct_counts` is
rows-only for exactly that reason). KMV (k-minimum-values, Bar-Yossef et
al. 2002) doesn't have to: its state is the k smallest hash values of the
distinct set, and with md5 as the hash both engines compute the IDENTICAL
sketch — so the approximate estimate itself is hash-checkable against
DuckDB. This is the pattern the engine uses everywhere (quantized cosine,
integer k-means): make the approximation deterministic, then oracle it.

At 100 TB: the KMV sketch is a per-group top-k-by-hash — one shuffle on
the group key carrying at most k rows per group out of the map side
(row_number + filter prunes before the final exchange under AQE), the
same cost shape as any top-k. Merging partial sketches = min-merge of
sorted lists, associative — exactly how HLL union works operationally.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .helpers import T
from .registry import query

_K = 64

# first 8 hex digits of md5 → BIGINT in [0, 2^32), portable to both
# engines via instr-based nibble decoding (no conv/from_hex dialect
# differences).
_HEX8 = "".join(
    [
        "(",
        " + ".join(
            f"CAST(instr('0123456789abcdef', substr(md5(CAST({{v}} AS STRING)), {i + 1}, 1)) - 1 "
            f"AS BIGINT) * {16 ** (7 - i)}"
            for i in range(8)
        ),
        ")",
    ]
)


@query(
    "kmv_distinct_estimate",
    oracle=f"""
WITH hashed AS (
  SELECT DISTINCT l_returnflag,
         {_HEX8.replace("AS STRING", "AS VARCHAR").format(v="l_partkey")} AS h
  FROM lineitem
),
ranked AS (
  SELECT l_returnflag, h,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n_exact
  FROM hashed
),
kth AS (
  SELECT l_returnflag, n_exact, h AS h_k FROM ranked WHERE rn = {_K}
)
SELECT l_returnflag,
       CAST(n_exact AS BIGINT) AS exact_distinct,
       round(({_K} - 1.0) * 4294967296.0 / h_k, 6) AS kmv_estimate,
       round(abs(({_K} - 1.0) * 4294967296.0 / h_k - n_exact) / n_exact, 6) AS rel_error
FROM kth
ORDER BY l_returnflag
""",
    tags=("sketch", "distinct", "kmv", "approx"),
)
def kmv_distinct_estimate(spark, sf_dir):
    """KMV distinct-count sketch, oracled: per l_returnflag, hash the
    distinct l_partkey set with md5 (first 8 hex digits → 32-bit int),
    keep the k=64 smallest, estimate |D| ≈ (k-1) * 2^32 / h_k. Because
    the hash is md5, the sketch — and therefore the ESTIMATE — is
    bit-identical in any engine: an approximate algorithm with an exact
    oracle (contrast `approx_distinct_counts`, rows-only because HLL
    internals are engine-specific). exact_distinct rides along via a
    count window over the same partitioning, giving the oracle the
    realized relative error (~5-15% at k=64)."""
    li = T(spark, sf_dir, "lineitem")
    hashed = li.select(
        "l_returnflag", F.expr(_HEX8.format(v="l_partkey")).alias("h")
    ).distinct()
    w = W.partitionBy("l_returnflag").orderBy("h")
    wc = W.partitionBy("l_returnflag")
    ranked = hashed.select(
        "l_returnflag",
        "h",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n_exact"),
    )
    est = (_K - 1.0) * 4294967296.0 / F.col("h")
    return (
        ranked.filter(F.col("rn") == _K)
        .select(
            "l_returnflag",
            F.col("n_exact").cast("bigint").alias("exact_distinct"),
            F.round(est, 6).alias("kmv_estimate"),
            F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_error"),
        )
        .orderBy("l_returnflag")
    )
