"""Similarity search over embedding columns (LLM-data-pipeline extension).

Brute-force cosine top-k is the correctness baseline: broadcast the query
set, stream the corpus, score with JVM-side higher-order array functions
(zip_with + aggregate — no Python, no UDF). At 100 TB the corpus side stays
fully distributed: cost is O(|corpus| × |queries|) with |queries| broadcast,
i.e. a map-only scan per query batch — no shuffle until the final top-k,
which TakeOrdered/window-per-query reduces to k rows per query per
partition.

The scale path beyond brute force is IVF/LSH bucketing: assign each vector
to a coarse bucket (e.g. sign-LSH over md5-derived hyperplanes — the same
portable-hash trick as operators/dedup.py), equi-join query buckets to
corpus buckets, then brute-force inside buckets only.

Determinism: components are quantized to integer 1e-4 units, so dot
products and norms are exact integer sums (order-independent) and the final
cosine is one double division — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_QUANT = "transform({col}, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))"
_SELF_DOT = "aggregate(transform({q}, x -> x * x), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)"


def quantized(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Attach integer-quantized vector + its exact squared norm."""
    return df.select(
        F.col(id_col),
        F.expr(_QUANT.format(col=vec_col)).alias("qvec"),
    ).withColumn("qnorm", F.expr(_SELF_DOT.format(q="qvec")))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    queries is broadcast (small); the corpus never shuffles until the
    per-query top-k window. Output: (query_id, cand_id, cosine, rank).

    Scale bound: the broadcast side is the FIXED PROBE SET, not data —
    callers pass a handful of query vectors (ground-truth verification,
    recall grading), so the hint is structural, not SF-proportional.
    This brute-force tier is the exactness oracle the ANN tiers
    (sign-LSH, multi-probe, IVF, IVF-PQ in plans/similarity_lsh.py,
    operators/ivf.py, plans/ivfpq.py) are graded against; it is NOT the
    100 TB scale path — the bucketed/routed tiers are.
    """
    c = quantized(corpus, id_col, vec_col)
    q = (
        quantized(queries, id_col, vec_col)
        .withColumnRenamed(id_col, "query_id")
        .withColumnRenamed("qvec", "q_qvec")
        .withColumnRenamed("qnorm", "q_qnorm")
    )
    pairs = c.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("cand_id"),
        F.round(
            F.expr(_DOT.format(a="q_qvec", b="qvec"))
            / (F.sqrt(F.col("q_qnorm")) * F.sqrt(F.col("qnorm"))),
            6,
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
