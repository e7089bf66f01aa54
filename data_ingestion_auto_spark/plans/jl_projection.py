"""Johnson–Lindenstrauss random-sign projection for the embedding tier
(Achlioptas 2003, "Database-friendly random projections": entries drawn
from ±1 satisfy the JL lemma with the same distortion guarantee as
Gaussians, and the projection is integer arithmetic — exactly what this
engine's bit-stability rules want).

The sign matrix is a CONSTANT derived from md5("jl|i|j") high bits —
generated once at import, embedded literally in both the Spark
expression and the DuckDB oracle, so the "random" projection is
reproducible anywhere with no RNG state. Projection of a quantized
vector is one map-side zip_with/aggregate expression per output
dimension (codegen, zero shuffle, zero UDF) — the 100 TB shape: a
corpus-wide re-embedding to d'=32 costs one projection pass, after
which every downstream ANN/dedup join moves half the vector bytes
(and the distortion halves again at the next doubling — the knob is
explicit).

The registered query measures what the lemma promises: per vector pair,
exact cosine in the original 64-d space vs cosine in the projected 32-d
space, and the absolute distortion. Pair set bounded to vec_id < 100
(fixed at every SF — the `ngram_jaccard_pairs` bounded-oracle
precedent); the projection itself runs corpus-wide.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from .helpers import T
from .registry import query

_D_IN = 64
_D_OUT = 32


def _jl_signs() -> list[list[int]]:
    """±1 sign matrix, row i = output dim, from md5("jl|i|j") high bit."""
    return [
        [
            1
            if int(hashlib.md5(f"jl|{i}|{j}".encode()).hexdigest()[0], 16) >= 8
            else -1
            for j in range(_D_IN)
        ]
        for i in range(_D_OUT)
    ]


_SIGNS = _jl_signs()

# Spark: proj = array(p_0..p_31), p_i = sum_j qvec[j] * s_ij (bigint)
_SPARK_PROJ = "array(" + ", ".join(
    "aggregate(zip_with(qvec, array("
    + ", ".join(f"{s}L" for s in row)
    + "), (x, s) -> x * s), 0L, (acc, v) -> acc + v)"
    for row in _SIGNS
) + ")"

# DuckDB: same constant matrix via list literals
_DUCK_PROJ = "[" + ", ".join(
    "list_sum(list_transform(generate_series(1, 64), k -> qvec[k] * (["
    + ", ".join(str(s) for s in row)
    + "])[k]))"
    for row in _SIGNS
) + "]"

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
_NRM = "aggregate({v}, 0L, (acc, x) -> acc + x * x)"


@query(
    "jl_projection_distortion",
    oracle=f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qvec
  FROM embeddings WHERE vec_id < 100
),
pr AS (
  SELECT vec_id, qvec, {_DUCK_PROJ} AS pvec FROM qv
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(CAST(list_sum(list_transform(generate_series(1, 64), k -> a.qvec[k] * b.qvec[k])) AS DOUBLE)
             / (sqrt(CAST(list_sum(list_transform(a.qvec, x -> x * x)) AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(b.qvec, x -> x * x)) AS DOUBLE))), 6) AS cos_exact,
       round(CAST(list_sum(list_transform(generate_series(1, 32), k -> a.pvec[k] * b.pvec[k])) AS DOUBLE)
             / (sqrt(CAST(list_sum(list_transform(a.pvec, x -> x * x)) AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(b.pvec, x -> x * x)) AS DOUBLE))), 6) AS cos_proj
FROM pr a JOIN pr b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(a.pvec, x -> x * x)) > 0
  AND list_sum(list_transform(b.pvec, x -> x * x)) > 0
ORDER BY id_a, id_b
""",
    tags=("embedding", "jl", "projection", "ann", "llm"),
)
def jl_projection_distortion(spark, sf_dir):
    """JL/Achlioptas ±1 projection 64-d → 32-d with measured per-pair
    cosine distortion: `cos_exact` in the original space vs `cos_proj`
    in the projected space over a fixed vector subset (vec_id < 100 —
    bounded all-pairs, the exact-oracle tier; the projection expression
    itself is corpus-wide map-side codegen).

    Exactness: vectors are ×10⁴-quantized BIGINTs, the sign matrix is an
    md5-derived ±1 constant, so both dots and norms are exact integers;
    the two cosines each spend one IEEE sqrt+division (bit-stable, the
    `label_centroid_similarity` contract).

    Scale: projecting N vectors is N map-side expressions — no shuffle,
    no UDF, no driver state; at 100 TB the projected table is the cheap
    re-embedding that downstream LSH/IVF tiers index at half the vector
    bytes; measured mean |Δcos| tracks the lemma's √(2/π)/√d' (pinned
    in tests/test_jl_projection.py). The quadratic comparison exists only inside the bounded
    subset (4,950 pairs at any corpus), like every exact-oracle twin."""
    emb = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    from ..operators.ivf import _QUANT

    qv = emb.select(
        "vec_id", F.expr(_QUANT.format(col="embedding")).alias("qvec")
    )
    pr = qv.withColumn("pvec", F.expr(_SPARK_PROJ))
    a = pr.select(
        F.col("vec_id").alias("id_a"),
        F.col("qvec").alias("qa"),
        F.col("pvec").alias("pa"),
    )
    b = pr.select(
        F.col("vec_id").alias("id_b"),
        F.col("qvec").alias("qb"),
        F.col("pvec").alias("pb"),
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("id_a") < F.col("id_b"))
    cos_exact = F.round(
        F.expr(_DOT.format(a="qa", b="qb"))
        / (
            F.sqrt(F.expr(_NRM.format(v="qa")))
            * F.sqrt(F.expr(_NRM.format(v="qb")))
        ),
        6,
    )
    cos_proj = F.round(
        F.expr(_DOT.format(a="pa", b="pb"))
        / (
            F.sqrt(F.expr(_NRM.format(v="pa")))
            * F.sqrt(F.expr(_NRM.format(v="pb")))
        ),
        6,
    )
    return (
        pairs.filter(
            (F.expr(_NRM.format(v="pa")) > 0) & (F.expr(_NRM.format(v="pb")) > 0)
        )
        .select(
            "id_a",
            "id_b",
            cos_exact.alias("cos_exact"),
            cos_proj.alias("cos_proj"),
        )
        .orderBy("id_a", "id_b")
    )
