"""Similarity-search queries over `embeddings` (LLM-data-pipeline
extension). See operators/similarity.py for the engine API and scale notes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import similarity as S
from .helpers import T
from .registry import query

_DIM = 64
_N_QUERIES = 8


def _term(i: int, rel: str) -> str:
    return f"CAST(round(CAST({rel}.embedding[{i}] AS DOUBLE) * 10000.0) AS BIGINT)"


def _dot_sql(a: str, b: str) -> str:
    return " + ".join(f"{_term(i, a)} * {_term(i, b)}" for i in range(1, _DIM + 1))


def _norm_sql(a: str) -> str:
    return " + ".join(f"{_term(i, a)} * {_term(i, a)}" for i in range(1, _DIM + 1))


@query(
    "embedding_cosine_topk",
    oracle=f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_N_QUERIES}),
pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS cand_id,
         round(({_dot_sql('q', 'e')})
               / (sqrt({_norm_sql('q')}) * sqrt({_norm_sql('e')})), 6) AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
  FROM pairs
) t WHERE rank <= 5
ORDER BY query_id, rank
""",
    tags=("similarity", "ann", "embedding"),
)
def embedding_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-5 neighbors for a broadcast query set —
    the ANN correctness baseline. Components quantized to exact integer
    1e-4 units so scores are engine-portable; ranking breaks ties on
    cand_id. Corpus side is map-only until the per-query top-k window.
    """
    emb = T(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return (
        S.cosine_topk(emb, queries, k=5)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


@query(
    "embedding_label_centroid_sim",
    oracle=f"""
WITH quant AS (
  SELECT vec_id, label, {_norm_sql('embeddings')} AS qnorm
  FROM embeddings
)
SELECT label, count(*) AS n_vectors,
       CAST(min(qnorm) AS BIGINT) AS min_qnorm,
       CAST(max(qnorm) AS BIGINT) AS max_qnorm,
       CAST(sum(qnorm) AS BIGINT) AS sum_qnorm
FROM quant
GROUP BY label
ORDER BY label
""",
    tags=("similarity", "embedding", "agg"),
)
def embedding_label_centroid_sim(spark, sf_dir):
    """Per-label vector statistics on exact integer norms (the
    cluster-profile primitive an IVF index builds on). Integer aggregates —
    portable by construction.
    """
    emb = T(spark, sf_dir, "embeddings")
    quant = S.quantized(emb).join(emb.select("vec_id", "label"), "vec_id")
    return (
        quant.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.min("qnorm").cast("bigint").alias("min_qnorm"),
            F.max("qnorm").cast("bigint").alias("max_qnorm"),
            F.sum("qnorm").cast("bigint").alias("sum_qnorm"),
        )
        .orderBy("label")
    )
