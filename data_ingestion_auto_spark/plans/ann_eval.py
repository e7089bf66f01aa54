"""ANN self-grading: recall@k of the sign-LSH bucketed tier against the
exact brute-force ranking — the evaluation rung of the similarity tier
(same self-grading pattern as the MinHash sketch grading in
``plans/dedup.py``: the engine measures its own approximation quality as
a first-class query).

Reference scope note: the reference pipeline has no vector tier; the
similarity stack is part of the engine's LLM-data extension mandate
(see ``operators/similarity.py`` for the tiering).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators import similarity as S
from .helpers import T
from .registry import query
from .similarity_lsh import (
    _N_QUERIES,
    _QVEC,
    _bucket_from_qvec,
    _bucket_sql,
    _cosine_col,
    _dot_sql,
    _norm_sql,
)

_K_EVAL = 10


@query(
    "ann_recall_at_k",
    oracle=f"""
WITH base AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM base WHERE vec_id < {_N_QUERIES}),
truth AS (
  SELECT query_id, cand_id FROM (
    SELECT q.query_id, e.vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(({_dot_sql('qe', 'e.embedding')})
                            / (sqrt({_norm_sql('qe')}) * sqrt({_norm_sql('e.embedding')})), 6) DESC,
                      e.vec_id
           ) AS rank
    FROM q JOIN embeddings e ON e.vec_id <> q.query_id
  ) WHERE rank <= {_K_EVAL}
),
retrieved AS (
  SELECT query_id, cand_id FROM (
    SELECT q.query_id, b.vec_id AS cand_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY round(({_dot_sql('qe', 'b.embedding')})
                            / (sqrt({_norm_sql('qe')}) * sqrt({_norm_sql('b.embedding')})), 6) DESC,
                      b.vec_id
           ) AS rank
    FROM q JOIN base b ON q.bucket = b.bucket AND b.vec_id <> q.query_id
  ) WHERE rank <= {_K_EVAL}
)
SELECT t.query_id,
       CAST(count(*) AS BIGINT) AS n_truth,
       CAST(coalesce(any_value(r.n_retrieved), 0) AS BIGINT) AS n_retrieved,
       CAST(count(*) FILTER (WHERE h.cand_id IS NOT NULL) AS BIGINT) AS n_hit,
       round(CAST(count(*) FILTER (WHERE h.cand_id IS NOT NULL) AS DOUBLE)
             / count(*), 6) AS recall
FROM truth t
LEFT JOIN retrieved h ON t.query_id = h.query_id AND t.cand_id = h.cand_id
LEFT JOIN (
  SELECT query_id, count(*) AS n_retrieved FROM retrieved GROUP BY 1
) r ON t.query_id = r.query_id
GROUP BY t.query_id
ORDER BY t.query_id
""",
    tags=("similarity", "ann", "lsh", "eval"),
)
def ann_recall_at_k(spark, sf_dir):
    """Recall@10 of the sign-LSH bucketed ANN tier, measured per query
    against the exact brute-force top-10 (same quantized cosine, same
    cand_id tie-break on both rankings, so the comparison is
    deterministic). Output per query: truth size, bucket-retrieved size,
    hit count, recall — the number a deployment watches when tuning
    bits/probes.

    Scale: truth is broadcast-queries × corpus (linear in corpus — the
    brute-force rung is the evaluation harness, priced per query, never
    corpus × corpus); retrieved is the production bucket equi-join. The
    final joins and aggregates run on O(queries × k) rows."""
    emb = T(spark, sf_dir, "embeddings")
    truth = (
        S.cosine_topk(emb, emb.filter(F.col("vec_id") < _N_QUERIES), k=_K_EVAL)
        .select("query_id", "cand_id")
    )
    base = emb.select(
        "vec_id", F.expr(_QVEC.format(col="embedding")).alias("qvec")
    ).withColumn("bucket", F.expr(_bucket_from_qvec("qvec")))
    q = base.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("qe"), "bucket"
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    from ..checkpoints import ckpt_local

    # O(queries × k) rows — bounded: cut once so the hit join and the
    # per-query retrieved count read the materialized frame instead of
    # re-planning the bucket join + ranking window under both consumers
    # (optimization r14, guide §2.4; 7 exchanges -> 4).
    retrieved = ckpt_local(
        base.join(F.broadcast(q), ["bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            _cosine_col("qe", "qvec").alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= _K_EVAL)
        .select("query_id", "cand_id")
    )
    retr_counts = retrieved.groupBy("query_id").agg(
        F.count("*").alias("n_retrieved")
    )
    hits = retrieved.select(
        F.col("query_id").alias("r_qid"), F.col("cand_id").alias("hit_id")
    )
    hit = F.count(F.when(F.col("hit_id").isNotNull(), 1))
    return (
        truth.join(
            hits,
            (truth["query_id"] == hits["r_qid"]) & (truth["cand_id"] == hits["hit_id"]),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("*").cast("bigint").alias("n_truth"),
            hit.cast("bigint").alias("n_hit"),
        )
        .join(retr_counts, "query_id", "left")
        .select(
            "query_id",
            "n_truth",
            F.coalesce(F.col("n_retrieved"), F.lit(0)).cast("bigint").alias("n_retrieved"),
            "n_hit",
            F.round(F.col("n_hit").cast("double") / F.col("n_truth"), 6).alias("recall"),
        )
        .orderBy("query_id")
    )
