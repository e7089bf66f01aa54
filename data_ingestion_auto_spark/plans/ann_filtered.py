"""Filtered vector search — ANN with a metadata predicate, the query
shape every production vector store ships ("nearest neighbors WHERE
label = X"). A training-data pipeline runs it constantly: nearest
neighbors within a language, a source, a quality tier.

Composition over the verified sign-LSH tier (plans/similarity_lsh.py):
the candidate join keys on (bucket, label) instead of bucket alone —
the predicate becomes part of the index key, so filtering happens IN
the equi-join, never as a post-filter over an unfiltered candidate
list (the classic filtered-ANN failure mode: top-k first, filter
second, return fewer than k). Post-filtering would also be the wrong
plan at 100 TB — it retrieves candidates the predicate immediately
discards; key-composition retrieves only matching ones.

At 100 TB: identical shape to the unfiltered tier — map-only bucket
projection, one shuffle equi-join on the composite key, per-query
top-k window over label-consistent candidates. A production layout
would partition the stored index by the label column so the predicate
also prunes files (the partitioned-writer pattern of sinks.py); the
join itself is already label-local.

Reference scope: the reference engine has no vector tier; this extends
the LLM-pipeline ANN ladder (COVERAGE.md).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

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


# 4 hyperplanes, not the unfiltered tier's 8: a metadata predicate thins
# every bucket by ~n_labels, so filtered search widens the probe — the
# same knob production stores turn (more nprobe / shorter code under
# filters). 16 buckets x 10 labels keeps per-key candidate lists
# non-degenerate at every fixture SF.
_F_PLANES = 4


@query(
    "ann_filtered_lsh",
    oracle=f"""
WITH base AS (
  SELECT vec_id, label, embedding, {_bucket_sql('embedding', planes=_F_PLANES)} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, label, embedding AS qe, bucket
  FROM base WHERE vec_id < {_N_QUERIES}
),
cand AS (
  SELECT q.query_id, b.vec_id AS cand_id, b.label,
         round(({_dot_sql('qe', 'b.embedding')})
               / (sqrt({_norm_sql('qe')}) * sqrt({_norm_sql('b.embedding')})), 6) AS cosine
  FROM q JOIN base b
    ON q.bucket = b.bucket AND q.label = b.label AND b.vec_id <> q.query_id
)
SELECT query_id, cand_id, CAST(label AS INTEGER) AS label, cosine, rank FROM (
  SELECT query_id, cand_id, label, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
  FROM cand
) t WHERE rank <= 3
ORDER BY query_id, rank
""",
    tags=("similarity", "ann", "lsh", "filtered", "llm"),
)
def ann_filtered_lsh(spark, sf_dir):
    """Filtered sign-LSH ANN: per query vector, top-3 neighbors sharing
    the query's LSH bucket AND its label — the metadata predicate
    composed into the index join key, not post-filtered (see module
    docstring). Exact quantized cosine ranks within the filtered
    bucket; deterministic (cosine DESC, cand_id) tie-break."""
    emb = T(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        "label",
        F.expr(_QVEC.format(col="embedding")).alias("qvec"),
    ).withColumn("bucket", F.expr(_bucket_from_qvec("qvec", planes=_F_PLANES)))
    q = base.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("qvec").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    cand = (
        base.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("label") == F.col("qlabel")),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.col("label").cast("int").alias("label"),
            _cosine_col("qe", "qvec").alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .orderBy("query_id", "rank")
    )
