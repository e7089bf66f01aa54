"""Product Quantization ANN (Jégou et al. 2011, "Product quantization
for nearest neighbor search") — the memory-compression rung of the ANN
ladder: at 100 TB the raw embeddings don't fit, so production vector
stores keep per-subspace codebook ids (here 4 subspaces × 4 centroids =
8 bits/vector instead of 64×4 bytes) and rank candidates by Asymmetric
Distance Computation (ADC): the query stays exact, each candidate's
distance is the sum of precomputed query-to-centroid distances looked
up by the candidate's codes.

Spark-first decomposition — nothing new at the physical level:

- subspace codebooks = ``operators/ivf.py::kmeans_grouped`` with
  group_id = subspace index (the round-6 grouped k-means: centroid
  table joined by key, never collected — codebook count may scale);
- encoding = the grouped assignment itself (vec_id, subspace, code);
- ADC = broadcast the (query × subspace × centroid) distance table
  (n_queries·m·k rows — tiny) into an equi-join with the codes on
  (subspace, code), then a per-(query, candidate) sum.

The DuckDB oracle unrolls the per-subspace k-means with the SAME fine
CTE generators as ``hierarchical_kmeans_assign`` (subspace index plays
the coarse-group role; rid = vec_id·m + subspace is the row id), then
replays the ADC lookup join — exact BIGINT arithmetic end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# helpers.T now reached via ann_memo.emb_full
from .hier_kmeans import _FINE_DIST, _fine_assign, _fine_update
from .registry import query

_M = 4  # subspaces
_SUBDIM = 16  # 64 / _M
_K = 4  # centroids per subspace
_NQ = 4  # query vectors (smallest ids)
_TOPK = 3


@query(
    "pq_adc_topk",
    oracle=f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qvec
  FROM embeddings
),
gv AS (
  SELECT vec_id * {_M} + s.sub_id AS vec_rid, s.sub_id AS group_id,
         qvec[s.sub_id * {_SUBDIM} + 1 : s.sub_id * {_SUBDIM} + {_SUBDIM}] AS qvec,
         vec_id AS orig_id
  FROM qv CROSS JOIN (SELECT unnest(generate_series(0, {_M} - 1)) AS sub_id) s
),
gv2 AS (SELECT vec_rid AS vec_id, group_id, qvec FROM gv),
f0 AS (
  SELECT group_id, CAST(rn - 1 AS INTEGER) AS fine_id, qvec AS cvec FROM (
    SELECT group_id, qvec, row_number() OVER (PARTITION BY group_id ORDER BY vec_id) AS rn
    FROM gv2
  ) WHERE rn <= {_K}
),{_fine_assign('gv2', 'f0', 'fa1')},{_fine_update('fa1', 'fm1', 'fc1')},
{_fine_assign('gv2', 'fc1', 'fa2')},{_fine_update('fa2', 'fm2', 'fc2')},
{_fine_assign('gv2', 'fc2', 'fa3')},
codes AS (
  SELECT vec_id // {_M} AS orig_id, group_id, fine_id FROM fa3
),
qsub AS (
  SELECT vec_id AS query_id, group_id, qvec FROM gv2 WHERE vec_id // {_M} < {_NQ}
),
qdist AS (
  SELECT v.query_id // {_M} AS query_id, v.group_id, c.fine_id, {_FINE_DIST} AS d
  FROM qsub v JOIN fc2 c ON v.group_id = c.group_id
),
adc AS (
  SELECT q.query_id, co.orig_id AS cand_id, sum(q.d) AS adc_dist2
  FROM codes co JOIN qdist q ON co.group_id = q.group_id AND co.fine_id = q.fine_id
  WHERE co.orig_id <> q.query_id
  GROUP BY q.query_id, co.orig_id
)
SELECT query_id, cand_id, CAST(adc_dist2 AS BIGINT) AS adc_dist2,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dist2, cand_id) AS rank
  FROM adc
) WHERE rank <= {_TOPK}
ORDER BY query_id, rank
""",
    tags=("similarity", "ann", "pq", "embedding"),
)
def pq_adc_topk(spark, sf_dir):
    """PQ-ADC top-k: encode the corpus as 4 subspace codebook ids
    (grouped k-means, 2 Lloyd iterations, deterministic integer math),
    then rank every vector for the 4 smallest-id queries by the sum of
    query-to-centroid distances looked up through its codes. Output:
    (query_id, cand_id, adc_dist2, rank), top-3 per query.

    Scale: encoding is the grouped-kmeans plan (n·k per subspace, the
    codebook never collected); ADC broadcasts a n_queries·m·k distance
    table into one equi-join with the codes — the scan side carries
    1-byte codes, not 256-byte vectors, which is the entire point of PQ
    at 100 TB. Ties rank by cand_id for cross-engine determinism."""
    from ..operators.ivf import _DIST2, quantize
    from .ann_memo import emb_full, kmg_model

    emb = emb_full(spark, sf_dir)
    qv = quantize(emb)
    sub = qv.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(_M - 1))).alias("group_id"),
        "qvec",
    ).select(
        (F.col("vec_id") * _M + F.col("group_id")).alias("rid"),
        "group_id",
        F.expr(f"slice(qvec, group_id * {_SUBDIM} + 1, {_SUBDIM})").alias("qvec"),
    )
    # the subspace codebooks + codes are the MEMOIZED PQ model
    # (plans/ann_memo.py, round-12) — trained once per corpus version,
    # exactly Faiss's train-once/encode-once contract
    pq_codes, cents = kmg_model(spark, sf_dir, "pqsub", lambda: sub, k_per_group=_K)
    codes = pq_codes.select(
        F.expr(f"rid div {_M}").alias("orig_id"), "group_id", "fine_id"
    )
    qsub = sub.filter(F.expr(f"rid div {_M} < {_NQ}")).select(
        F.expr(f"rid div {_M}").alias("query_id"), "group_id", F.col("qvec").alias("qq")
    )
    qdist = qsub.join(cents, "group_id").select(
        "query_id",
        "group_id",
        "fine_id",
        F.expr(_DIST2.format(a="qq", b="cvec")).alias("d"),
    )
    adc = (
        codes.join(F.broadcast(qdist), ["group_id", "fine_id"])
        .filter(F.col("orig_id") != F.col("query_id"))
        .groupBy("query_id", F.col("orig_id").alias("cand_id"))
        .agg(F.sum("d").cast("bigint").alias("adc_dist2"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy("adc_dist2", "cand_id")
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", "cand_id", "adc_dist2", "rank")
        .orderBy("query_id", "rank")
    )
