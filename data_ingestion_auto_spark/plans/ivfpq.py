"""IVF-PQ — the production 100 TB ANN index (Jégou et al. 2011 §IV;
the default large-scale index in public Faiss): coarse k-means routes
each vector to an inverted list, the RESIDUAL (vector − its coarse
centroid) is product-quantized with shared subspace codebooks, and a
query scans only its nprobe nearest lists, ranking candidates by ADC
over per-(query, probed-list) residual distance tables.

Assembled from this engine's already-verified pieces — nothing new at
the physical level:

- coarse routing  = ``kmeans_lite`` (k=4, driver-held centroids);
- residuals      = exact BIGINT ``zip_with`` subtraction;
- PQ codebooks   = ``kmeans_grouped`` over (subspace × residual-slice)
  rows (codebook table joined by key, never collected);
- probing        = the ``ann_ivf_probe`` nprobe window;
- ADC            = the ``pq_adc_topk`` broadcast lookup join, keyed by
  (query, probed cluster) because residual distance tables are
  per-list in IVF-PQ.

The DuckDB oracle unrolls ALL of it: the flat coarse k-means CTEs
(``semdedup._KM_CTES`` at k=4), residual construction, the per-subspace
grouped k-means (``hier_kmeans`` generators), probing, and the ADC
join — exact integer arithmetic end-to-end, so the hash gate covers the
complete index construction + search path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# helpers.T now reached via ann_memo.emb_full
from .hier_kmeans import _FINE_DIST, _fine_assign, _fine_update
from .registry import query
from .semdedup import _KM_CTES

_COARSE = _KM_CTES.replace("LIMIT 8", "LIMIT 4")
_M = 4
_SUBDIM = 16
_K = 4  # PQ centroids per subspace
_NQ = 4
_NPROBE = 2
_TOPK = 3

_CDIST = (
    "list_sum(list_transform(generate_series(1, len(q.qvec)),"
    " i -> (q.qvec[i] - c.cvec[i]) * (q.qvec[i] - c.cvec[i])))"
)


@query(
    "ivfpq_adc_topk",
    oracle=f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qvec
  FROM embeddings
),{_COARSE},
res AS (
  SELECT a.vec_id, a.cluster_id,
         list_transform(generate_series(1, len(a.qvec)), i -> a.qvec[i] - c.cvec[i]) AS rvec
  FROM a3 a JOIN c2 c ON a.cluster_id = c.cluster_id
),
gv2 AS (
  SELECT vec_id * {_M} + s.sub_id AS vec_id, s.sub_id AS group_id,
         rvec[s.sub_id * {_SUBDIM} + 1 : s.sub_id * {_SUBDIM} + {_SUBDIM}] AS qvec
  FROM res CROSS JOIN (SELECT unnest(generate_series(0, {_M} - 1)) AS sub_id) s
),
f0 AS (
  SELECT group_id, CAST(rn - 1 AS INTEGER) AS fine_id, qvec AS cvec FROM (
    SELECT group_id, qvec, row_number() OVER (PARTITION BY group_id ORDER BY vec_id) AS rn
    FROM gv2
  ) WHERE rn <= {_K}
),{_fine_assign('gv2', 'f0', 'fa1')},{_fine_update('fa1', 'fm1', 'fc1')},
{_fine_assign('gv2', 'fc1', 'fa2')},{_fine_update('fa2', 'fm2', 'fc2')},
{_fine_assign('gv2', 'fc2', 'fa3')},
codes AS (SELECT vec_id // {_M} AS orig_id, group_id, fine_id FROM fa3),
probes AS (
  SELECT query_id, cluster_id FROM (
    SELECT q.vec_id AS query_id, c.cluster_id, {_CDIST} AS dist2,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY {_CDIST}, c.cluster_id) AS rn
    FROM (SELECT * FROM qv WHERE vec_id < {_NQ}) q CROSS JOIN c2 c
  ) WHERE rn <= {_NPROBE}
),
qres AS (
  SELECT p.query_id, p.cluster_id,
         list_transform(generate_series(1, len(q.qvec)), i -> q.qvec[i] - c.cvec[i]) AS rvec
  FROM probes p
  JOIN qv q ON q.vec_id = p.query_id
  JOIN c2 c ON c.cluster_id = p.cluster_id
),
qsub AS (
  SELECT query_id, cluster_id, s.sub_id AS group_id,
         rvec[s.sub_id * {_SUBDIM} + 1 : s.sub_id * {_SUBDIM} + {_SUBDIM}] AS qvec
  FROM qres CROSS JOIN (SELECT unnest(generate_series(0, {_M} - 1)) AS sub_id) s
),
qdist AS (
  SELECT v.query_id, v.cluster_id, v.group_id, c.fine_id, {_FINE_DIST} AS d
  FROM qsub v JOIN fc2 c ON v.group_id = c.group_id
),
adc AS (
  SELECT p.query_id, m.vec_id AS cand_id, sum(q.d) AS adc_dist2
  FROM probes p
  JOIN a3 m ON m.cluster_id = p.cluster_id AND m.vec_id <> p.query_id
  JOIN codes co ON co.orig_id = m.vec_id
  JOIN qdist q ON q.query_id = p.query_id AND q.cluster_id = p.cluster_id
             AND q.group_id = co.group_id AND q.fine_id = co.fine_id
  GROUP BY 1, 2
)
SELECT query_id, cand_id, CAST(adc_dist2 AS BIGINT) AS adc_dist2,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dist2, cand_id) AS rank
  FROM adc
) WHERE rank <= {_TOPK}
ORDER BY query_id, rank
""",
    tags=("similarity", "ann", "ivf", "pq", "embedding"),
)
def ivfpq_adc_topk(spark, sf_dir):
    """Full IVF-PQ search path: coarse-route the corpus (k=4), PQ-encode
    residuals (4 subspaces × 4 centroids, shared codebooks), then for
    each of the 4 smallest-id queries probe the 2 nearest inverted
    lists and ADC-rank their members. Output: (query_id, cand_id,
    adc_dist2, rank), top-3 per query.

    Scale: a query touches nprobe/k of the corpus (the IVF win) and the
    scan side carries 1-byte codes (the PQ win); the residual distance
    tables are n_queries·nprobe·m·k integers — broadcast. This is the
    same index layout a Faiss-style store shards across a cluster."""
    from ..operators.ivf import _DIST2, quantize
    from .ann_memo import emb_full, kmg_model, kml_model

    emb = emb_full(spark, sf_dir)
    # coarse quantizer + residual PQ codebooks are the MEMOIZED IVF-PQ
    # model (plans/ann_memo.py, round-12): the residual-subspace build
    # chains on the memoized coarse tables, so a cold run trains each
    # tier once and every later query joins the stored model — the Faiss
    # train/add/search separation
    assigned, c2 = kml_model(spark, sf_dir, "full", lambda: emb, k=4)

    def _residual_sub():
        res = assigned.join(F.broadcast(c2), "cluster_id").select(
            "vec_id",
            "cluster_id",
            F.expr("zip_with(qvec, cvec, (x, y) -> x - y)").alias("rvec"),
        )
        return res.select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(_M - 1))).alias("group_id"),
            "rvec",
        ).select(
            (F.col("vec_id") * _M + F.col("group_id")).alias("rid"),
            "group_id",
            F.expr(f"slice(rvec, group_id * {_SUBDIM} + 1, {_SUBDIM})").alias("qvec"),
        )

    pq_codes, pq_cents = kmg_model(
        spark, sf_dir, "ivfpqres", _residual_sub, k_per_group=_K
    )
    codes = pq_codes.select(
        F.expr(f"rid div {_M}").alias("orig_id"), "group_id", "fine_id"
    )

    qv = quantize(emb)
    from pyspark.sql import Window as W

    queries = qv.filter(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("qq")
    )
    qc = queries.crossJoin(F.broadcast(c2)).withColumn(
        "dist2", F.expr(_DIST2.format(a="qq", b="cvec"))
    )
    wp = W.partitionBy("query_id").orderBy("dist2", "cluster_id")
    probes = (
        qc.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= _NPROBE)
        .select("query_id", "qq", "cluster_id")
    )
    qres = probes.join(F.broadcast(c2), "cluster_id").select(
        "query_id",
        "cluster_id",
        F.expr("zip_with(qq, cvec, (x, y) -> x - y)").alias("rvec"),
    )
    qsub = qres.select(
        "query_id",
        "cluster_id",
        F.explode(F.sequence(F.lit(0), F.lit(_M - 1))).alias("group_id"),
        "rvec",
    ).select(
        "query_id",
        "cluster_id",
        "group_id",
        F.expr(f"slice(rvec, group_id * {_SUBDIM} + 1, {_SUBDIM})").alias("qq"),
    )
    qdist = qsub.join(pq_cents, "group_id").select(
        "query_id",
        "cluster_id",
        "group_id",
        "fine_id",
        F.expr(_DIST2.format(a="qq", b="cvec")).alias("d"),
    )
    members = assigned.select("vec_id", "cluster_id")
    cand = members.join(codes, members.vec_id == codes.orig_id).select(
        "cluster_id", "orig_id", "group_id", "fine_id"
    )
    adc = (
        cand.join(F.broadcast(qdist), ["cluster_id", "group_id", "fine_id"])
        .filter(F.col("orig_id") != F.col("query_id"))
        .groupBy("query_id", F.col("orig_id").alias("cand_id"))
        .agg(F.sum("d").cast("bigint").alias("adc_dist2"))
    )
    wr = W.partitionBy("query_id").orderBy("adc_dist2", "cand_id")
    return (
        adc.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", "cand_id", "adc_dist2", "rank")
        .orderBy("query_id", "rank")
    )
