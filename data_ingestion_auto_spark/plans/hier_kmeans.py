"""Driver row for the hierarchical (two-level, IVF-style) k-means tier
(`operators/ivf.py::kmeans_hierarchical`) — the k ∝ corpus regime's
clustering path (see SCALE.md round-6: flat Lloyd assignment is n·k per
iteration = O(n²) total when k scales with the corpus; two-level is
n·O(√k)).

The DuckDB oracle unrolls BOTH levels exactly, the same way
``ann_ivf_probe``'s oracle unrolls flat k-means: coarse init → assign →
update ×2 → final assign (reusing ``semdedup._KM_CTES`` at k1=3), then
fine init (each coarse group's 3 smallest ids) → within-group assign →
group-wise integer-mean update ×2 → final within-group assign. Every
distance and centroid update is exact BIGINT arithmetic with the house
sign-correct integer division, so Spark and DuckDB agree bit-for-bit.
cluster_id = coarse·k2 + fine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import semdedup as _sd
from .helpers import T
from .registry import query
from .semdedup import _KM_CTES

_COARSE_CTES = _KM_CTES.replace("LIMIT 8", "LIMIT 3")

_FINE_DIST = (
    "list_sum(list_transform(generate_series(1, len(v.qvec)),"
    " i -> (v.qvec[i] - c.cvec[i]) * (v.qvec[i] - c.cvec[i])))"
)


def _fine_assign(src_vecs: str, cents: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT vec_id, group_id, qvec, fine_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, fine_id) AS rn
    FROM (
      SELECT v.vec_id, v.group_id, v.qvec, c.fine_id, {_FINE_DIST} AS dist2
      FROM {src_vecs} v JOIN {cents} c ON v.group_id = c.group_id)
  ) WHERE rn = 1
)"""


def _fine_update(src_assign: str, out_m: str, out_c: str) -> str:
    return f"""
{out_m} AS (
  SELECT group_id, fine_id, pos,
         CASE WHEN sum(v) < 0 THEN -(abs(sum(v)) // count(*)) ELSE sum(v) // count(*) END AS cv
  FROM (SELECT group_id, fine_id, g.i AS pos, qvec[g.i] AS v
        FROM {src_assign}, LATERAL (SELECT unnest(generate_series(1, len(qvec))) AS i) g)
  GROUP BY 1, 2, 3
),
{out_c} AS (SELECT group_id, fine_id, list(cv ORDER BY pos) AS cvec FROM {out_m} GROUP BY 1, 2)"""


@query(
    "hierarchical_kmeans_assign",
    oracle=f"""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qvec
  FROM embeddings
),{_COARSE_CTES},
gv AS (SELECT vec_id, cluster_id AS group_id, qvec FROM a3),
f0 AS (
  SELECT group_id, CAST(rn - 1 AS INTEGER) AS fine_id, qvec AS cvec FROM (
    SELECT group_id, qvec, row_number() OVER (PARTITION BY group_id ORDER BY vec_id) AS rn
    FROM gv
  ) WHERE rn <= 3
),{_fine_assign('gv', 'f0', 'fa1')},{_fine_update('fa1', 'fm1', 'fc1')},
{_fine_assign('gv', 'fc1', 'fa2')},{_fine_update('fa2', 'fm2', 'fc2')},
{_fine_assign('gv', 'fc2', 'fa3')}
SELECT vec_id,
       CAST(group_id * 3 + fine_id AS BIGINT) AS cluster_id
FROM fa3
ORDER BY vec_id
""",
    tags=("similarity", "ann", "kmeans", "hierarchical", "embedding"),
)
def hierarchical_kmeans_assign(spark, sf_dir):
    """Two-level k-means assignment over the embedding corpus (k = 9 as
    coarse 3 × fine 3 — the oracle's unrolled CTEs must be finite; the
    deployment regime scales both levels, see SCALE.md). Output:
    (vec_id, cluster_id) with the composite coarse·3+fine id.

    Scale: coarse assignment broadcasts 3 centroids (map-side); fine
    assignment joins the centroid DataFrame on group_id — the centroid
    table is never collected, so total k may grow with the corpus while
    per-iteration cost stays n·O(√k). The assignment table is MEMOIZED
    per corpus version (plans/ann_memo.py, round-12) — trained once,
    joined thereafter; exact BIGINT k-means keeps the memo bit-identical
    to the live derivation."""
    from .ann_memo import emb_full, kmh_assign

    assigned = kmh_assign(
        spark, sf_dir, "full", lambda: emb_full(spark, sf_dir), k=9
    )
    return (
        assigned.select("vec_id", F.col("cluster_id").cast("bigint").alias("cluster_id"))
        .orderBy("vec_id")
    )


@query(
    "semdedup_hier",
    oracle=f"""
WITH {_sd._AUG_QV},{_COARSE_CTES},
gv AS (SELECT vec_id, cluster_id AS group_id, qvec FROM a3),
f0 AS (
  SELECT group_id, CAST(rn - 1 AS INTEGER) AS fine_id, qvec AS cvec FROM (
    SELECT group_id, qvec, row_number() OVER (PARTITION BY group_id ORDER BY vec_id) AS rn
    FROM gv
  ) WHERE rn <= 3
),{_fine_assign('gv', 'f0', 'fa1')},{_fine_update('fa1', 'fm1', 'fc1')},
{_fine_assign('gv', 'fc1', 'fa2')},{_fine_update('fa2', 'fm2', 'fc2')},
{_fine_assign('gv', 'fc2', 'fa3')},
hc AS (
  SELECT vec_id, qvec, CAST(group_id * 3 + fine_id AS BIGINT) AS cluster_id FROM fa3
),
{_sd._pairs_cte('hc')}
{_sd._survivor_select('hc', 'm.cluster_id')}
""",
    tags=("dedup", "similarity", "embedding", "semdedup", "hierarchical"),
)
def semdedup_hier(spark, sf_dir):
    """SemDeDup in the paper's DEPLOYMENT shape (Abbas et al. 2023 §3:
    k ∝ corpus so expected cluster size stays constant): two-level
    k-means over the augmented embedding corpus (coarse 3 × fine 3 —
    the oracle's unrolled CTEs must be finite), then the within-cluster
    quantized-cosine ≥ 0.99 gate and keep-min-id survivor keyed on the
    composite cluster_id. Output: (vec_id, cluster_id, keep_id,
    is_semantic_dup) — same contract as ``semdedup_clusters``, which
    stays registered as the flat-clustering correctness twin.

    Scale: coarse assignment broadcasts √k centroids (map-side); fine
    assignment joins the centroid DataFrame on group_id, so the total
    centroid count may grow with the corpus while per-iteration
    assignment stays n·O(√k) — with k ∝ n that is the difference
    between O(n^1.5) and flat k-means' O(n²) total work, and constant
    expected cluster size keeps the pairwise gate linear (SCALE.md
    zipf-10×: 0.31 here vs 1.7 for the pinned-k flat variant).
    ``tools/soak.py`` drives the SAME plan function
    (``plans.semdedup.semdedup_hier_with_k``) at k = 8·n/2000."""
    return _sd.semdedup_hier_with_k(spark, sf_dir, k=9)
