"""SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") — the embedding-space rung
ABOVE pairwise near-dup dedup: cluster the corpus embeddings with
k-means, then deduplicate only WITHIN clusters, so the quadratic pairwise
step is bounded by cluster size instead of corpus size (k grows with the
corpus to hold expected cluster size constant — that is the paper's
scalability argument, and it maps exactly onto a Spark equi-join on
cluster_id).

Composition of existing tiers, nothing new at the physical level:

- the deterministic integer k-means-lite quantizer from
  ``operators/ivf.py`` (k=8, 2 Lloyd iterations, init = smallest ids —
  bit-stable across engines because every distance and centroid update is
  exact BIGINT arithmetic);
- the quantized-cosine near-dup gate and 2%-perturbed augmentation from
  ``plans/similarity_lsh.py`` (the fixture's random embeddings top out at
  cosine ≈ 0.51, so without the 20 deterministic perturbed copies a 0.99
  threshold would be dead code);
- keep-min-id representative per semantic-dup relation (the paper keeps
  the point with lowest centroid similarity; min id is the deterministic
  stand-in — the RULE, which vector survives, is what's under test).

The DuckDB oracle unrolls the fixed-iteration k-means exactly as
``ann_ivf_probe``'s does (init → assign → update ×2 → final assign as
chained CTEs) over the augmented corpus, then replays the within-cluster
pairwise gate bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .helpers import T
from .registry import query
from .similarity_lsh import _cosine_col, _NEARDUP_T

# The 2%-perturbed augmentation (first dimension ×1.02, ids offset by
# 10_000_000 — beyond any fixture corpus) shared by every semdedup
# variant: the fixture's random embeddings top out at cosine ≈ 0.51, so
# without the 20 deterministic near-copies the 0.99 gate would be dead
# code at every SF.
_PERT_VEC = (
    "concat(array(CAST(element_at(embedding, 1) AS DOUBLE) * 1.02), "
    "transform(slice(embedding, 2, 63), x -> CAST(x AS DOUBLE)))"
)

_AUG_QV = """aug AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000000,
         list_concat([CAST(embedding[1] AS DOUBLE) * 1.02], CAST(embedding[2:] AS DOUBLE[]))
  FROM embeddings WHERE vec_id < 20
),
qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qvec
  FROM aug
)"""


def _pairs_cte(src: str) -> str:
    """Within-cluster quantized-cosine ≥ threshold dup pairs over any
    (vec_id, qvec, cluster_id) CTE — shared by the flat and hierarchical
    semdedup oracles so the gate is replayed bit-for-bit identically."""
    return f"""pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM {src} a JOIN {src} b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE round(CAST(list_sum(list_transform(generate_series(1, len(a.qvec)),
                   i -> a.qvec[i] * b.qvec[i])) AS DOUBLE)
              / (sqrt(CAST(list_sum(list_transform(a.qvec, x -> x * x)) AS DOUBLE))
                 * sqrt(CAST(list_sum(list_transform(b.qvec, x -> x * x)) AS DOUBLE))), 6)
        >= {_NEARDUP_T}
)"""


def _survivor_select(src: str, cluster_expr: str) -> str:
    return f"""SELECT m.vec_id,
       {cluster_expr} AS cluster_id,
       coalesce(min(p.a), m.vec_id) AS keep_id,
       (coalesce(min(p.a), m.vec_id) <> m.vec_id) AS is_semantic_dup
FROM {src} m LEFT JOIN pairs p ON p.b = m.vec_id
GROUP BY m.vec_id, m.cluster_id
ORDER BY m.vec_id"""


_KM_CTES = """
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster_id, cvec
  FROM (SELECT vec_id, qvec AS cvec FROM qv ORDER BY vec_id LIMIT 8)
),
a1 AS (
  SELECT vec_id, qvec, cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cluster_id) AS rn FROM (
      SELECT v.vec_id, v.qvec, c.cluster_id,
             list_sum(list_transform(generate_series(1, len(v.qvec)),
                      i -> (v.qvec[i] - c.cvec[i]) * (v.qvec[i] - c.cvec[i]))) AS dist2
      FROM qv v CROSS JOIN c0 c)
  ) WHERE rn = 1
),
m1 AS (
  SELECT cluster_id, pos,
         CASE WHEN sum(v) < 0 THEN -(abs(sum(v)) // count(*)) ELSE sum(v) // count(*) END AS cv
  FROM (SELECT cluster_id, g.i AS pos, qvec[g.i] AS v
        FROM a1, LATERAL (SELECT unnest(generate_series(1, len(qvec))) AS i) g)
  GROUP BY 1, 2
),
c1 AS (SELECT cluster_id, list(cv ORDER BY pos) AS cvec FROM m1 GROUP BY 1),
a2 AS (
  SELECT vec_id, qvec, cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cluster_id) AS rn FROM (
      SELECT v.vec_id, v.qvec, c.cluster_id,
             list_sum(list_transform(generate_series(1, len(v.qvec)),
                      i -> (v.qvec[i] - c.cvec[i]) * (v.qvec[i] - c.cvec[i]))) AS dist2
      FROM qv v CROSS JOIN c1 c)
  ) WHERE rn = 1
),
m2 AS (
  SELECT cluster_id, pos,
         CASE WHEN sum(v) < 0 THEN -(abs(sum(v)) // count(*)) ELSE sum(v) // count(*) END AS cv
  FROM (SELECT cluster_id, g.i AS pos, qvec[g.i] AS v
        FROM a2, LATERAL (SELECT unnest(generate_series(1, len(qvec))) AS i) g)
  GROUP BY 1, 2
),
c2 AS (SELECT cluster_id, list(cv ORDER BY pos) AS cvec FROM m2 GROUP BY 1),
a3 AS (
  SELECT vec_id, qvec, cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cluster_id) AS rn FROM (
      SELECT v.vec_id, v.qvec, c.cluster_id,
             list_sum(list_transform(generate_series(1, len(v.qvec)),
                      i -> (v.qvec[i] - c.cvec[i]) * (v.qvec[i] - c.cvec[i]))) AS dist2
      FROM qv v CROSS JOIN c2 c)
  ) WHERE rn = 1
)"""


@query(
    "semdedup_clusters",
    oracle=f"""
WITH {_AUG_QV},{_KM_CTES},
{_pairs_cte('a3')}
{_survivor_select('a3', 'CAST(m.cluster_id AS INTEGER)')}
""",
    tags=("dedup", "similarity", "embedding", "semdedup"),
)
def semdedup_clusters(spark, sf_dir):
    """SemDeDup: k-means clusters over the (augmented) embedding corpus,
    within-cluster quantized-cosine ≥ 0.99 pairs, keep-min-id survivor per
    vector. Output: (vec_id, cluster_id, keep_id, is_semantic_dup).

    Scale: k-means cost is iters × (broadcast k×dim ints + one map-side
    assignment + one (cluster, dim) aggregation); the pairwise step is an
    equi-join on cluster_id — quadratic only within a cluster, and the
    paper's regime (k ∝ corpus size) keeps expected cluster size constant,
    so total pair work stays linear. No all-pairs join exists anywhere in
    the plan. The dup-pair join carries no broadcast hint: the pair set is
    bounded by dup *density*, not structure, so AQE decides at runtime
    (broadcast when small, shuffle-hash when a boilerplate-heavy corpus
    makes it large). Perturbed-copy ids are offset by 10_000_000 — beyond
    any fixture corpus — so augmentation never collides with real vec_ids
    at any SF.

    k=8 here is the ORACLE's k (the unrolled-CTE k-means must be finite);
    the deployment regime k ∝ corpus is exercised by ``semdedup_with_k``
    via ``tools/soak.py`` (round-5 verdict #3)."""
    return semdedup_with_k(spark, sf_dir, k=8)


def _augmented(spark, sf_dir):
    """(vec_id, embedding DOUBLE[]) corpus + the 20 perturbed near-copies."""
    emb = T(spark, sf_dir, "embeddings")
    orig = emb.select("vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"))
    pert = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), F.expr(_PERT_VEC).alias("embedding")
    )
    return orig.unionByName(pert)


def _pairs_and_keep(assigned, cluster_type: str):
    """Within-cluster cosine-gate dup pairs + keep-min-id survivor over a
    (vec_id, qvec, cluster_id) assignment frame — the SemDeDup survivor
    rule, shared by the flat and hierarchical clustering paths so both
    registered queries replay the identical gate."""
    a = assigned.select(F.col("vec_id").alias("a"), F.col("qvec").alias("qa"), "cluster_id")
    b = assigned.select(F.col("vec_id").alias("b"), F.col("qvec").alias("qb"), "cluster_id")
    pairs = (
        a.join(b, "cluster_id")
        .filter(F.col("a") < F.col("b"))
        .filter(_cosine_col("qa", "qb") >= _NEARDUP_T)
        .select("a", "b")
    )
    return (
        assigned.join(pairs, assigned.vec_id == pairs.b, "left")
        .groupBy("vec_id", "cluster_id")
        .agg(F.coalesce(F.min("a"), F.col("vec_id")).alias("keep_id"))
        .select(
            "vec_id",
            F.col("cluster_id").cast(cluster_type).alias("cluster_id"),
            "keep_id",
            (F.col("keep_id") != F.col("vec_id")).alias("is_semantic_dup"),
        )
        .orderBy("vec_id")
    )


def semdedup_with_k(spark, sf_dir, k: int):
    """The k-parameterized FLAT SemDeDup plan ``semdedup_clusters`` pins
    at k=8 for its oracle. ``tools/soak.py`` runs it with k ∝ corpus size
    (k = 8 × n_vectors/2000) so the paper's scale regime — constant
    expected cluster size, hence linear within-cluster pair work — is a
    harness-exercised path, not just SCALE.md prose. Flat assignment is
    n·k per iteration, so with k ∝ n this path does quadratic total
    assignment work; ``semdedup_hier_with_k`` is the deployment shape.

    The cluster-assignment table is MEMOIZED per corpus version
    (plans/ann_memo.py, round-12): train once at ingest, every SemDeDup
    pass joins the stored assignments — bit-identical to the live
    derivation (exact BIGINT k-means), so the oracle hash is unchanged."""
    from .ann_memo import kml_model

    assigned, _ = kml_model(
        spark, sf_dir, "aug", lambda: _augmented(spark, sf_dir), k=k
    )
    return _pairs_and_keep(assigned, "int")


def semdedup_hier_with_k(spark, sf_dir, k: int):
    """Deployment-regime SemDeDup: TWO-LEVEL k-means (coarse √k
    driver-held centroids route each vector to a group; fine centroids
    stay a distributed DataFrame joined on group_id — n·O(√k) assignment
    per iteration instead of flat n·k), then the identical within-cluster
    cosine gate + keep-min-id survivor keyed on the composite
    cluster_id = coarse·k2 + fine. With k ∝ corpus this keeps BOTH the
    clustering and the pairwise tier linear (SCALE.md zipf table: 0.31 vs
    flat-pinned-k's 1.7). Registered as ``semdedup_hier`` at k=9, the
    finite unrolled-CTE oracle (plans/hier_kmeans.py); ``tools/soak.py``
    drives this same function at k ∝ n. The two-level assignment table
    is MEMOIZED per corpus version (plans/ann_memo.py, round-12)."""
    from .ann_memo import kmh_assign

    assigned = kmh_assign(
        spark, sf_dir, "aug", lambda: _augmented(spark, sf_dir), k=k
    )
    return _pairs_and_keep(assigned, "bigint")
