"""PageRank over the near-duplicate graph — graph analytics as a
curation signal: a document whose near-dup neighborhood is large and
well-connected (boilerplate families, mirror farms) concentrates rank,
which is exactly the cohort a curation pass down-weights. Complements
`neardup_components` (which labels the families) with a CENTRALITY
score inside them.

Determinism: the classic PageRank iteration in EXACT integer
micro-units — pr₀ = 1,000,000 per node; each round every node sends
pr div deg to each neighbor (BIGINT truncating division, identical in
both engines on non-negative values) and receives
pr' = 150,000 + (85 · Σ contributions) div 100 — the d = 0.85 damped
update with all arithmetic in integers, so three unrolled rounds are
bit-identical in Spark and DuckDB (the kmeans/BPE finite-unroll oracle
pattern). The undirected LSH-candidate graph has no dangling nodes by
construction (every node is incident to a pair).

At 100 TB: per round = one groupBy on the destination key over the
edge list with map-side partial sums — the textbook message-passing
join (edges ⋈ ranks on source, aggregate on destination), linear in
edges per round, O(fixed rounds). Same plan family as
connected_components' label propagation; ranks are integers so no
float-order nondeterminism across partitions.

Reference scope: LLM-pipeline tier (COVERAGE.md) — the reference has
no graph analytics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from .dedup import _SQL_SHINGLES
from .helpers import T
from .registry import query

_ROUNDS = 3
_TOPN = 50

_SQL_LSH_PAIRS = f"""
{_SQL_SHINGLES.format(where="")},
perms AS (SELECT doc_id, shingle, unnest(generate_series(0, 15)) AS perm FROM sh),
sig AS (
  SELECT doc_id, perm, min(md5(concat(perm, '|', shingle))) AS minhash
  FROM perms GROUP BY 1, 2
),
banded AS (
  SELECT doc_id, CAST(perm // 4 AS INTEGER) AS band,
         md5(string_agg(minhash, '|' ORDER BY perm)) AS band_hash
  FROM sig GROUP BY doc_id, CAST(perm // 4 AS INTEGER)
),
capped AS (
  SELECT doc_id, band, band_hash FROM (
    SELECT doc_id, band, band_hash,
           row_number() OVER (PARTITION BY band, band_hash ORDER BY doc_id) AS rn
    FROM banded
  ) WHERE rn <= 1000
),
pairs AS (
  SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b
  FROM capped b1 JOIN capped b2
    ON b1.band = b2.band AND b1.band_hash = b2.band_hash AND b1.doc_id < b2.doc_id
)"""


def _sql_round(k: int) -> str:
    prev = "pr0" if k == 1 else f"it{k - 1}"
    return f"""
it{k} AS (
  SELECT e.v AS u,
         CAST(150000 + (85 * sum(p.pr // d.deg)) // 100 AS BIGINT) AS pr
  FROM edges e
  JOIN {prev} p ON e.u = p.u
  JOIN deg d ON e.u = d.u
  GROUP BY e.v
)"""


@query(
    "neardup_pagerank",
    oracle=f"""
WITH {_SQL_LSH_PAIRS},
edges AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b AS u, a AS v FROM pairs),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY u),
pr0 AS (SELECT u, CAST(1000000 AS BIGINT) AS pr FROM deg),
{",".join(_sql_round(k) for k in range(1, _ROUNDS + 1))}
SELECT it{_ROUNDS}.u AS doc_id, deg.deg, it{_ROUNDS}.pr AS pagerank_micro
FROM it{_ROUNDS} JOIN deg ON it{_ROUNDS}.u = deg.u
ORDER BY pagerank_micro DESC, doc_id
LIMIT {_TOPN}
""",
    tags=("graph", "pagerank", "dedup", "llm", "iterative"),
)
def neardup_pagerank(spark, sf_dir):
    """Top-{_TOPN} documents by damped PageRank (3 integer-exact rounds,
    micro-units) over the undirected MinHash-LSH candidate graph, with
    degree riding along — the centrality-inside-boilerplate-families
    curation signal. Finite unroll makes the iterative algorithm fully
    oracle-checkable (see module docstring)."""
    docs = T(spark, sf_dir, "documents")
    sig = D.minhash_signature(D.shingles(docs), num_perm=16)
    pairs = D.lsh_candidates(sig, bands=4, rows_per_band=4).localCheckpoint()
    edges = (
        pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(pairs.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint()
    )
    deg = edges.groupBy("u").agg(F.count("*").cast("bigint").alias("deg")).localCheckpoint()
    pr = deg.select("u", F.lit(1000000).cast("bigint").alias("pr"))
    for _ in range(_ROUNDS):
        contrib = (
            edges.join(pr, "u")
            .join(deg, "u")
            .select("v", F.expr("pr div deg").alias("c"))
        )
        pr = (
            contrib.groupBy("v")
            .agg(
                F.expr("CAST(150000 + (85 * sum(c)) div 100 AS BIGINT)").alias("pr")
            )
            .select(F.col("v").alias("u"), "pr")
            .localCheckpoint()
        )
    return (
        pr.join(deg, "u")
        .select(F.col("u").alias("doc_id"), "deg", F.col("pr").alias("pagerank_micro"))
        .orderBy(F.desc("pagerank_micro"), "doc_id")
        .limit(_TOPN)
    )
