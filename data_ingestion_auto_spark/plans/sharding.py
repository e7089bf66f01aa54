"""Rendezvous (highest-random-weight) sharding — Thaler & Ravishankar
1996: every (doc, shard) pair gets a hash weight, a doc lives on the
shard with the highest weight. The property that matters at 100 TB:
when the shard count grows N → N+1, a doc's argmax only changes if the
NEW shard wins, so exactly the ~1/(N+1) of documents that the new shard
claims move, and nothing reshuffles between the old shards — unlike
modulo sharding, where changing N moves (N-1)/N of the corpus.

The registered query is the REBALANCE PLAN readout: the (shard_before,
shard_after) movement matrix for an 8 → 9 expansion. An operator
deciding whether to grow a fleet reads this table (and its row counts)
before committing to the data movement.

Shape: per-document work is a fixed bundle of md5s + one greatest() +
one CASE — pure map-side codegen over a doc_id-only scan (column-pruned
to 8 bytes/row); the aggregate has ≤ N_old × N_new groups, so the
shuffle carries at most 72 rows per partition. No explode, no join, no
window — this is the cheapest possible shape for an argmax over a
CONSTANT domain.
"""

from __future__ import annotations

from .helpers import T
from .registry import query

_N_OLD, _N_NEW = 8, 9


def _hrw_case(n: int) -> str:
    """CASE expression picking argmax_s md5(doc_id || '|' || s), s < n —
    written over the named hash columns h0..h{n-1}."""
    g = "greatest(" + ", ".join(f"h{s}" for s in range(n)) + ")"
    return (
        "CASE "
        + " ".join(f"WHEN h{s} = {g} THEN {s}" for s in range(n))
        + " END"
    )


_HASHES = ", ".join(
    f"md5(concat(doc_id, '|', {s})) AS h{s}" for s in range(_N_NEW)
)

_SHARDS_SQL = f"""
h AS (SELECT doc_id, {_HASHES} FROM documents),
s AS (
  SELECT CAST({_hrw_case(_N_OLD)} AS BIGINT) AS shard_before,
         CAST({_hrw_case(_N_NEW)} AS BIGINT) AS shard_after
  FROM h
)
"""


@query(
    "rendezvous_shard_rebalance",
    oracle=f"""
WITH {_SHARDS_SQL}
SELECT shard_before, shard_after, CAST(count(*) AS BIGINT) AS n_docs
FROM s
GROUP BY shard_before, shard_after
ORDER BY shard_before, shard_after
""",
    tags=("sharding", "rendezvous", "rebalance", "llm", "observability"),
)
def rendezvous_shard_rebalance(spark, sf_dir):
    """HRW movement matrix for an 8 → 9 shard expansion: per
    (shard_before, shard_after) pair, how many documents land there.
    Rendezvous hashing guarantees the off-diagonal rows all have
    shard_after = 8 (docs only ever move TO the new shard, ~1/9 of the
    corpus in expectation) — pinned in tests/test_sharding.py; modulo
    sharding would scatter ~8/9 of the corpus across every off-diagonal
    cell.

    Scale: map-side md5 bundle + greatest + CASE over a doc_id-pruned
    scan; the groupBy carries ≤ 72 groups. Output ≤ N_old x N_new rows
    at any corpus — the observability-contract shape."""
    docs = T(spark, sf_dir, "documents").select("doc_id")
    h = docs.selectExpr("doc_id", *(
        f"md5(concat(doc_id, '|', {s})) AS h{s}" for s in range(_N_NEW)
    ))
    s = h.selectExpr(
        f"CAST({_hrw_case(_N_OLD)} AS BIGINT) AS shard_before",
        f"CAST({_hrw_case(_N_NEW)} AS BIGINT) AS shard_after",
    )
    from pyspark.sql import functions as F

    return (
        s.groupBy("shard_before", "shard_after")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("shard_before", "shard_after")
    )
