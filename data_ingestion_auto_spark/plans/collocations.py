"""Collocation extraction — adjacent-bigram PMI ranking over the corpus.

The text-analysis rung that surfaces multi-word expressions ("new york",
"machine learning") for tokenizer seeding and quality auditing. PMI =
log p(ab) / (p(a) p(b)); log is monotone, so the ranking needs only the
RATIO c_ab * N_tok^2 / (N_pairs * c_a * c_b) — the same log-free
rationalization `distinctive_terms_topk` uses for idf, keeping libm (and
its engine-specific rounding) out of the result entirely. The ratio is
computed as a chain of IEEE doubles written identically in both engines
(exact int->double conversions, left-associated multiplies, one divide —
every step correctly rounded, therefore bit-identical).

At 100 TB: two pruned text-only corpus scans (one for unigram counts,
one for the adjacent-pair explode — the dsir two-scan shape), each a
map-side-combinable groupBy; the two 1-row totals broadcast; min-support
prunes the bigram table before the top-k rank-filter (orderBy+limit =
TakeOrdered, no global sort).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .helpers import T
from ..checkpoints import ckpt
from .registry import query

_MIN_SUPPORT = 20
_TOPK = 20

# Guard the size-1 case: Spark's sequence(0, -1) is the DESCENDING
# [0, -1] (DuckDB's generate_series(1, 0) is empty), so an unguarded
# explode would hit s[-1] — INVALID_ARRAY_INDEX under ANSI mode, silent
# null pairs otherwise. CASE to an empty array, matching the oracle.
_PAIRS = (
    "explode(CASE WHEN size(s) >= 2"
    " THEN transform(sequence(0, size(s) - 2), i -> struct(s[i] AS l, s[i + 1] AS r))"
    " ELSE array() END)"
)

_RATIO = (
    "(CAST(c_ab AS DOUBLE) * CAST(n_tok AS DOUBLE) * CAST(n_tok AS DOUBLE))"
    " / (CAST(n_pairs AS DOUBLE) * CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))"
)


@query(
    "collocation_pmi_topk",
    oracle=f"""
WITH uni AS (
  SELECT word, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> '' GROUP BY word
),
big AS (
  SELECT s[i] AS l, s[i + 1] AS r, CAST(count(*) AS BIGINT) AS c_ab
  FROM (SELECT string_split(text, ' ') AS s FROM documents),
       LATERAL (SELECT unnest(generate_series(1, len(s) - 1)) AS i) g
  GROUP BY 1, 2
),
tot AS (
  SELECT (SELECT sum(c) FROM uni) AS n_tok,
         (SELECT sum(c_ab) FROM big) AS n_pairs
)
SELECT l, r, c_ab,
       ua.c AS c_a, ub.c AS c_b,
       {_RATIO} AS pmi_ratio
FROM big
JOIN uni ua ON big.l = ua.word
JOIN uni ub ON big.r = ub.word
CROSS JOIN tot
WHERE c_ab >= {_MIN_SUPPORT}
ORDER BY pmi_ratio DESC, l, r
LIMIT {_TOPK}
""",
    tags=("text", "collocation", "pmi", "llm"),
)
def collocation_pmi_topk(spark, sf_dir):
    """Top-{_TOPK} adjacent-word collocations by PMI ratio (min support
    {_MIN_SUPPORT} occurrences): unigram and adjacent-bigram counts from
    two pruned corpus scans, 1-row totals broadcast, log-free rational
    PMI, TakeOrdered top-k. See module docstring for the determinism and
    scale arguments."""
    docs = T(spark, sf_dir, "documents")
    uni = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("c"))
        # vocab-sized, referenced three times (left join, right join,
        # n_tok total) — checkpoint so the corpus scans once for it.
        .transform(ckpt)
    )
    big = (
        docs.select(F.split("text", " ").alias("s"))
        .select(F.expr(_PAIRS).alias("p"))
        .select("p.l", "p.r")
        .groupBy("l", "r")
        .agg(F.count("*").cast("bigint").alias("c_ab"))
        # bigram-type-sized, referenced twice (rows + n_pairs total).
        .transform(ckpt)
    )
    tot = F.broadcast(
        uni.agg(F.sum("c").alias("n_tok")).crossJoin(
            big.agg(F.sum("c_ab").alias("n_pairs"))
        )
    )
    ua = uni.select(F.col("word").alias("l"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("word").alias("r"), F.col("c").alias("c_b"))
    return (
        big.filter(F.col("c_ab") >= _MIN_SUPPORT)
        .join(ua, "l")
        .join(ub, "r")
        .crossJoin(tot)
        .select("l", "r", "c_ab", "c_a", "c_b", F.expr(_RATIO).alias("pmi_ratio"))
        .orderBy(F.desc("pmi_ratio"), "l", "r")
        .limit(_TOPK)
    )
