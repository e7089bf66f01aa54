"""Corpus-mixture controls: per-source document caps and UniMax
epoch-capped budget allocation — the two sampling-policy rungs that sit
between dedup/quality filtering and training-export in a pre-training
pipeline (FineWeb-style domain caps; UniMax, Chung et al. 2023).

Reference scope note: the reference pipeline has no text-curation tier
(it is a geodata ingestion engine); these operators are part of the
engine's LLM-data extension mandate, alongside ``plans/curation.py`` and
``plans/training_export.py``.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .helpers import T
from .registry import query

# FineWeb-style cap: at most this many docs survive per source; the
# within-source order is a deterministic md5 shuffle so the sample is
# unbiased w.r.t. document position.
_SRC_CAP = 15

# UniMax: each (source, lang) stratum contributes at most _EPOCH_CAP
# epochs of its tokens; the token budget is _BUDGET_NUM/_BUDGET_DEN of
# the corpus (integers so both engines floor identically).
_EPOCH_CAP = 2
_BUDGET_NUM = 6
_BUDGET_DEN = 10


@query(
    "source_capped_sample",
    oracle=f"""
SELECT doc_id, source, src_rank, src_rank <= {_SRC_CAP} AS kept,
       CAST(count(*) FILTER (WHERE src_rank <= {_SRC_CAP})
              OVER (PARTITION BY source) AS BIGINT) AS n_kept_in_source
FROM (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS BIGINT) AS src_rank
  FROM documents
)
ORDER BY doc_id
""",
    tags=("curation", "sampling", "mixture", "llm"),
)
def source_capped_sample(spark, sf_dir):
    """Per-source document cap (the FineWeb/C4 "domain cap" rung): rank
    docs within each source by a deterministic md5 shuffle of doc_id and
    keep at most ``_SRC_CAP``, so no single domain dominates the mixture.
    Output one row per doc with its within-source rank, the keep flag,
    and the per-source kept count.

    Scale: one shuffle keyed on source; the rank window partitions by
    source (partition size = per-source doc count — the very quantity the
    cap bounds downstream; a pathologically hot source is handled by the
    same rank-and-cap shape LSH buckets use). The shuffle key is the
    md5, so hot sources spread across the sort, not the hash partitions;
    no global sort except the presentation ORDER BY."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = docs.withColumn("src_rank", F.row_number().over(w).cast("bigint"))
    kept_w = W.partitionBy("source")
    return (
        ranked.withColumn("kept", F.col("src_rank") <= _SRC_CAP)
        .withColumn(
            "n_kept_in_source",
            F.count(F.when(F.col("kept"), 1)).over(kept_w).cast("bigint"),
        )
        .orderBy("doc_id")
    )


@query(
    "unimax_epoch_mixture",
    oracle=f"""
WITH strata AS (
  SELECT source, lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
  FROM documents GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(n_tok) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_strata,
         CAST(sum(n_tok) * {_BUDGET_NUM} // {_BUDGET_DEN} AS BIGINT) AS budget
  FROM strata
),
ranked AS (
  SELECT s.source, s.lang, s.n_tok, s.n_tok * {_EPOCH_CAP} AS cap,
         t.total, t.n_strata, t.budget,
         CAST(row_number() OVER (ORDER BY s.n_tok * {_EPOCH_CAP}, s.source, s.lang) AS BIGINT) AS i,
         CAST(sum(s.n_tok * {_EPOCH_CAP}) OVER (
           ORDER BY s.n_tok * {_EPOCH_CAP}, s.source, s.lang
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ccum
  FROM strata s CROSS JOIN tot t
),
flagged AS (
  SELECT *, ccum + cap * (n_strata - i) <= budget AS capped FROM ranked
),
waterline AS (
  SELECT coalesce(sum(CASE WHEN capped THEN 1 ELSE 0 END), 0) AS k,
         coalesce(sum(CASE WHEN capped THEN cap ELSE 0 END), 0) AS ccum_k
  FROM flagged
)
SELECT f.source, f.lang, f.n_tok, CAST(f.cap AS BIGINT) AS cap, f.capped,
       round(CASE WHEN f.capped THEN CAST(f.cap AS DOUBLE)
                  ELSE CAST(f.budget - w.ccum_k AS DOUBLE) / (f.n_strata - w.k) END,
             6) AS alloc_tokens,
       round(CASE WHEN f.capped THEN CAST(f.cap AS DOUBLE)
                  ELSE CAST(f.budget - w.ccum_k AS DOUBLE) / (f.n_strata - w.k) END
             / f.budget, 6) AS weight
FROM flagged f CROSS JOIN waterline w
ORDER BY f.source, f.lang
""",
    tags=("curation", "mixture", "unimax", "llm"),
)
def unimax_epoch_mixture(spark, sf_dir):
    """UniMax mixture weights (Chung et al. 2023): allocate a token
    budget (60% of the corpus) across (source, lang) strata as uniformly
    as possible subject to a per-stratum epoch cap (2 epochs of its own
    tokens). The sequential UniMax allocation equals waterfilling:
    alloc_i = min(cap_i, θ) with θ chosen so Σ alloc = budget. With caps
    sorted ascending, f(i) = ccum_i + cap_i·(N−i) is nondecreasing, so
    the capped set is the prefix where f(i) ≤ budget — detected with one
    integer-exact cumulative window, no iteration.

    Scale: the strata table is an aggregate over the corpus (one shuffle,
    map-side partial), after which everything runs on O(sources×langs)
    rows — driver-scale metadata, so the single-partition rank window and
    the two 1-row cross joins are free. The corpus itself is touched once,
    projecting two columns."""
    strata = (
        T(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tok"))
        .localCheckpoint()  # O(sources×langs) rows — materialize once so the
        # five downstream references don't each re-scan the corpus
    )
    tot = strata.agg(
        F.sum("n_tok").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_strata"),
        F.expr(f"sum(n_tok) * {_BUDGET_NUM} div {_BUDGET_DEN}").cast("bigint").alias("budget"),
    )
    cap = (F.col("n_tok") * _EPOCH_CAP).cast("bigint")
    wr = W.orderBy(cap, "source", "lang")
    ranked = (
        strata.crossJoin(F.broadcast(tot))
        .withColumn("cap", cap)
        .withColumn("i", F.row_number().over(wr).cast("bigint"))
        .withColumn(
            "ccum",
            F.sum("cap").over(wr.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("bigint"),
        )
    )
    flagged = ranked.withColumn(
        "capped",
        F.col("ccum") + F.col("cap") * (F.col("n_strata") - F.col("i")) <= F.col("budget"),
    )
    waterline = flagged.agg(
        F.coalesce(F.sum(F.when(F.col("capped"), 1).otherwise(0)), F.lit(0)).alias("k"),
        F.coalesce(F.sum(F.when(F.col("capped"), F.col("cap")).otherwise(0)), F.lit(0)).alias("ccum_k"),
    )
    theta = (F.col("budget") - F.col("ccum_k")).cast("double") / (
        F.col("n_strata") - F.col("k")
    )
    alloc_raw = F.when(F.col("capped"), F.col("cap").cast("double")).otherwise(theta)
    return (
        flagged.crossJoin(F.broadcast(waterline))
        .select(
            "source",
            "lang",
            "n_tok",
            F.col("cap").cast("bigint").alias("cap"),
            "capped",
            F.round(alloc_raw, 6).alias("alloc_tokens"),
            F.round(alloc_raw / F.col("budget"), 6).alias("weight"),
        )
        .orderBy("source", "lang")
    )
