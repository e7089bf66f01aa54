"""Exact duplicated-substring detection over the document corpus — the
ExactSubstr operator of Lee et al. 2022 ("Deduplicating Training Data
Makes Language Models Better"), re-expressed Spark-first.

The paper builds a suffix array to find every ≥50-token substring that
appears twice anywhere in the corpus. A suffix array is a single-machine
construction; the distributed equivalent for a FIXED span width W is:

1. slide a width-W stride-1 token window over every document and
   fingerprint each span (md5 of the joined tokens) — a linear explode,
   embarrassingly parallel, no driver state;
2. hash-aggregate span fingerprints over the corpus; any fingerprint with
   count > 1 is a duplicated substring (exact, not probabilistic, modulo
   md5 collisions);
3. join the duplicated fingerprints back and merge each document's
   overlapping duplicate spans into maximal intervals (gaps-and-islands
   with a running-max window PER DOCUMENT) to report how many tokens of
   each document are covered by corpus-duplicated text — the number the
   paper's ExactSubstr-cut step removes.

Scale: the explode produces ~one row per token (× a 16-byte digest) — the
same order of work as tokenization itself; the count-by-fingerprint
aggregates map-side before one hash exchange; the island merge windows
are per-document (bounded partitions, no global sort). The O(W) concat
per position could drop to O(1) with a Karp-Rabin rolling hash inside
mapInPandas (the doc_fingerprints query already demonstrates that
kernel); it stays JVM-side here because whole-stage codegen on
slice+concat beats a Python round-trip at W=20.

Reference anchor: the reference's dedup story is file-level state skips
(ingest/__init__.py:118-135); substring-level dedup is part of the
training-data tier this engine adds on top (SURVEY §2 LLM-ops).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .helpers import T
from .registry import query

_W = 20  # span width in tokens; the paper uses 50 BPE tokens at corpus scale


@query(
    "exact_substring_dedup_spans",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
spans AS (
  SELECT doc_id,
         unnest(generate_series(0, len(w) - {_W})) AS i
  FROM toks WHERE len(w) >= {_W}
),
hashed AS (
  SELECT s.doc_id, s.i,
         md5(array_to_string(t.w[s.i + 1 : s.i + {_W}], ' ')) AS h
  FROM spans s JOIN toks t ON s.doc_id = t.doc_id
),
dup AS (
  SELECT h FROM hashed GROUP BY h HAVING count(*) > 1
),
marked AS (
  SELECT hashed.doc_id, hashed.i, hashed.i + {_W} - 1 AS j
  FROM hashed JOIN dup ON hashed.h = dup.h
),
islands AS (
  SELECT doc_id, i, j,
         CASE WHEN i > coalesce(max(j) OVER (
                PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS is_start
  FROM marked
),
grouped AS (
  SELECT doc_id, i, j,
         sum(is_start) OVER (PARTITION BY doc_id ORDER BY i
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM islands
),
isl AS (
  SELECT doc_id, island, max(j) - min(i) + 1 AS span_tokens
  FROM grouped GROUP BY doc_id, island
),
cov AS (
  SELECT doc_id, count(*) AS n_dup_islands, sum(span_tokens) AS n_dup_tokens
  FROM isl GROUP BY doc_id
),
nsp AS (SELECT doc_id, count(*) AS n_dup_spans FROM marked GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.w) AS BIGINT) AS n_tokens,
       CAST(coalesce(nsp.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(coalesce(cov.n_dup_islands, 0) AS BIGINT) AS n_dup_islands,
       CAST(coalesce(cov.n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens
FROM toks t
LEFT JOIN nsp ON t.doc_id = nsp.doc_id
LEFT JOIN cov ON t.doc_id = cov.doc_id
ORDER BY t.doc_id
""",
    tags=("llm-dedup", "exact-substring", "lee-2022"),
)
def exact_substring_dedup_spans(spark, sf_dir):
    """Per-document accounting of corpus-duplicated W-token substrings:
    n_dup_spans (stride-1 spans whose fingerprint repeats anywhere in the
    corpus), n_dup_islands (those spans merged into maximal intervals),
    and n_dup_tokens (tokens covered by duplicated text — what
    ExactSubstr-cut would remove). Exact by construction; the hash
    aggregation and island merge are the scale path (see module
    docstring)."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    hashed = (
        docs.filter(F.size("w") >= _W)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.size("w") - _W)).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            "i",
            F.md5(F.concat_ws(" ", F.slice("w", F.col("i") + 1, _W))).alias("h"),
        )
    )
    dup = hashed.groupBy("h").count().filter(F.col("count") > 1).select("h")
    marked = hashed.join(dup, "h").select(
        "doc_id", "i", (F.col("i") + _W - 1).alias("j")
    )
    prev = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = marked.withColumn(
        "is_start",
        F.when(F.col("i") > F.coalesce(F.max("j").over(prev), F.lit(-1)), 1).otherwise(0),
    ).withColumn("island", F.sum("is_start").over(run))
    islands = (
        grouped.groupBy("doc_id", "island")
        .agg((F.max("j") - F.min("i") + 1).alias("span_tokens"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_dup_islands"),
            F.sum("span_tokens").alias("n_dup_tokens"),
        )
    )
    n_spans = marked.groupBy("doc_id").agg(F.count("*").alias("n_dup_spans"))
    return (
        docs.select("doc_id", F.size("w").cast("bigint").alias("n_tokens"))
        .join(n_spans, "doc_id", "left")
        .join(islands, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).cast("bigint").alias("n_dup_spans"),
            F.coalesce("n_dup_islands", F.lit(0)).cast("bigint").alias("n_dup_islands"),
            F.coalesce("n_dup_tokens", F.lit(0)).cast("bigint").alias("n_dup_tokens"),
        )
        .orderBy("doc_id")
    )
