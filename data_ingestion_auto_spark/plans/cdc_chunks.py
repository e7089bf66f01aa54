"""Content-defined chunking (CDC) dedup — the storage-dedup classic
(Muthitacharoen et al., "A Low-bandwidth Network File System", SOSP
2001) applied to training-corpus text: chunk boundaries are declared
wherever a rolling window's hash satisfies ``hash % D == 0``, so the
SAME content always splits into the SAME chunks regardless of where it
sits in a document — the property fixed-size chunking lacks (one
inserted token shifts every later fixed block, but only the one CDC
chunk containing the edit changes). Identical passages shared across
documents therefore collapse to identical chunk hashes, giving an
exact, alignment-free shared-content detector that sits between
whole-document exact dedup (misses partial overlap) and the
ExactSubstr/winnowing tiers (which pay per-position work).

Determinism contract: the "rolling" hash is the house portable nibble
decode of md5 over the W-token window text (same boundary statistics as
a gear hash — uniform over [0, 2^32) — and bit-identical in both
engines); expected chunk length is D tokens. W = 4, D = 8.

Scale: one corpus scan; chunking is a per-row O(tokens·W) projection
(codegen, no UDF); the chunk frame carries only (doc_id, md5, length) —
document TEXT never shuffles. Dedup is a groupBy on the chunk hash
(map-side combinable), the per-doc ratio one hash-keyed left join. The
chunk-array frame checkpoints once BEFORE the explode (the
ckpt-before-explode rule, SCALE.md round 9) and both registered queries
read it.

Reference scope: the reference engine has no dedup tier at all; this
extends the LLM-pipeline dedup family (COVERAGE.md).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..checkpoints import ckpt
from .helpers import T
from .registry import query

_W = 4  # rolling-window length (tokens)
_D = 8  # boundary divisor -> expected chunk length (tokens)

# first 8 hex digits of md5(<string expr>) -> BIGINT in [0, 2^32);
# portable instr-based nibble decode (same idiom as plans/sketches.py,
# minus the CAST — the window text is already a string).
_HEX8S = (
    "("
    + " + ".join(
        f"CAST(instr('0123456789abcdef', substr(md5({{v}}), {i + 1}, 1)) - 1 "
        f"AS BIGINT) * {16 ** (7 - i)}"
        for i in range(8)
    )
    + ")"
)

_SQL_CHUNKS = f"""d AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
bnd AS (
  SELECT doc_id, source, w,
         CASE WHEN len(w) >= {_W} THEN
           list_filter(generate_series({_W}, len(w)),
                       i -> ({_HEX8S.format(v=f"array_to_string(w[i - {_W - 1} : i], ' ')")} % {_D}) = 0)
         ELSE [] END AS bp
  FROM d
),
spans AS (
  SELECT doc_id, source, w,
         list_transform(list_concat([0], bp), x -> x + 1) AS starts,
         list_concat(bp, [len(w)]) AS ends
  FROM bnd
),
chunks AS (
  SELECT doc_id, source,
         md5(array_to_string(w[starts[j] : ends[j]], ' ')) AS chash,
         CAST(ends[j] - starts[j] + 1 AS BIGINT) AS n_tokens
  FROM spans, LATERAL (SELECT unnest(generate_series(1, len(starts))) AS j) u
  WHERE starts[j] <= ends[j]
)"""


def _chunk_rows(spark, sf_dir):
    """(doc_id, chash, n_tokens) — one row per CDC chunk. The chunk
    array is built in ONE projection and checkpointed before the
    explode; downstream consumers never see the window lambdas."""
    win = f"concat_ws(' ', slice(w, i - {_W - 1}, {_W}))"
    bp = (
        f"CASE WHEN size(w) >= {_W} THEN "
        f"filter(sequence({_W}, size(w)), i -> ({_HEX8S.format(v=win)} % {_D}) = 0) "
        "ELSE array() END"
    )
    # the only degenerate span is a boundary landing exactly on the last
    # token (start = n+1, end = n -> zero-length slice) — filtered by
    # n_tokens >= 1, mirroring the oracle's WHERE starts[j] <= ends[j]
    chunk = (
        "filter(transform(sequence(1, size(starts)), j -> named_struct("
        "'chash', md5(concat_ws(' ', slice(w, element_at(starts, j), "
        "greatest(element_at(ends, j) - element_at(starts, j) + 1, 0)))), "
        "'n_tokens', CAST(element_at(ends, j) - element_at(starts, j) + 1 AS BIGINT))), "
        "c -> c.n_tokens >= 1)"
    )
    docs = T(spark, sf_dir, "documents")
    spans = (
        docs.select("doc_id", "source", F.split("text", " ").alias("w"))
        .select("doc_id", "source", "w", F.expr(bp).alias("bp"))
        .select(
            "doc_id",
            "source",
            "w",
            F.expr("transform(concat(array(0), bp), x -> x + 1)").alias("starts"),
            F.expr("concat(bp, array(size(w)))").alias("ends"),
        )
    )
    arr = ckpt(spans.select("doc_id", "source", F.expr(chunk).alias("chunks")))
    return arr.select("doc_id", "source", F.explode("chunks").alias("c")).select(
        "doc_id",
        "source",
        F.col("c.chash").alias("chash"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


@query(
    "cdc_chunk_dedup",
    oracle=f"""
WITH {_SQL_CHUNKS}
SELECT chash AS chunk_hash,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(max(n_tokens) AS BIGINT) AS chunk_tokens,
       min(doc_id) AS keep_doc
FROM chunks
GROUP BY chash
HAVING count(DISTINCT doc_id) >= 2
ORDER BY chunk_hash
""",
    tags=("dedup", "cdc", "chunk", "exact", "llm"),
)
def cdc_chunk_dedup(spark, sf_dir):
    """Every CDC chunk shared by >= 2 documents: its hash, document and
    occurrence counts, token length, and the keep-min canonical owner —
    the exact shared-passage inventory boilerplate removal and
    copy-tracing read from. Output ordered by chunk_hash.

    Scale: the groupBy key is the 32-char chunk hash (never text);
    counts are map-side combinable; output is bounded by the number of
    DISTINCT shared chunks, not corpus size."""
    c = _chunk_rows(spark, sf_dir)
    return (
        c.groupBy("chash")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occurrences"),
            F.max("n_tokens").cast("bigint").alias("chunk_tokens"),
            F.min("doc_id").alias("keep_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            F.col("chash").alias("chunk_hash"),
            "n_docs",
            "n_occurrences",
            "chunk_tokens",
            "keep_doc",
        )
        .orderBy("chunk_hash")
    )


@query(
    "cdc_doc_dup_ratio",
    oracle=f"""
WITH {_SQL_CHUNKS},
shared AS (
  SELECT chash FROM chunks GROUP BY chash HAVING count(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT c.doc_id,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(CASE WHEN s.chash IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
  FROM chunks c LEFT JOIN shared s ON c.chash = s.chash
  GROUP BY c.doc_id
)
SELECT doc_id, n_chunks, n_dup_chunks,
       CAST(n_dup_chunks AS DOUBLE) / n_chunks AS dup_ratio
FROM per_doc
ORDER BY doc_id
""",
    tags=("dedup", "cdc", "chunk", "quality", "llm"),
)
def cdc_doc_dup_ratio(spark, sf_dir):
    """Per document: how much of it is content that also lives elsewhere
    — n_chunks, n_dup_chunks (chunks whose hash appears in >= 2 docs),
    and the duplication ratio (one exact IEEE division). The document-
    level curation signal CDC buys: score a doc by shared-content mass
    without aligning it against anything.

    Scale: same chunk frame (checkpointed once, both queries read it);
    the shared set is hash-keyed and joined back hash-to-hash — text
    never shuffles, and the join side sizes are dup-density-bound, so
    no broadcast hint (AQE decides)."""
    c = _chunk_rows(spark, sf_dir)
    shared = (
        c.groupBy("chash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select(F.col("chash").alias("s_chash"))
    )
    return (
        c.join(shared, c.chash == shared.s_chash, "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum(
                F.when(F.col("s_chash").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            (F.col("n_dup_chunks").cast("double") / F.col("n_chunks")).alias(
                "dup_ratio"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "source_overlap_matrix",
    oracle=f"""
WITH {_SQL_CHUNKS},
sc AS (SELECT DISTINCT source, chash FROM chunks),
tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_chunks FROM sc GROUP BY source),
pair AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_shared_chunks
  FROM sc a JOIN sc b ON a.chash = b.chash AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b, p.n_shared_chunks,
       ta.n_chunks AS n_chunks_a, tb.n_chunks AS n_chunks_b,
       CAST(p.n_shared_chunks AS DOUBLE) / least(ta.n_chunks, tb.n_chunks)
         AS containment
FROM pair p
JOIN tot ta ON p.source_a = ta.source
JOIN tot tb ON p.source_b = tb.source
ORDER BY source_a, source_b
""",
    tags=("dedup", "cdc", "chunk", "provenance", "observability", "llm"),
)
def source_overlap_matrix(spark, sf_dir):
    """Which sources copy from each other: per unordered source pair,
    the number of DISTINCT CDC chunk hashes present in both, each side's
    distinct-chunk total, and the containment ratio
    shared / min(|A|, |B|) (one exact IEEE division) — the provenance
    cross-contamination matrix a mixture designer reads before weighting
    sources (double-counted content inflates a source's apparent mass).

    Scale: the distinct (source, chash) frame is chunk-hash-sized; the
    pair join is chash-keyed, and its fan-out per chunk is bounded by
    the number of SOURCES sharing it (sources², not docs²). Output is
    at most sources·(sources−1)/2 rows — constant-sized observability at
    any corpus, like lsh_bucket_stats and prefix_bucket_stats."""
    c = _chunk_rows(spark, sf_dir)
    sc = c.select("source", "chash").distinct()
    tot = sc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_chunks")
    )
    a = sc.select(F.col("source").alias("source_a"), "chash")
    b = sc.select(F.col("source").alias("source_b"), "chash")
    pair = (
        a.join(b, "chash")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_shared_chunks"))
    )
    ta = tot.select(F.col("source").alias("source_a"), F.col("n_chunks").alias("n_chunks_a"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("n_chunks").alias("n_chunks_b"))
    return (
        pair.join(ta, "source_a")
        .join(tb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared_chunks",
            "n_chunks_a",
            "n_chunks_b",
            (
                F.col("n_shared_chunks").cast("double")
                / F.least("n_chunks_a", "n_chunks_b")
            ).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )
