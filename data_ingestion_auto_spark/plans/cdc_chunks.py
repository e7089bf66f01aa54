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

from pyspark.sql import Window as W
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
    """(doc_id, source, chash, n_tokens) — one row per CDC chunk; the
    Spark-side chunker lives in operators/cdc_index.py::cdc_chunk_rows
    (shared with the stored chunk-index lifecycle).

    MEMOIZED per corpus version (plans/dedup.py::_corpus_memo — same
    fingerprint/atomic-publish rules as the sig/pair/CC tables): FOUR
    registered queries consume the identical deterministic chunking of
    the identical corpus (~5 s apiece at sf0.1 recomputed); a 100 TB
    pipeline chunks at ingest and stores the chunk table once — the
    stored chunk-index lifecycle in operators/cdc_index.py is exactly
    that contract, this memo is its query-tier analogue."""
    from ..operators.cdc_index import cdc_chunk_rows
    from .dedup import _corpus_memo

    return _corpus_memo(
        spark,
        sf_dir,
        "cdc_chunks",
        lambda: cdc_chunk_rows(T(spark, sf_dir, "documents")),
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
    # shared-ness as a chash-partitioned WINDOW flag (optimization r14,
    # guide §2.4): a hash lives in >= 2 docs iff min(doc) != max(doc)
    # over its partition — no countDistinct Expand, no groupBy +
    # join-back that re-planned the chunk cut under both branches
    # (4 exchanges -> 2: one on chash, one on doc_id).
    wc = W.partitionBy("chash")
    flagged = c.select(
        "doc_id",
        (F.min("doc_id").over(wc) != F.max("doc_id").over(wc)).alias("is_shared"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum(
                F.when(F.col("is_shared"), 1).otherwise(0)
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
    # per chunk hash: the sorted set of sources containing it — bounded
    # by the source domain, so the pair expansion is an in-row
    # transform, not a chash-keyed SELF-join that re-planned the
    # distinct cut under both branches (optimization r14, guide §2.4;
    # 8 exchanges -> 4). The per-chash frame is chunk-hash-sized and
    # read twice (pairs + totals), hence the cut; totals re-derive from
    # it by exploding the ≤|sources| arrays, never from a corpus
    # re-scan.
    per_chash = ckpt(
        sc.groupBy("chash").agg(
            F.expr("array_sort(collect_list(source))").alias("srcs")
        )
    )
    pair = (
        per_chash.select(
            F.explode(
                F.expr(
                    "flatten(transform(srcs, (sa, i) -> "
                    "transform(slice(srcs, i + 2, size(srcs)), sb -> "
                    "named_struct('source_a', sa, 'source_b', sb))))"
                )
            ).alias("p")
        )
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_shared_chunks"))
    )
    tot = (
        per_chash.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_chunks"))
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


_NEW_NIB = "('0', '1', '2', '3')"  # the house ~25% md5 batch split
_CHUNK_CAP = 100


@query(
    "incremental_cdc_assign",
    oracle=f"""
WITH {_SQL_CHUNKS},
cdist AS (SELECT DISTINCT doc_id, chash, n_tokens FROM chunks),
capped AS (
  SELECT doc_id, chash,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN {_NEW_NIB} AS is_new
  FROM (
    SELECT doc_id, chash,
           row_number() OVER (PARTITION BY chash ORDER BY doc_id) AS rn
    FROM cdist
  ) WHERE rn <= {_CHUNK_CAP}
),
nc AS (
  SELECT doc_id, chash, n_tokens FROM cdist
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN {_NEW_NIB}
),
own AS (
  SELECT n.doc_id AS doc_id, n.chash, n.n_tokens, min(o.doc_id) AS owner
  FROM nc n LEFT JOIN capped o
    ON n.chash = o.chash AND (NOT o.is_new OR o.doc_id < n.doc_id)
  GROUP BY 1, 2, 3
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN owner IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       CAST(sum(CASE WHEN owner IS NOT NULL THEN n_tokens ELSE 0 END) AS BIGINT) AS shared_tokens,
       CAST((1000000 * sum(CASE WHEN owner IS NOT NULL THEN n_tokens ELSE 0 END))
            // sum(n_tokens) AS BIGINT) AS dup_ratio_ppm,
       CAST(coalesce(min(owner), doc_id) AS BIGINT) AS dup_of,
       (min(owner) IS NOT NULL) AS is_dup
FROM own
GROUP BY doc_id
ORDER BY doc_id
""",
    tags=("dedup", "cdc", "incremental", "llm"),
)
def incremental_cdc_assign(spark, sf_dir):
    """Ingest-time SUB-DOCUMENT dedup of a new batch against the stored
    CDC chunk index (the chunk-granularity sibling of
    `incremental_lsh_dedup_assign` / `incremental_ann_assign` — third
    tier of the incremental-index family): per arriving document, how
    many of its content-defined chunks — and how much token mass — is
    already owned by the corpus (or an earlier member of the same
    batch), plus the canonical owner (min id over shared chunks, self
    when new-unique). Catches a new document QUOTING a stored passage,
    which whole-document LSH under-weights and embedding ANN can miss
    entirely.

    Replay mapping: the corpus (~75% md5 split) stands in for the
    stored bucketed index (operators/cdc_index.py::write_chunk_index —
    the REAL lifecycle is pytest-pinned in tests/test_cdc_index.py);
    the per-chash cap (100, rank by doc_id) replays write-time
    admission. One corpus chunking pass (ckpt-before-explode),
    chash-keyed equi-joins only; owner fan-out bounded by the cap."""
    chunks = _chunk_rows(spark, sf_dir)
    cdist = ckpt(chunks.select("doc_id", "chash", "n_tokens").distinct())
    is_new = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
        "0", "1", "2", "3"
    )
    w = F.row_number().over(W.partitionBy("chash").orderBy("doc_id"))
    capped = (
        cdist.withColumn("rn", w)
        .filter(F.col("rn") <= _CHUNK_CAP)
        .select(
            F.col("doc_id").alias("o_id"),
            "chash",
            is_new.alias("o_is_new"),
        )
    )
    nc = cdist.filter(is_new).select(
        F.col("doc_id").alias("n_id"), "chash", "n_tokens"
    )
    own = (
        nc.join(
            capped,
            (nc.chash == capped.chash)
            & ((~capped.o_is_new) | (capped.o_id < nc.n_id)),
            "left",
        )
        .groupBy("n_id", nc.chash, "n_tokens")
        .agg(F.min("o_id").alias("owner"))
    )
    return (
        own.groupBy("n_id")
        .agg(
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("owner").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
            F.sum(F.when(F.col("owner").isNotNull(), F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("shared_tokens"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("owner").alias("min_owner"),
        )
        .select(
            F.col("n_id").alias("doc_id"),
            "n_chunks",
            "n_shared",
            "shared_tokens",
            F.expr(
                "CAST((1000000 * shared_tokens) div total_tokens AS BIGINT)"
            ).alias("dup_ratio_ppm"),
            F.coalesce("min_owner", "n_id").cast("bigint").alias("dup_of"),
            F.col("min_owner").isNotNull().alias("is_dup"),
        )
        .orderBy("doc_id")
    )
