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

from .helpers import T, spread
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
    docs = spread(T(spark, sf_dir, "documents")).select(
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
    # duplicated spans via ONE count window over the fingerprint
    # partitioning (optimization r13): the old groupBy+self-join form
    # shuffled the span-hash frame twice and re-evaluated the corpus
    # explode+md5 subtree for both branches; the window keeps exactly
    # the rows whose fingerprint repeats (identical multiset) in one
    # exchange. The marked frame is the checkpointed cut both the
    # island fold and the span count read (it was re-derived per
    # consumer before).
    from ..checkpoints import ckpt

    wh = Window.partitionBy("h")
    marked = ckpt(
        hashed.withColumn("nh", F.count("*").over(wh))
        .filter(F.col("nh") > 1)
        .select("doc_id", "i", (F.col("i") + _W - 1).alias("j"))
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


@query(
    "exact_substring_cut",
    oracle=f"""
WITH toks0 AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
spans AS (
  SELECT doc_id, unnest(generate_series(0, len(w) - {_W})) AS i
  FROM toks0 WHERE len(w) >= {_W}
),
hashed AS (
  SELECT s.doc_id, s.i,
         md5(array_to_string(t.w[s.i + 1 : s.i + {_W}], ' ')) AS h
  FROM spans s JOIN toks0 t ON s.doc_id = t.doc_id
),
ranked AS (
  SELECT doc_id, i,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn
  FROM hashed
),
marked AS (
  SELECT doc_id, i, i + {_W} - 1 AS j FROM ranked WHERE rn > 1
),
isl0 AS (
  SELECT doc_id, i, j,
         CASE WHEN i > coalesce(max(j) OVER (
                PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS is_start
  FROM marked
),
isl1 AS (
  SELECT doc_id, i, j,
         sum(is_start) OVER (PARTITION BY doc_id ORDER BY i
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM isl0
),
isl AS (
  SELECT doc_id, min(i) AS s, max(j) AS e FROM isl1 GROUP BY doc_id, island
),
tok AS (
  SELECT doc_id, g.i - 1 AS p, w[g.i] AS tk
  FROM toks0, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) g
),
kept AS (
  SELECT t.doc_id, t.p, t.tk FROM tok t
  WHERE NOT EXISTS (SELECT 1 FROM isl
                    WHERE isl.doc_id = t.doc_id AND t.p BETWEEN isl.s AND isl.e)
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(tk, ' ' ORDER BY p) AS text_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.w) AS BIGINT) AS n_tokens,
       coalesce(a.n_kept, 0) AS n_kept,
       CAST(len(t.w) AS BIGINT) - coalesce(a.n_kept, 0) AS n_cut,
       coalesce(a.text_kept, '') AS text_kept
FROM toks0 t LEFT JOIN agg a ON t.doc_id = a.doc_id
ORDER BY t.doc_id
""",
    tags=("llm-dedup", "exact-substring", "cut", "lee-2022"),
)
def exact_substring_cut(spark, sf_dir):
    """ExactSubstr-CUT — the paper's actual output, not just the
    accounting: every corpus-duplicated W-token span is removed from
    every document EXCEPT its canonical occurrence (the group's
    smallest (doc_id, i) — rank 1 in a per-fingerprint window, so
    occurrences with rank ≥ 2 are by construction members of a
    duplicated group, no separate count filter). Non-canonical spans
    merge into maximal per-document islands; covered tokens are cut
    via a LEFT ANTI range join of the token explode against the
    (bounded, per-doc) island list; the surviving text reassembles in
    token order. Every duplicated W-gram therefore survives AT MOST
    once in the output corpus (a canonical occurrence can itself be
    cut when it overlaps a different fingerprint's non-canonical
    island in the same document) — the deduplicated training set a
    pipeline ships.

    At 100 TB: the only additions over `exact_substring_dedup_spans`
    are the per-fingerprint rank window (same exchange as the dup
    hash-agg) and the token∕island anti join, which is per-document
    (islands per doc are few and bounded by doc length). Text moves
    once into the reassembly groupBy — the same per-doc shuffle any
    rewrite pays."""
    docs = spread(T(spark, sf_dir, "documents")).select(
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
    wh = Window.partitionBy("h").orderBy("doc_id", "i")
    marked = (
        hashed.withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") > 1)
        .select("doc_id", "i", (F.col("i") + _W - 1).alias("j"))
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
    isl = grouped.groupBy("doc_id", "island").agg(
        F.min("i").alias("s"), F.max("j").alias("e")
    )
    # Token/island subtraction as an INDEXED ARRAY FILTER, not a
    # token-level anti join (optimization r13, guide §2.3/§2.4): the old
    # posexplode → range anti-join → collect_list chain shuffled every
    # TOKEN row by doc_id twice and joined back to docs; islands are few
    # and bounded per doc, so collapsing them to a per-doc span array
    # (island-level rows only) lets each doc row drop its covered
    # tokens in place — token text never leaves its row, and the
    # position order is preserved by filter() for free. A doc absent
    # from the island list keeps all tokens (null spans coalesces to
    # the empty array); a fully-covered doc yields the empty kept
    # array — concat_ws '' and n_kept 0, exactly the old left-join
    # coalesce. 1.91 → 0.97 s best; oracle hash unchanged.
    isl_arr = isl.groupBy("doc_id").agg(
        F.collect_list(F.struct("s", "e")).alias("spans")
    )
    covered = (
        "CASE WHEN spans IS NULL THEN w ELSE "
        "filter(w, (tk, p) -> "
        "NOT exists(spans, sp -> p >= sp.s AND p <= sp.e)) END"
    )
    return (
        docs.join(isl_arr, "doc_id", "left")
        .withColumn("kept", F.expr(covered))
        .select(
            "doc_id",
            F.size("w").cast("bigint").alias("n_tokens"),
            F.size("kept").cast("bigint").alias("n_kept"),
            (F.size("w") - F.size("kept")).cast("bigint").alias("n_cut"),
            F.concat_ws(" ", "kept").alias("text_kept"),
        )
        .orderBy("doc_id")
    )
