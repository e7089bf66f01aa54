"""Training-corpus curation operators, batch 2 (LLM-pipeline north star):
Gopher-style repetition gating, PII scrub accounting, temperature-scaled
language mixture weights, and sliding-window chunking.

All four are map-side projections over array/regex expressions plus (at
most) a tiny aggregate — zero Python UDFs, zero unnecessary shuffles, so
each scales linearly: at 100 TB the per-doc operators are embarrassingly
parallel scans and the mixture aggregate reduces to one row per language.

Cross-engine float discipline (see plans/registry.py docstring): sums of
doubles are order-dependent, so anywhere a ratio-of-sums appears the
addends are quantized to exact BIGINT micro-units first (sqrt itself is
IEEE-correctly-rounded in both engines; SUMS of its results are not
order-stable — integers are).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .helpers import T
from .registry import query

# -- Gopher-style duplicate-trigram gate ------------------------------------

_REP_THRESHOLD = 0.2


@query(
    "repetition_ngram_gate",
    oracle=f"""
WITH tri AS (
  SELECT doc_id, lang,
         CASE WHEN len(string_split(text, ' ')) >= 3 THEN
           list_transform(generate_series(1, len(string_split(text, ' ')) - 2),
                          i -> string_split(text, ' ')[i] || ' ' ||
                               string_split(text, ' ')[i + 1] || ' ' ||
                               string_split(text, ' ')[i + 2])
         ELSE [] END AS trigrams
  FROM documents
),
m AS (
  SELECT doc_id, lang,
         CAST(len(trigrams) AS BIGINT) AS n_trigrams,
         CAST(len(list_distinct(trigrams)) AS BIGINT) AS n_distinct
  FROM tri
)
SELECT doc_id, lang, n_trigrams, n_distinct,
       CASE WHEN n_trigrams = 0 THEN NULL
            ELSE round(CAST(n_trigrams - n_distinct AS DOUBLE) / n_trigrams, 6) END AS dup_frac,
       CASE WHEN n_trigrams = 0 THEN NULL
            ELSE (CAST(n_trigrams - n_distinct AS DOUBLE) / n_trigrams <= {_REP_THRESHOLD}) END AS keep
FROM m
ORDER BY doc_id
""",
    tags=("text", "quality", "dedup", "llm"),
)
def repetition_ngram_gate(spark, sf_dir):
    """Gopher-rule repetition filter (Rae et al. 2021 §A1.1: drop docs
    whose duplicate n-gram fraction is high): per-document fraction of
    duplicate word trigrams, gate at dup_frac <= 0.2. Pure array
    projection — transform over a word-index sequence builds the trigram
    list, array_distinct sizes it; no explode, no shuffle, no UDF: the
    whole operator is one codegen'd map stage."""
    docs = T(spark, sf_dir, "documents")
    # Materialize the split ONCE as a projected column: Spark does not
    # common-subexpression-eliminate inside lambda bodies, so inlining
    # split(text) in the transform re-tokenized the doc per trigram
    # (~3n splits/doc — benched 10× slower than this staged form).
    ws = docs.select("doc_id", "lang", F.split("text", " ").alias("w"))
    tris = (
        "CASE WHEN size(w) >= 3 THEN "
        "transform(sequence(1, size(w) - 2), "
        "i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))) "
        "ELSE array() END"
    )
    m = ws.select("doc_id", "lang", F.expr(tris).alias("tg")).select(
        "doc_id",
        "lang",
        F.size("tg").cast("bigint").alias("n_trigrams"),
        F.size(F.array_distinct("tg")).cast("bigint").alias("n_distinct"),
    )
    # 0/0 guard (round-3 advice): a <3-word doc has n_trigrams = 0, where
    # Spark's Divide yields NULL but DuckDB (ieee_floating_point_ops, the
    # modern default) yields NaN — an explicit CASE on BOTH sides makes the
    # short-doc result NULL everywhere instead of a latent hash mismatch.
    dup = F.when(
        F.col("n_trigrams") > 0,
        (F.col("n_trigrams") - F.col("n_distinct")).cast("double") / F.col("n_trigrams"),
    )
    return m.select(
        "doc_id",
        "lang",
        "n_trigrams",
        "n_distinct",
        F.round(dup, 6).alias("dup_frac"),
        (dup <= _REP_THRESHOLD).alias("keep"),
    ).orderBy("doc_id")


# -- PII scrub accounting ---------------------------------------------------

_EMAIL = "[a-z0-9._]+@[a-z0-9.-]+"
_PHONE = "[+]1-555-[0-9]+"


@query(
    "pii_scrub_accounting",
    oracle=f"""
WITH aug AS (
  -- deterministic PII injection: every 10th doc gains an email + phone
  -- tail (the fixture corpus is synthetic prose with no natural PII; an
  -- all-zero scrub result would prove nothing)
  SELECT doc_id, lang,
         CASE WHEN doc_id % 10 = 0
              THEN text || ' contact user' || doc_id ||
                   '@example.com or +1-555-0' || doc_id || ' now'
              ELSE text END AS text
  FROM documents
),
scrubbed AS (
  SELECT doc_id, lang, text,
         regexp_replace(regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
                        '{_PHONE}', '<PHONE>', 'g') AS clean
  FROM aug
)
SELECT doc_id, lang,
       CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE}')) AS BIGINT) AS n_phones,
       CAST(length(text) - length(clean) AS BIGINT) AS chars_redacted,
       md5(clean) AS clean_digest
FROM scrubbed
ORDER BY doc_id
""",
    tags=("text", "pii", "redaction", "llm"),
)
def pii_scrub_accounting(spark, sf_dir):
    """PII redaction accounting — the scrub-before-training primitive:
    detect email/phone patterns, replace with typed tags, report per-doc
    match counts + redacted-char delta + a digest of the scrubbed text
    (the digest makes the oracle verify the actual replacement output,
    not just the counts). The corpus carries no natural PII, so every
    10th doc is deterministically augmented with a synthetic contact
    tail inside the query — the regex machinery under test is real.
    Map-only regexp projection; linear at any scale."""
    docs = T(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        "lang",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1-555-0"),
                F.col("doc_id").cast("string"),
                F.lit(" now"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    clean = F.regexp_replace(F.regexp_replace("text", _EMAIL, "<EMAIL>"), _PHONE, "<PHONE>")
    return (
        aug.withColumn("clean", clean)
        .select(
            "doc_id",
            "lang",
            F.size(F.expr(f"regexp_extract_all(text, '{_EMAIL}', 0)")).cast("bigint").alias(
                "n_emails"
            ),
            F.size(F.expr(f"regexp_extract_all(text, '{_PHONE}', 0)"))
            .cast("bigint")
            .alias("n_phones"),
            (F.length("text") - F.length("clean")).cast("bigint").alias("chars_redacted"),
            F.md5("clean").alias("clean_digest"),
        )
        .orderBy("doc_id")
    )


# -- Temperature-scaled language mixture ------------------------------------


@query(
    "mixture_weights_temperature",
    oracle="""
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY lang
),
q AS (
  -- alpha = 0.5 temperature via sqrt (IEEE-correctly-rounded in both
  -- engines, unlike general pow); quantized to exact micro-units so the
  -- normalizing SUM is order-independent integer arithmetic
  SELECT lang, n_docs, n_chars,
         CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT) AS wq
  FROM counts
)
SELECT lang, n_docs, n_chars,
       round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS p_raw,
       round(CAST(wq AS DOUBLE) / sum(wq) OVER (), 6) AS p_temp,
       round((CAST(wq AS DOUBLE) / sum(wq) OVER ())
             / (CAST(n_docs AS DOUBLE) / sum(n_docs) OVER ()), 6) AS boost
FROM q
ORDER BY lang
""",
    tags=("sampling", "mixture", "llm"),
)
def mixture_weights_temperature(spark, sf_dir):
    """Temperature-scaled sampling mixture (the multilingual-corpus
    balancing rule of mBERT/XLM-R: p_l ∝ n_l^alpha, alpha=0.5): per
    language, raw share, temperature share, and the up/down-sampling
    boost low-resource languages receive. One tiny aggregate (rows =
    languages) then window normalization over that aggregate — at 100 TB
    the groupBy output is still ~languages rows, so the unpartitioned
    normalization window is over a handful of rows, never the corpus."""
    from pyspark.sql import Window as W

    docs = T(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    q = counts.withColumn(
        "wq",
        F.expr("CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT)"),
    )
    w = W.partitionBy()
    p_raw = F.col("n_docs").cast("double") / F.sum("n_docs").over(w)
    p_temp = F.col("wq").cast("double") / F.sum("wq").over(w)
    return q.select(
        "lang",
        "n_docs",
        "n_chars",
        F.round(p_raw, 6).alias("p_raw"),
        F.round(p_temp, 6).alias("p_temp"),
        F.round(p_temp / p_raw, 6).alias("boost"),
    ).orderBy("lang")


# -- Sliding-window chunking ------------------------------------------------

_CHUNK = 32
_STRIDE = 24


@query(
    "sliding_window_chunks",
    oracle=f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w, len(string_split(text, ' ')) AS n
  FROM documents WHERE doc_id < 100
),
chunks AS (
  SELECT doc_id, n, unnest(generate_series(0, n - 1, {_STRIDE})) AS s
  FROM ws
)
SELECT c.doc_id AS doc_id,
       CAST(c.s // {_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(LEAST({_CHUNK}, c.n - c.s) AS BIGINT) AS n_tokens,
       md5(array_to_string(list_slice(w.w, c.s + 1, LEAST(c.s + {_CHUNK}, c.n)), ' '))
         AS chunk_digest
FROM chunks c JOIN ws w ON c.doc_id = w.doc_id
ORDER BY 1, 2
""",
    tags=("text", "chunking", "llm"),
)
def sliding_window_chunks(spark, sf_dir):
    """Overlapping sliding-window chunker (window 32 words, stride 24 —
    the standard long-document pre-tokenization split, 8-word overlap
    preserving cross-boundary context): per chunk, index, token
    count, and an md5 digest of the chunk text (the digest pins the exact
    reassembled window content). transform-over-sequence + explode — the
    explode multiplies rows ~n/stride but stays a projection; no shuffle
    until the final presentation sort."""
    docs = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    ws = docs.select(
        "doc_id",
        F.split("text", " ").alias("w"),
        F.size(F.split("text", " ")).alias("n"),
    )
    chunks = ws.select(
        "doc_id",
        "n",
        "w",
        F.explode(F.expr(f"sequence(0, n - 1, {_STRIDE})")).alias("s"),
    )
    return chunks.select(
        "doc_id",
        (F.col("s") / _STRIDE).cast("bigint").alias("chunk_idx"),
        F.least(F.lit(_CHUNK), F.col("n") - F.col("s")).cast("bigint").alias("n_tokens"),
        F.md5(
            F.expr(f"concat_ws(' ', slice(w, s + 1, LEAST({_CHUNK}, n - s)))")
        ).alias("chunk_digest"),
    ).orderBy("doc_id", "chunk_idx")
