"""Corpus-level boilerplate detection by n-gram document frequency —
the C4/CCNet-family signal the WITHIN-document repetition gates
(`repetition_ngram_gate`, `top_ngram_char_fraction` — Gopher rules)
cannot see: a navigation header repeated across thousands of pages is
unremarkable inside any one document but has an enormous document
frequency. The blacklist is every word-3-gram appearing in >= 0.5% of
documents (and >= 2 absolute — the tiny-corpus guard); each document
then reports how much of its n-gram mass the blacklist covers.

Scale: the gram frame is one corpus scan (grams md5-hashed BEFORE any
shuffle — text never moves), checkpointed and read twice (the df
aggregate and the per-doc join). The blacklist itself is
corpus-size-INDEPENDENT: at threshold f, at most
(avg grams per doc) / f distinct grams can qualify (sum of df over
qualifying grams <= total gram instances), so it broadcasts at ANY
corpus size — the per-doc membership join is map-side. Output is one
row per document, the curation-signal contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..checkpoints import ckpt
from .helpers import T, spread
from .registry import query

# NB: Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty like
# DuckDB's generate_series — docs under 3 words need the explicit guard
_GRAM_SQL_SPARK = (
    "CASE WHEN size(split(text, ' ')) < 3 THEN CAST(array() AS array<string>) "
    "ELSE transform(sequence(1, size(split(text, ' ')) - 2),"
    " i -> md5(array_join(slice(split(text, ' '), i, 3), ' '))) END"
)


@query(
    "boilerplate_ngram_mass",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT doc_id, md5(array_to_string(w[i : i + 2], ' ')) AS gh
  FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i) s
),
ndocs AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
df AS (SELECT gh, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM g GROUP BY gh),
bl AS (SELECT gh FROM df, ndocs WHERE df * 1000 >= n * 5 AND df >= 2),
per AS (
  SELECT g.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN bl.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
  FROM g LEFT JOIN bl ON g.gh = bl.gh
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(per.n_boiler, 0) AS BIGINT) AS n_boiler,
       CAST(CASE WHEN coalesce(per.n_grams, 0) = 0 THEN 0
            ELSE (1000000 * per.n_boiler) // per.n_grams END AS BIGINT) AS boiler_ppm
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
""",
    tags=("text", "boilerplate", "ngram", "curation", "llm"),
)
def boilerplate_ngram_mass(spark, sf_dir):
    """Per document: total word-3-grams, how many sit in the corpus
    document-frequency blacklist (df >= 0.5% of docs, >= 2 absolute),
    and the boilerplate mass in exact integer ppm. High-boiler_ppm
    documents are template/navigation shells a curation pass
    down-weights even when every Gopher within-doc gate passes.

    Scale: see module docstring — one checkpointed gram scan read
    twice; the blacklist is bounded by (grams/doc)/0.005 entries
    independent of corpus size, hence explicitly broadcast; docs with
    fewer than 3 words report 0/0/0 via the left join."""
    docs = spread(T(spark, sf_dir, "documents"))
    g = docs.select("doc_id", F.explode(F.expr(_GRAM_SQL_SPARK)).alias("gh"))
    # ONE exchange feeds everything (optimization r13, the _doc_ppm
    # pattern): the per-(doc, gram) count frame is the checkpointed cut;
    # document frequency is its per-gram row count (no countDistinct
    # Expand over the instance rows), and the per-doc mass re-derives
    # via c / c·is_b sums — same values, smaller materialized state.
    dgc = ckpt(g.groupBy("doc_id", "gh").agg(F.count("*").alias("c")))
    ndocs = docs.groupBy().agg(F.count("*").cast("bigint").alias("n"))
    df = dgc.groupBy("gh").agg(F.count("*").cast("bigint").alias("df"))
    bl = (
        df.crossJoin(F.broadcast(ndocs))
        .filter((F.col("df") * 1000 >= F.col("n") * 5) & (F.col("df") >= 2))
        .select("gh", F.lit(1).alias("is_b"))
    )
    per = (
        dgc.join(F.broadcast(bl), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            F.sum(F.col("c") * F.coalesce("is_b", F.lit(0)))
            .cast("bigint")
            .alias("n_boiler"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_boiler", F.lit(0)).cast("bigint").alias("n_boiler"),
            F.when(F.coalesce("n_grams", F.lit(0)) == 0, F.lit(0))
            .otherwise(F.expr("(1000000 * n_boiler) div n_grams"))
            .cast("bigint")
            .alias("boiler_ppm"),
        )
        .orderBy("doc_id")
    )


@query(
    "vocab_growth_profile",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
),
cnt AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST((1000000 * count(*)) // sum(c) AS BIGINT) AS ttr_ppm,
       CAST((1000000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS hapax_ppm
FROM cnt
GROUP BY source
ORDER BY source
""",
    tags=("text", "vocabulary", "observability", "llm"),
)
def vocab_growth_profile(spark, sf_dir):
    """Per-source vocabulary profile: token mass, type count, hapax
    legomena (words seen exactly once), type-token ratio and
    hapax-per-type in exact integer ppm — the Heaps'-law face of the
    corpus a mixture designer reads beside `token_gini_concentration`
    (concentration) and `unigram_tvd_matrix` (pairwise drift): a source
    whose TTR collapses between crawls started emitting templates; one
    whose hapax ratio explodes started emitting noise/mojibake.

    Scale: the same single-scan (source, token) count shape as the TVD
    matrix — vocab x sources rows after one corpus scan with map-side
    partial aggregation; everything downstream is count arithmetic on
    that tiny frame. Output one row per source at any corpus."""
    tok = spread(T(spark, sf_dir, "documents")).select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    cnt = tok.groupBy("source", "token").agg(
        F.count("*").cast("bigint").alias("c")
    )
    return (
        cnt.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.expr("CAST((1000000 * n_types) div n_tokens AS BIGINT)").alias(
                "ttr_ppm"
            ),
            F.expr("CAST((1000000 * n_hapax) div n_types AS BIGINT)").alias(
                "hapax_ppm"
            ),
        )
        .orderBy("source")
    )


@query(
    "good_turing_freq_of_freqs",
    oracle="""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS r FROM tok GROUP BY token),
ff AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM cnt GROUP BY r),
tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens FROM ff)
SELECT f.r, f.n_r,
       CAST(coalesce((SELECT (f.r + 1) * g.n_r FROM ff g WHERE g.r = f.r + 1), 0) AS BIGINT)
         AS gt_adjusted_num,
       CAST((1000000 * coalesce((SELECT n_r FROM ff WHERE r = 1), 0)) // t.n_tokens AS BIGINT)
         AS unseen_mass_ppm
FROM ff f CROSS JOIN tot t
ORDER BY f.r
""",
    tags=("text", "language-model", "smoothing", "llm"),
)
def good_turing_freq_of_freqs(spark, sf_dir):
    """Good–Turing frequency-of-frequencies (Good 1953): N_r = how many
    vocabulary types occur exactly r times, the Good–Turing adjusted
    count NUMERATOR (r+1)·N_{r+1} per row (the estimator r* =
    (r+1)·N_{r+1}/N_r divides these two exact integers — readers do
    the one division), and the unseen-probability mass N_1/N in
    integer ppm riding on every row — the table any smoothed LM,
    coverage estimator, or "how much vocabulary is left to crawl"
    analysis starts from (the same N_1/N that drives species-richness
    estimators like Chao1).

    Scale: token counts (vocab-bounded) fold into counts-of-counts
    (bounded by the max frequency's distinct values — tens of rows at
    any corpus); the r+1 lookup is a self-join of that tiny frame.
    Output ≤ distinct frequencies rows."""
    tok = spread(T(spark, sf_dir, "documents")).select(
        F.explode(F.split("text", " ")).alias("token")
    )
    cnt = tok.groupBy("token").agg(F.count("*").cast("bigint").alias("r"))
    ff = ckpt(cnt.groupBy("r").agg(F.count("*").cast("bigint").alias("n_r")))
    tot = ff.agg(F.sum(F.col("r") * F.col("n_r")).cast("bigint").alias("n_tokens"))
    nxt = ff.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_next"))
    n1 = ff.filter(F.col("r") == 1).agg(
        F.coalesce(F.sum("n_r"), F.lit(0)).cast("bigint").alias("n_one")
    )
    return (
        ff.join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
        .select(
            "r",
            "n_r",
            ((F.col("r") + 1) * F.coalesce("n_next", F.lit(0)))
            .cast("bigint")
            .alias("gt_adjusted_num"),
            F.expr("CAST((1000000 * n_one) div n_tokens AS BIGINT)").alias(
                "unseen_mass_ppm"
            ),
        )
        .orderBy("r")
    )
