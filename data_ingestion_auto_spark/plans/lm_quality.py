"""Corpus-trained bigram language-model quality scoring — the CCNet-style
"perplexity filter" of a training-data pipeline (CCNet/RefinedWeb filter
documents whose LM score marks them as far from the reference
distribution), re-expressed Spark-first with EXACT integer arithmetic.

A KenLM reference model is an external binary (env-blocked, like cdo);
the in-engine equivalent trains the model ON the corpus itself in one
aggregation pass: c(w1,w2) bigram counts and c(w1·) head counts over all
documents, then scores every document by its average conditional bigram
probability. Probabilities are kept in parts-per-million via integer
division — ``(c2 * 1000000) div c1`` — so Spark and DuckDB agree
bit-for-bit (the module deliberately avoids log()/double accumulation:
libm log differs across engines in the last ulp, and float summation is
order-dependent; see plans/helpers.py for the house determinism rules).

Scale: tokenization and bigram extraction are linear explodes; the model
is two hash aggregations with map-side partial combine (bigram keys, then
head keys); scoring joins each document's bigrams back to the model on
those same keys — linear shuffles keyed on vocabulary, never on document
pairs. The model lives IN the shuffle (no driver-side vocab collection),
so a 100× corpus means 100× counts through the same plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .helpers import T, spread
from .registry import query


# The per-doc LM-score CTE chain, shared by the per-doc query's oracle
# and the CCNet bucket oracle below.
_SQL_DOC_PPM = """toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
bigrams AS (
  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
  FROM toks, unnest(generate_series(1, len(w) - 1)) AS s(i)
  WHERE len(w) >= 2
),
c2 AS (SELECT w1, w2, count(*) AS n2 FROM bigrams GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS n1 FROM bigrams GROUP BY w1),
scored AS (
  SELECT b.doc_id,
         (m2.n2 * 1000000) // m1.n1 AS ppm,
         CASE WHEN m2.n2 = 1 THEN 1 ELSE 0 END AS hapax
  FROM bigrams b
  JOIN c2 m2 ON b.w1 = m2.w1 AND b.w2 = m2.w2
  JOIN c1 m1 ON b.w1 = m1.w1
),
doc_ppm AS (
  SELECT t.doc_id,
         CAST(greatest(len(t.w) - 1, 0) AS BIGINT) AS n_bigrams,
         CAST(CASE WHEN count(s.ppm) = 0 THEN 0
                   ELSE sum(s.ppm) // count(s.ppm) END AS BIGINT) AS avg_cond_ppm,
         CAST(coalesce(sum(s.hapax), 0) AS BIGINT) AS n_hapax_bigrams
  FROM toks t LEFT JOIN scored s ON t.doc_id = s.doc_id
  GROUP BY t.doc_id, len(t.w)
)"""


@query(
    "bigram_lm_quality_ppm",
    oracle=f"""
WITH {_SQL_DOC_PPM}
SELECT doc_id, n_bigrams, avg_cond_ppm, n_hapax_bigrams
FROM doc_ppm
ORDER BY doc_id
""",
    tags=("llm-quality", "lm-scoring", "ccnet"),
)
def bigram_lm_quality_ppm(spark, sf_dir):
    """Per-document average conditional bigram probability (ppm, integer
    arithmetic) under the corpus's own bigram model, plus the count of
    hapax bigrams (corpus count 1 — the strongest rarity signal). Low
    avg_cond_ppm / high hapax share marks text far from the corpus
    distribution: the documents a CCNet-style perplexity gate would cut
    or down-weight."""
    return _doc_ppm(spark, sf_dir).orderBy("doc_id")


def _doc_ppm(spark, sf_dir):
    """The per-document (doc_id, n_bigrams, avg_cond_ppm,
    n_hapax_bigrams) frame both LM-quality queries share (the oracle's
    doc_ppm CTE), UNordered — `bigram_lm_quality_ppm` adds its
    presentation sort; `ccnet_quality_buckets` joins it directly without
    paying that range exchange.

    Optimization r13 (guide §2.3/§2.4): ONE bigram explode and ONE
    exchange feed the whole model. The per-(doc, bigram) count frame is
    checkpointed and every distribution derives from it — the old form
    re-ran the corpus bigram explode for c2, c1 AND the scoring join
    (three subtrees) and equi-joined corpus-sized instance rows twice.
    Exact equivalences: n1 = Σ_w2 n2; per-doc Σ over instances of
    ppm/hapax = Σ over distinct doc-bigrams of c·ppm / c·hapax."""
    docs = spread(T(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("w")
    )
    bigrams = (
        docs.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("w") - 1)).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            F.element_at("w", F.col("i")).alias("w1"),
            F.element_at("w", F.col("i") + 1).alias("w2"),
        )
    )
    from ..checkpoints import ckpt

    doc_bg = ckpt(bigrams.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("c")))
    c2 = doc_bg.groupBy("w1", "w2").agg(F.sum("c").alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    # vocab-sized model; NOT broadcast-hinted — a web-scale bigram vocab
    # is GBs (the tokenizer rule), AQE decides while it fits
    model = c2.join(c1, "w1")
    scored = doc_bg.join(model, ["w1", "w2"]).select(
        "doc_id",
        (F.col("c") * F.expr("(n2 * 1000000) div n1")).alias("ppm_sum"),
        F.col("c").alias("n_inst"),
        (F.col("c") * F.when(F.col("n2") == 1, 1).otherwise(0)).alias("hapax"),
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("ppm_sum").alias("ppm_sum"),
        F.sum("n_inst").alias("n_inst"),
        F.sum("hapax").alias("hapax"),
    )
    return (
        docs.select("doc_id", F.greatest(F.size("w") - 1, F.lit(0)).alias("nb"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("nb").cast("bigint").alias("n_bigrams"),
            F.expr(
                "CASE WHEN coalesce(n_inst, 0) = 0 THEN 0"
                " ELSE ppm_sum div n_inst END"
            )
            .cast("bigint")
            .alias("avg_cond_ppm"),
            F.coalesce(F.col("hapax"), F.lit(0)).cast("bigint").alias("n_hapax_bigrams"),
        )
    )


@query(
    "ccnet_quality_buckets",
    oracle=f"""
WITH {_SQL_DOC_PPM},
meta AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
ranked AS (
  SELECT m.lang, m.n_tokens, d.avg_cond_ppm,
         ntile(3) OVER (PARTITION BY m.lang
                        ORDER BY d.avg_cond_ppm DESC, d.doc_id) AS nt
  FROM doc_ppm d JOIN meta m ON d.doc_id = m.doc_id
)
SELECT lang,
       CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(min(avg_cond_ppm) AS BIGINT) AS min_ppm,
       CAST(max(avg_cond_ppm) AS BIGINT) AS max_ppm
FROM ranked
GROUP BY lang, nt
ORDER BY lang, bucket
""",
    tags=("llm-quality", "lm-scoring", "ccnet", "buckets"),
)
def ccnet_quality_buckets(spark, sf_dir):
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3: per
    language, rank documents by LM score and cut into terciles; training
    recipes then keep head+middle or re-weight by bucket): per (lang,
    bucket) the document count, token mass, and the ppm score range —
    computed from the same corpus-trained integer bigram model as
    `bigram_lm_quality_ppm`, so the whole thing stays bit-exact across
    engines (no log/float perplexity anywhere).

    Scale note: ntile is an exact per-language rank cut — a per-language
    sort, the oracle-checkable semantics. At 100 TB the deployment shape
    is the mergeable-sample construction `order_value_deciles_binned`
    established: estimate the two tercile SCORE EDGES per language from
    a fixed md5 Bernoulli sample, then bucket by comparison (map-only) —
    same twin pattern, exact tier registered here, sampled tier shared
    with the deciles machinery. Output is 3 rows per language regardless
    of corpus size."""
    from pyspark.sql import Window as W

    d = _doc_ppm(spark, sf_dir)
    meta = T(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    nt = F.ntile(3).over(
        W.partitionBy("lang").orderBy(F.desc("avg_cond_ppm"), "doc_id")
    )
    ranked = d.join(meta, "doc_id").select(
        "lang", "n_tokens", "avg_cond_ppm", nt.alias("nt")
    )
    return (
        ranked.groupBy("lang", "nt")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("avg_cond_ppm").cast("bigint").alias("min_ppm"),
            F.max("avg_cond_ppm").cast("bigint").alias("max_ppm"),
        )
        .select(
            "lang",
            F.expr(
                "CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END"
            ).alias("bucket"),
            "n_docs",
            "total_tokens",
            "min_ppm",
            "max_ppm",
        )
        .orderBy("lang", "bucket")
    )
