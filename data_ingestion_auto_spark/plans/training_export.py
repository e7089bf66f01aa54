"""Training-corpus export operators (LLM-pipeline north star, batch 3):
benchmark decontamination, greedy sequence packing, and deterministic
training-order shuffling — the last mile between a curated corpus and a
training run.

Scale design (the part that matters at 100 TB):

- decontamination: the benchmark n-gram set is tiny relative to the
  corpus (eval sets are MBs, corpora are TBs) — it broadcasts; the
  training side is a map-side n-gram explode feeding one broadcast join
  + one per-doc aggregate. Linear, no all-pairs anything.
- packing: the greedy cumulative-token window runs per (lang, shard) so
  no partition key ever holds more than corpus/|lang×shard| rows — the
  unbounded-window trap (WindowExec "No Partition Defined") is
  structurally avoided; shard count scales with the cluster.
- shuffle: a content-keyed md5 gives a deterministic pseudo-random
  permutation with no RNG state; ranking runs per 256-way key-prefix
  shard, so the global sort a naive ORDER BY rand() needs never happens —
  training readers consume shards independently, which is exactly how a
  100 TB export is laid out anyway.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .helpers import T
from .registry import query

# n-gram length for decontamination overlap. Production decontamination
# uses 8-13-word n-grams (GPT-3 appendix C style); the synthetic fixture
# prose only repeats 3-grams across documents, so the fixture-tier value
# is 3 — the plan shape is identical at any n.
_NGRAM = 3
_BENCH_MOD = 97  # doc_id % 97 == 0 → the stand-in "benchmark" eval set


@query(
    "decontamination_ngram_overlap",
    oracle=f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT DISTINCT doc_id, array_to_string(w[i : i + {_NGRAM - 1}], ' ') AS ng
  FROM w,
       LATERAL (SELECT unnest(generate_series(1, greatest(len(w) - {_NGRAM - 1}, 0))) AS i) s
),
bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % {_BENCH_MOD} = 0)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_ngrams,
       CAST(count(b.ng) AS BIGINT) AS n_overlap,
       (count(b.ng) > 0) AS contaminated
FROM g LEFT JOIN bench b USING (ng)
WHERE g.doc_id % {_BENCH_MOD} <> 0
GROUP BY g.doc_id
ORDER BY doc_id
""",
    tags=("text", "decontamination", "llm", "export"),
)
def decontamination_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with a held-out eval set (here the doc_id % 97 == 0
    subset stands in for the benchmark). The classic pre-training hygiene
    pass: eval-set n-grams are DISTINCT-ed and broadcast (the eval set is
    always tiny next to the corpus); the training side explodes its
    n-grams map-side and one broadcast left-join + per-doc aggregate
    yields overlap counts — linear in corpus size, and the n-gram explode
    never shuffles the raw text."""
    docs = T(spark, sf_dir, "documents")
    ws = docs.select("doc_id", F.split("text", " ").alias("w"))
    ng_expr = (
        f"CASE WHEN size(w) >= {_NGRAM} THEN "
        f"transform(sequence(1, size(w) - {_NGRAM - 1}), "
        "i -> concat_ws(' ', "
        + ", ".join(f"element_at(w, i + {j})" for j in range(_NGRAM))
        + ")) ELSE array() END"
    )
    g = ws.select("doc_id", F.explode(F.expr(ng_expr)).alias("ng")).distinct()
    # The eval side stays a BROADCAST join on purpose (r14 note: an
    # ng-window fold was tried and reverted — it would shuffle the FULL
    # corpus n-gram frame by ng at 100 TB, where this broadcast shuffles
    # nothing; the eval slice's doc_id % filter pushes below the
    # distinct to the scan, so the second subtree reads ~1/97 of the
    # corpus. The pin in test_plan_quality enforces exactly this.)
    bench = (
        g.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("ng")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        g.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .join(F.broadcast(bench), "ng", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.count("hit").alias("n_overlap"),
            (F.count("hit") > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


_BIN_TOKENS = 2048
_N_SHARDS = 8


@query(
    "sequence_packing_bins",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, CAST(doc_id % {_N_SHARDS} AS BIGINT) AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
  FROM documents
),
c AS (
  SELECT doc_id, lang, shard, tokens,
         sum(tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT lang, shard, CAST((cum - tokens) // {_BIN_TOKENS} AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS bin_tokens,
       min(doc_id) AS first_doc
FROM c
GROUP BY lang, shard, CAST((cum - tokens) // {_BIN_TOKENS} AS BIGINT)
ORDER BY lang, shard, bin_id
""",
    tags=("text", "packing", "llm", "export"),
)
def sequence_packing_bins(spark, sf_dir):
    """Greedy sequence packing: documents are assigned, in deterministic
    doc_id order, to fixed-capacity training bins (2048 whitespace
    tokens) — a document starts in the bin its running token total falls
    in. The cumulative window is partitioned by (lang, shard), never
    global: at 100 TB an unpartitioned ORDER BY is the classic
    WindowExec-single-partition trap, while per-(lang, shard) windows
    bound every partition to corpus/|lang×shard| and shard count scales
    with the cluster. Output: per-bin document count, token fill, and
    first document — what an exporter writes as one training sequence."""
    docs = T(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % _N_SHARDS).cast("bigint").alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum", F.sum("tokens").over(w))
    return (
        c.withColumn("bin_id", F.expr(f"(cum - tokens) div {_BIN_TOKENS}"))
        .groupBy("lang", "shard", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang", "shard", "bin_id")
    )


_SHUFFLE_SEED = "42"


@query(
    "training_order_shuffle",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, md5(concat('{_SHUFFLE_SEED}|', doc_id)) AS shuffle_key
  FROM documents
)
SELECT doc_id, shuffle_key, substr(shuffle_key, 1, 2) AS shard,
       CAST(row_number() OVER (PARTITION BY substr(shuffle_key, 1, 2)
                               ORDER BY shuffle_key, doc_id) AS BIGINT) AS shard_rank
FROM keyed
ORDER BY shard, shard_rank
""",
    tags=("text", "shuffle", "llm", "export"),
)
def training_order_shuffle(spark, sf_dir):
    """Deterministic training-order shuffle: every document gets a
    content-independent pseudo-random key md5(seed|doc_id) — reproducible
    across runs and engines with no RNG state — and is ranked within its
    2-hex-char key-prefix shard (256 shards). The naive alternative,
    ORDER BY rand() over the whole corpus, is both nondeterministic and a
    global sort; prefix-sharded ranking keeps every sort partition at
    ~1/256 of the data and training readers consume shards independently
    — the layout a 100 TB export uses anyway. Changing the seed constant
    reshuffles everything."""
    docs = T(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat_ws("|", F.lit(_SHUFFLE_SEED), F.col("doc_id"))).alias("shuffle_key"),
    ).withColumn("shard", F.substring("shuffle_key", 1, 2))
    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        keyed.withColumn("shard_rank", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shuffle_key", "shard", "shard_rank")
        .orderBy("shard", "shard_rank")
    )
