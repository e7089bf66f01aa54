"""Distribution-drift monitoring — the exact two-sample
Kolmogorov–Smirnov statistic between every pair of sources over their
document token-length distributions (Kolmogorov 1933 / Smirnov 1939;
the standard ingest-drift alarm: a source whose length distribution
jumps between crawls changed its extraction or its upstream).

Exactness contract: the KS statistic D = max_x |F_a(x) − F_b(x)| is a
maximum of rationals with denominator n_a·n_b, so the whole computation
stays in BIGINT — per length value x, the cross-multiplied ECDF gap
|cum_a·n_b − cum_b·n_a| — and only the final report divides once (one
IEEE division of identical integers, bit-stable across engines). No
sort-based quantile tricks, no float ECDFs.

Scale: token length is DOMAIN-bounded (distinct values ≤ max document
length, independent of corpus size), so the cumulative window per
source and the per-x pair expansion are bounded by sources × domain —
constant-sized after one corpus scan into (source, length) counts.
Output is sources·(sources−1)/2 rows at any corpus, the
bucket-stats/overlap-matrix observability contract.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .helpers import T
from .registry import query


@query(
    "ks_drift_matrix",
    oracle="""
WITH x AS (
  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS x
  FROM documents
),
cnt AS (SELECT source, x, CAST(count(*) AS BIGINT) AS c FROM x GROUP BY source, x),
n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY source),
xs AS (SELECT DISTINCT x FROM cnt),
grid AS (
  SELECT s.source, g.x, coalesce(c.c, 0) AS c
  FROM (SELECT source FROM n) s
  CROSS JOIN xs g
  LEFT JOIN cnt c ON c.source = s.source AND c.x = g.x
),
cum AS (
  SELECT source, x,
         CAST(sum(c) OVER (PARTITION BY source ORDER BY x
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM grid
),
gaps AS (
  SELECT a.source AS source_a, b.source AS source_b,
         abs(a.cum * nb.n - b.cum * na.n) AS gap_num
  FROM cum a
  JOIN cum b ON a.x = b.x AND a.source < b.source
  JOIN n na ON na.source = a.source
  JOIN n nb ON nb.source = b.source
)
SELECT g.source_a, g.source_b,
       CAST(max(g.gap_num) AS BIGINT) AS d_num,
       CAST(na.n AS BIGINT) AS n_a,
       CAST(nb.n AS BIGINT) AS n_b,
       CAST(max(g.gap_num) AS DOUBLE) / (na.n * nb.n) AS d_stat
FROM gaps g
JOIN n na ON na.source = g.source_a
JOIN n nb ON nb.source = g.source_b
GROUP BY g.source_a, g.source_b, na.n, nb.n
ORDER BY source_a, source_b
""",
    tags=("drift", "distribution", "ks", "observability", "llm"),
)
def ks_drift_matrix(spark, sf_dir):
    """Exact two-sample KS statistic for every source pair over document
    token lengths: D's exact integer numerator (max cross-multiplied
    ECDF gap), both sample sizes, and D itself (the single IEEE
    division). High D between a source's consecutive crawls — or
    between two sources that should sample the same population — is the
    drift alarm a pipeline owner pages on.

    Plan shape: one pruned corpus scan into (source, length) counts;
    the ECDF grid is sources × distinct-lengths (domain-bounded), its
    cumulative window partitions by source; the pair expansion is an
    in-row transform over each length's collected per-source ECDF array
    (optimization r14, guide §2.4 — the old ECDF self-join on x
    re-planned the grid+window subtree under BOTH branches, 10
    exchanges for one logical pass; every length row carries all
    sources by the grid's construction, so per-x pairs are a bounded
    array expansion, not a join). Everything after the first
    aggregation is constant-sized."""
    from ..checkpoints import ckpt

    docs = T(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).cast("bigint").alias("x")
    )
    # ONE corpus scan into the (source, length) count frame — domain ×
    # sources rows — checkpointed so sample sizes, the distinct-length
    # axis, and the grid all derive from the tiny cut, not from three
    # separate corpus scans (plan-pinned).
    cnt = ckpt(
        docs.groupBy("source", "x").agg(F.count("*").cast("bigint").alias("c"))
    )
    n = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    xs = cnt.select("x").distinct()
    grid = (
        n.select("source", "n")
        .crossJoin(F.broadcast(xs))
        .join(cnt, ["source", "x"], "left")
        .select("source", "n", "x", F.coalesce("c", F.lit(0)).alias("c"))
    )
    cum = grid.select(
        "source",
        "n",
        "x",
        F.sum("c")
        .over(W.partitionBy("source").orderBy("x").rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum"),
    )
    # per length: every source's (source, n, cum) — sorted array, then
    # the i<j pair expansion as a flat in-row transform (sources are
    # domain-bounded, so the array is fixed-size state)
    per_x = cum.groupBy("x").agg(
        F.expr("array_sort(collect_list(struct(source, n, cum)))").alias("ecdf")
    )
    pairs = per_x.select(
        F.explode(
            F.expr(
                "flatten(transform(ecdf, (ea, i) -> "
                "transform(slice(ecdf, i + 2, size(ecdf)), eb -> named_struct("
                "'source_a', ea.source, 'source_b', eb.source, "
                "'n_a', ea.n, 'n_b', eb.n, "
                "'gap_num', abs(ea.cum * eb.n - eb.cum * ea.n)))))"
            )
        ).alias("p")
    ).select("p.source_a", "p.source_b", "p.n_a", "p.n_b", "p.gap_num")
    return (
        pairs.groupBy("source_a", "source_b", "n_a", "n_b")
        .agg(F.max("gap_num").cast("bigint").alias("d_num"))
        .select(
            "source_a",
            "source_b",
            "d_num",
            "n_a",
            "n_b",
            (F.col("d_num").cast("double") / (F.col("n_a") * F.col("n_b"))).alias(
                "d_stat"
            ),
        )
        .orderBy("source_a", "source_b")
    )


@query(
    "label_centroid_similarity",
    oracle="""
WITH qv AS (
  SELECT label,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qvec
  FROM embeddings
),
n AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM qv GROUP BY label),
dims AS (
  SELECT label, g.i AS pos, qvec[g.i] AS v
  FROM qv, LATERAL (SELECT unnest(generate_series(1, len(qvec))) AS i) g
),
m AS (
  SELECT label, pos,
         CASE WHEN sum(v) < 0 THEN -(abs(sum(v)) // count(*))
              ELSE sum(v) // count(*) END AS cv
  FROM dims GROUP BY 1, 2
),
cent AS (SELECT label, list(cv ORDER BY pos) AS cvec FROM m GROUP BY label)
SELECT a.label AS label_a, b.label AS label_b,
       na.n AS n_a, nb.n AS n_b,
       round(CAST(list_sum(list_transform(generate_series(1, len(a.cvec)),
                  i -> a.cvec[i] * b.cvec[i])) AS DOUBLE)
             / (sqrt(CAST(list_sum(list_transform(a.cvec, x -> x * x)) AS DOUBLE))
                * sqrt(CAST(list_sum(list_transform(b.cvec, x -> x * x)) AS DOUBLE))), 6)
         AS cosine
FROM cent a JOIN cent b ON a.label < b.label
JOIN n na ON na.label = a.label
JOIN n nb ON nb.label = b.label
ORDER BY label_a, label_b
""",
    tags=("drift", "embedding", "centroid", "observability", "llm"),
)
def label_centroid_similarity(spark, sf_dir):
    """The EMBEDDING-SPACE drift complement of `ks_drift_matrix`: per
    label pair, the cosine between the groups' exact integer centroids
    (per-dimension BIGINT mean with the house sign-correct truncating
    division — the same bit-stable arithmetic as every k-means update in
    this engine) plus both group sizes. Two labels whose centroid cosine
    jumps between snapshots — or two that should be distinct collapsing
    toward 1 — is the representation-drift alarm an embedding pipeline
    monitors next to its ANN recall.

    Scale: one corpus scan into (label, dim) BIGINT sums (map-side
    combinable); centroids are labels × dim ints — model state — so the
    pairwise step is a bounded nested-loop over ≤ labels² rows and the
    output ≤ labels²/2 rows at any corpus."""
    from ..checkpoints import ckpt
    from ..operators.ivf import _QUANT

    emb = T(spark, sf_dir, "embeddings").select(
        "label", F.expr(_QUANT.format(col="embedding")).alias("qvec")
    )
    n = emb.groupBy("label").agg(F.count("*").cast("bigint").alias("n"))
    dims = emb.select("label", F.posexplode("qvec").alias("pos", "v"))
    per_dim = dims.groupBy("label", "pos").agg(
        F.expr("sum(v) div count(v)").alias("cv")
    )
    cent = per_dim.groupBy("label").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)"
        ).alias("cvec")
    )
    # labels × (dim + 1) ints — model state: cut ONCE so the pairwise
    # cross join reads the materialized cut instead of re-planning the
    # centroid derivation (and its three exchanges) under both branches
    # (optimization r14; 7 exchanges -> the derivation's 3).
    stats = ckpt(cent.join(n, "label"))
    a = stats.select(
        F.col("label").alias("label_a"), F.col("cvec").alias("ca"), F.col("n").alias("n_a")
    )
    b = stats.select(
        F.col("label").alias("label_b"), F.col("cvec").alias("cb"), F.col("n").alias("n_b")
    )
    dot = "aggregate(zip_with(ca, cb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    nrm = "aggregate({v}, 0L, (acc, x) -> acc + x * x)"
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.round(
                F.expr(dot)
                / (F.sqrt(F.expr(nrm.format(v="ca"))) * F.sqrt(F.expr(nrm.format(v="cb")))),
                6,
            ).alias("cosine"),
        )
        .orderBy("label_a", "label_b")
    )


@query(
    "unigram_tvd_matrix",
    oracle="""
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
),
cnt AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2),
tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
grid AS (
  SELECT a.source AS source_a, b.source AS source_b, a.n AS n_a, b.n AS n_b
  FROM tot a JOIN tot b ON a.source < b.source
),
m AS (
  SELECT ca.source AS source_a, cb.source AS source_b,
         CAST(sum(abs(ca.c * tb.n - cb.c * ta.n)) AS BIGINT) AS sum_abs,
         CAST(sum(ca.c) AS BIGINT) AS m_a,
         CAST(sum(cb.c) AS BIGINT) AS m_b,
         CAST(count(*) AS BIGINT) AS shared_vocab
  FROM cnt ca
  JOIN cnt cb ON ca.token = cb.token AND ca.source < cb.source
  JOIN tot ta ON ta.source = ca.source
  JOIN tot tb ON tb.source = cb.source
  GROUP BY 1, 2
),
r AS (
  SELECT g.source_a, g.source_b, g.n_a, g.n_b,
         CAST(coalesce(m.shared_vocab, 0) AS BIGINT) AS shared_vocab,
         CAST(coalesce(m.sum_abs, 0)
              + (g.n_a - coalesce(m.m_a, 0)) * g.n_b
              + (g.n_b - coalesce(m.m_b, 0)) * g.n_a AS BIGINT) AS tvd_num
  FROM grid g
  LEFT JOIN m ON g.source_a = m.source_a AND g.source_b = m.source_b
)
SELECT source_a, source_b, n_a, n_b, shared_vocab, tvd_num,
       CAST(tvd_num AS DOUBLE) / (2.0 * n_a * n_b) AS tvd
FROM r
ORDER BY source_a, source_b
""",
    tags=("drift", "distribution", "tvd", "observability", "llm"),
)
def unigram_tvd_matrix(spark, sf_dir):
    """Exact total-variation distance between every source pair's unigram
    (word) distributions — the CONTENT-drift complement of
    `ks_drift_matrix` (which watches length distributions): a source
    whose vocabulary mix jumps between crawls changed topic, language
    mix, or extraction, even if its document lengths stayed put.

    Exactness contract: TVD = 1/2 * sum_w |p_a(w) - p_b(w)| over the
    union vocabulary is a rational with denominator 2*n_a*n_b, so the
    numerator stays in BIGINT cross-multiplied arithmetic —
    sum |c_a*n_b - c_b*n_a| over SHARED words plus the one-sided masses
    (n_a - m_a)*n_b and (n_b - m_b)*n_a, which is algebraically the
    union-vocabulary sum without ever materializing per-pair missing
    words — and only the report divides once (one IEEE division of
    identical integers, bit-stable across engines). Products stay below
    2^53 up to ~90M tokens per source; beyond that the numerator
    arithmetic moves to DECIMAL(38,0) unchanged in shape.

    Scale: one corpus scan into (source, token) counts — vocabulary x
    sources rows, checkpointed; the pair expansion is an in-row
    transform over each token's ≤|sources| collected counts (never the
    corpus, and never a self-join — optimization r14), the pair grid is
    a broadcast sources x sources nested loop (domain-bounded), output
    sources*(sources-1)/2 rows at any corpus — the drift-matrix
    observability contract."""
    from ..checkpoints import ckpt

    tok = T(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("token")
    )
    # ONE corpus scan into the (source, token) count frame (vocab x
    # sources rows) — totals, the pair grid, and the shared-word join
    # all derive from the cut, never from re-scans (plan-pinned).
    cnt = ckpt(
        tok.groupBy("source", "token").agg(F.count("*").cast("bigint").alias("c"))
    )
    tot = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    ta = tot.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    grid = ta.crossJoin(F.broadcast(tb)).filter(F.col("source_a") < F.col("source_b"))
    # shared-word pair masses via an in-row expansion of each token's
    # collected per-source (source, c, n) array (optimization r14, guide
    # §2.4): the old token-keyed SELF-join re-planned the count cut and
    # its exchange under both branches (7 exchanges); the per-token
    # array is ≤ |sources| entries (domain-bounded), totals ride along
    # from one broadcast join BEFORE the collect, so the pair rows need
    # no post-explode joins at all.
    cnt_n = cnt.join(F.broadcast(tot), "source")
    per_tok = cnt_n.groupBy("token").agg(
        F.expr("array_sort(collect_list(struct(source, c, n)))").alias("sc")
    )
    pairs = per_tok.select(
        F.explode(
            F.expr(
                "flatten(transform(sc, (ea, i) -> "
                "transform(slice(sc, i + 2, size(sc)), eb -> named_struct("
                "'source_a', ea.source, 'source_b', eb.source, "
                "'c_a', ea.c, 'c_b', eb.c, "
                "'gap', abs(ea.c * eb.n - eb.c * ea.n)))))"
            )
        ).alias("p")
    ).select("p.source_a", "p.source_b", "p.c_a", "p.c_b", "p.gap")
    m = (
        pairs.groupBy("source_a", "source_b")
        .agg(
            F.sum("gap").cast("bigint").alias("sum_abs"),
            F.sum("c_a").cast("bigint").alias("m_a"),
            F.sum("c_b").cast("bigint").alias("m_b"),
            F.count("*").cast("bigint").alias("shared_vocab"),
        )
    )
    r = grid.join(m, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        F.coalesce("shared_vocab", F.lit(0)).cast("bigint").alias("shared_vocab"),
        (
            F.coalesce("sum_abs", F.lit(0))
            + (F.col("n_a") - F.coalesce("m_a", F.lit(0))) * F.col("n_b")
            + (F.col("n_b") - F.coalesce("m_b", F.lit(0))) * F.col("n_a")
        )
        .cast("bigint")
        .alias("tvd_num"),
    )
    return r.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        "shared_vocab",
        "tvd_num",
        (F.col("tvd_num").cast("double") / (F.lit(2.0) * F.col("n_a") * F.col("n_b"))).alias("tvd"),
    ).orderBy("source_a", "source_b")


@query(
    "trimmed_mean_length",
    oracle="""
WITH x AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS len
  FROM documents
),
r AS (
  SELECT source, len,
         row_number() OVER (PARTITION BY source ORDER BY len, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM x
),
k AS (
  SELECT source, len, n, n // 10 AS t
  FROM r WHERE rn > n // 10 AND rn <= n - n // 10
)
SELECT source,
       CAST(max(n) AS BIGINT) AS n_docs,
       CAST(max(t) AS BIGINT) AS n_trimmed_each_side,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(len) AS BIGINT) AS kept_len_sum,
       CAST(sum(len) AS DOUBLE) / count(*) AS trimmed_mean
FROM k
GROUP BY source
ORDER BY source
""",
    tags=("drift", "robust", "observability", "llm"),
)
def trimmed_mean_length(spark, sf_dir):
    """Per-source 10% two-sided trimmed mean of document token length —
    the robust location statistic an ingest monitor alarms on: a raw
    mean moves when a scraper starts emitting a handful of giant
    concatenated pages; the trimmed mean only moves when the BULK of
    the distribution moves (breakdown point 10%). Reported with the
    exact integer machinery: per-source rank + count windows (one
    shared partition exchange), drop floor(n/10) from each side, BIGINT
    sum of the kept middle, one IEEE division at report time.

    Scale: the windows partition BY SOURCE — per-partition sort, never
    a global one; at corpora where a single source outgrows a
    partition's sort budget, the sampled-edge construction
    (`order_value_deciles_binned`) replaces exact ranks with md5-sample
    bin edges, the same exact→binned laddering documented there. Output
    one row per source at any corpus."""
    from pyspark.sql import Window as W

    x = T(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("len"),
    )
    w = W.partitionBy("source")
    r = x.select(
        "source",
        "len",
        F.row_number().over(w.orderBy("len", "doc_id")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    k = r.filter(
        (F.col("rn") > F.expr("n div 10")) & (F.col("rn") <= F.col("n") - F.expr("n div 10"))
    ).select("source", "len", "n", F.expr("n div 10").alias("t"))
    return (
        k.groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            F.max("t").cast("bigint").alias("n_trimmed_each_side"),
            F.count("*").cast("bigint").alias("n_kept"),
            F.sum("len").cast("bigint").alias("kept_len_sum"),
            (F.sum("len").cast("double") / F.count("*")).alias("trimmed_mean"),
        )
        .orderBy("source")
    )


@query(
    "token_shift_topk",
    oracle="""
WITH tok AS (
  SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8' AS in_a,
         unnest(string_split(text, ' ')) AS token
  FROM documents
),
cnt AS (
  SELECT token,
         CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
         CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS c_b
  FROM tok GROUP BY token
),
tot AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a, CAST(sum(c_b) AS BIGINT) AS n_b FROM cnt)
SELECT token, c_a, c_b,
       CAST(c_a * n_b - c_b * n_a AS BIGINT) AS shift_num,
       CAST(CAST(c_a * n_b - c_b * n_a AS DOUBLE)
            / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) * 1000000.0 AS DOUBLE) AS shift_ppm
FROM cnt CROSS JOIN tot
ORDER BY abs(c_a * n_b - c_b * n_a) DESC, token
LIMIT 30
""",
    tags=("drift", "attribution", "observability", "llm"),
)
def token_shift_topk(spark, sf_dir):
    """Drift ATTRIBUTION: the aggregate drift matrices (`ks_drift_matrix`,
    `unigram_tvd_matrix`) page the operator; this query tells them WHICH
    words moved — the top tokens by exact cross-multiplied frequency
    shift between the two md5 corpus halves (standing in for
    consecutive crawls, the house split convention). shift_num =
    c_a*N_b − c_b*N_a is the signed BIGINT numerator of p_a − p_b over
    the common denominator N_a*N_b; one IEEE multiply-divide pair at
    report time renders it as signed ppm.

    Scale: one corpus scan into per-token half-counts (vocab-bounded,
    map-side combinable), a broadcast 1-row totals join, and a
    vocab-sized top-k sort. Output 30 rows at any corpus."""
    tok = T(spark, sf_dir, "documents").select(
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8").alias(
            "in_a"
        ),
        F.explode(F.split("text", " ")).alias("token"),
    )
    cnt = tok.groupBy("token").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("bigint").alias("c_a"),
        F.sum(F.when(F.col("in_a"), 0).otherwise(1)).cast("bigint").alias("c_b"),
    )
    tot = cnt.agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum("c_b").cast("bigint").alias("n_b"),
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "token",
            "c_a",
            "c_b",
            (F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a"))
            .cast("bigint")
            .alias("shift_num"),
            (
                (F.col("c_a") * F.col("n_b") - F.col("c_b") * F.col("n_a")).cast(
                    "double"
                )
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
                * F.lit(1000000.0)
            ).alias("shift_ppm"),
        )
        .orderBy(F.abs(F.col("shift_num")).desc(), "token")
        .limit(30)
    )


@query(
    "lang_source_association",
    oracle="""
WITH c AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS obs FROM documents GROUP BY 1, 2
),
r AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS r_tot FROM c GROUP BY 1),
k AS (SELECT source, CAST(sum(obs) AS BIGINT) AS c_tot FROM c GROUP BY 1),
n AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM c)
SELECT c.lang, c.source, c.obs, r.r_tot, k.c_tot,
       CAST(abs(c.obs * n.n - r.r_tot * k.c_tot) AS BIGINT) AS dev_num,
       CAST((1000000 * c.obs * n.n) // (r.r_tot * k.c_tot) AS BIGINT) AS lift_ppm
FROM c JOIN r USING (lang) JOIN k USING (source) CROSS JOIN n
ORDER BY lang, source
""",
    tags=("drift", "contingency", "observability", "llm"),
)
def lang_source_association(spark, sf_dir):
    """Language × source contingency table with the exact independence
    deviation per cell: observed count, both marginals, the BIGINT
    cross-multiplied deviation |obs·N − r·c| (the χ² numerator's exact
    core, log- and float-free), and the lift obs·N/(r·c) in integer ppm
    (1,000,000 = independent; a cell far above means that source is a
    language enclave). The composition-drift alarm a mixture designer
    reads when a crawler's language routing changes: under stable
    routing every cell's lift is stationary.

    Scale: one pruned two-column corpus scan into langs × sources
    cells (domain-bounded), marginals derived from the cells (never a
    re-scan), broadcast joins; output ≤ langs × sources rows at any
    corpus."""
    c = (
        T(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("bigint").alias("obs"))
    )
    from ..checkpoints import ckpt

    c = ckpt(c)
    r = c.groupBy("lang").agg(F.sum("obs").cast("bigint").alias("r_tot"))
    k = c.groupBy("source").agg(F.sum("obs").cast("bigint").alias("c_tot"))
    n = c.agg(F.sum("obs").cast("bigint").alias("n"))
    return (
        c.join(F.broadcast(r), "lang")
        .join(F.broadcast(k), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            "source",
            "obs",
            "r_tot",
            "c_tot",
            F.abs(F.col("obs") * F.col("n") - F.col("r_tot") * F.col("c_tot"))
            .cast("bigint")
            .alias("dev_num"),
            F.expr("CAST((1000000 * obs * n) div (r_tot * c_tot) AS BIGINT)").alias(
                "lift_ppm"
            ),
        )
        .orderBy("lang", "source")
    )
