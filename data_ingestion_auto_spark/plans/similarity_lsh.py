"""LSH-bucketed approximate nearest neighbors — the similarity-search
scale path (operators/similarity.py documents the tiering).

Sign-LSH: 8 fixed hyperplanes whose ±1 components come from md5 digests of
(plane, dim) — deterministic, engine-independent, precomputed here and
embedded as literals in BOTH the Spark expression and the DuckDB oracle.
Bucket key = 8 sign bits. Candidates = corpus vectors sharing the query's
bucket; exact quantized cosine ranks within the bucket.

At 100 TB: bucket assignment is a map-only projection; the candidate join
is an equi-join on the bucket key (shuffle ∝ corpus, never all-pairs);
brute force runs only inside buckets (~corpus/2^bits each). Recall grows
with multi-probe (flip one bit) — same plan shape, more bucket keys per
query.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .helpers import T
from .registry import query

_DIM = 64
_PLANES = 8
_N_QUERIES = 8


def _sign(plane: int, dim: int) -> int:
    h = hashlib.md5(f"{plane}|{dim}".encode()).hexdigest()
    return 1 if h[0] in "89abcdef" else -1


_SIGNS = [[_sign(j, i) for i in range(_DIM)] for j in range(_PLANES)]


def _q(rel: str, i: int, spark: bool = False) -> str:
    # integer-quantized component. NB: Spark bracket indexing is 0-based,
    # DuckDB's is 1-based — use element_at (1-based) on the Spark side.
    acc = f"element_at({rel}, {i + 1})" if spark else f"{rel}[{i + 1}]"
    return f"CAST(round(CAST({acc} AS DOUBLE) * 10000.0) AS BIGINT)"


def _bucket_sql(rel: str, spark: bool = False, planes: int = _PLANES) -> str:
    bits = []
    for j in range(planes):
        terms = " + ".join(
            f"{'' if _SIGNS[j][i] > 0 else '-'}{_q(rel, i, spark)}" for i in range(_DIM)
        )
        bits.append(f"CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END")
    return "concat(" + ", ".join(bits) + ")"


def _dot_sql(a: str, b: str, spark: bool = False) -> str:
    return " + ".join(f"{_q(a, i, spark)} * {_q(b, i, spark)}" for i in range(_DIM))


def _norm_sql(a: str, spark: bool = False) -> str:
    return " + ".join(f"{_q(a, i, spark)} * {_q(a, i, spark)}" for i in range(_DIM))


# --- Spark-side fast forms -------------------------------------------------
# The inline 64-term expressions above are kept for the DuckDB oracles; the
# Spark plans instead pre-project ONE quantized bigint array (qvec) and run
# zip_with/aggregate over it — far lighter codegen (a handful of higher-order
# calls instead of thousands of scalar subexpressions). Integer arithmetic is
# associative and exact, so both forms are numerically IDENTICAL; parity is
# unaffected.

_QVEC = "transform({col}, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))"


def _zip_dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"


def _bucket_from_qvec(col: str = "qvec", planes: int = _PLANES) -> str:
    bits = []
    for j in range(planes):
        arr = "array(" + ", ".join(f"{s}L" for s in _SIGNS[j]) + ")"
        bits.append(
            f"CASE WHEN {_zip_dot(col, arr)} >= 0 THEN '1' ELSE '0' END"
        )
    return "concat(" + ", ".join(bits) + ")"


def _cosine_col(a: str, b: str):
    return F.round(
        F.expr(_zip_dot(a, b))
        / (F.sqrt(F.expr(_zip_dot(a, a))) * F.sqrt(F.expr(_zip_dot(b, b)))),
        6,
    )


@query(
    "ann_lsh_bucketed",
    oracle=f"""
WITH base AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM base WHERE vec_id < {_N_QUERIES}),
cand AS (
  SELECT q.query_id, b.vec_id AS cand_id,
         round(({_dot_sql('qe', 'b.embedding')})
               / (sqrt({_norm_sql('qe')}) * sqrt({_norm_sql('b.embedding')})), 6) AS cosine
  FROM q JOIN base b ON q.bucket = b.bucket AND b.vec_id <> q.query_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
  FROM cand
) t WHERE rank <= 3
ORDER BY query_id, rank
""",
    tags=("similarity", "ann", "lsh"),
)
def ann_lsh_bucketed(spark, sf_dir):
    """Sign-LSH bucketed ANN: top-3 within the query's bucket. The bucket
    equi-join replaces the brute-force cross product (exact twin:
    `embedding_cosine_topk`)."""
    emb = T(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.expr(_QVEC.format(col="embedding")).alias("qvec"),
    ).withColumn("bucket", F.expr(_bucket_from_qvec("qvec")))
    q = (
        base.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("qvec").alias("qe"),
            F.col("bucket"),
        )
    )
    cand = (
        base.join(F.broadcast(q), ["bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            _cosine_col("qe", "qvec").alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def _probe_union_sql() -> str:
    """The query bucket plus its 8 Hamming-distance-1 neighbours, as a
    UNION ALL (shared shape between DuckDB oracle and Spark SQL)."""
    parts = ["SELECT query_id, qe, bucket AS probe FROM q"]
    for j in range(_PLANES):
        flip = (
            f"substring(bucket, 1, {j}) || "
            f"(CASE WHEN substring(bucket, {j + 1}, 1) = '1' THEN '0' ELSE '1' END)"
            f" || substring(bucket, {j + 2})"
        )
        parts.append(f"SELECT query_id, qe, {flip} AS probe FROM q")
    return "\nUNION ALL\n".join(parts)


@query(
    "ann_multiprobe_lsh",
    oracle=f"""
WITH base AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM base WHERE vec_id < {_N_QUERIES}),
probes AS ({_probe_union_sql()}),
cand AS (
  SELECT p.query_id, b.vec_id AS cand_id,
         round(({_dot_sql('qe', 'b.embedding')})
               / (sqrt({_norm_sql('qe')}) * sqrt({_norm_sql('b.embedding')})), 6) AS cosine
  FROM probes p JOIN base b ON p.probe = b.bucket AND b.vec_id <> p.query_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
  FROM cand
) t WHERE rank <= 3
ORDER BY query_id, rank
""",
    tags=("similarity", "ann", "lsh", "multiprobe"),
)
def ann_multiprobe_lsh(spark, sf_dir):
    """Multi-probe sign-LSH ANN (VERDICT round-1 item #8): each query
    probes its own bucket PLUS the 8 buckets at Hamming distance 1 — the
    classic multi-probe recall lever (Lv et al., VLDB'07) with the same
    plan shape as single-probe: the probe set is a 9-row explode of the
    (tiny, broadcast) query side, candidates remain one equi-join on the
    bucket key, never all-pairs. Probe buckets are distinct, so no
    candidate dedup is needed. Recall vs the brute-force ground truth is
    asserted in tests/test_multiprobe_recall.py."""
    emb = T(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.expr(_QVEC.format(col="embedding")).alias("qvec"),
    ).withColumn("bucket", F.expr(_bucket_from_qvec("qvec")))
    q = base.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("qe"),
        F.col("bucket"),
    )
    probe_cols = [F.col("bucket")] + [
        F.concat(
            F.expr(f"substring(bucket, 1, {j})"),
            F.when(F.expr(f"substring(bucket, {j + 1}, 1)") == "1", F.lit("0")).otherwise(
                F.lit("1")
            ),
            F.expr(f"substring(bucket, {j + 2})"),
        )
        for j in range(_PLANES)
    ]
    probes = q.select("query_id", "qe", F.explode(F.array(*probe_cols)).alias("probe"))
    cand = (
        base.join(F.broadcast(probes), base.bucket == probes.probe)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            _cosine_col("qe", "qvec").alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def _flip_sql(positions: tuple[int, ...]) -> str:
    """Rebuild the 8-bit bucket string with the given bit positions
    flipped — dialect-neutral (substring/CASE/concat run identically in
    Spark SQL and DuckDB), so one generator feeds both sides."""
    chars = []
    for i in range(_PLANES):
        c = f"substring(bucket, {i + 1}, 1)"
        if i in positions:
            c = f"(CASE WHEN {c} = '1' THEN '0' ELSE '1' END)"
        chars.append(c)
    return "concat(" + ", ".join(chars) + ")"


def _probe_sets(radius: int) -> list[tuple[int, ...]]:
    """All bit-position subsets of size <= radius: nested by construction,
    so the candidate set (and therefore recall) is monotone in radius."""
    from itertools import combinations

    sets: list[tuple[int, ...]] = []
    for r in range(radius + 1):
        sets.extend(combinations(range(_PLANES), r))
    return sets


def multiprobe_topk(spark, sf_dir, radius: int = 1, topk: int = 3):
    """Parameterized multi-probe sign-LSH ANN (round-2 verdict item #7):
    each query probes every bucket within Hamming distance ``radius`` of
    its own (radius 0 → 1 probe, 1 → 9, 2 → 37). The plan shape never
    changes — the probe set is a small explode of the broadcast query
    side and candidates remain ONE equi-join on the bucket key — so the
    recall/cost dial moves without touching the physical strategy; at
    100 TB the join stays linear in corpus size at any radius. Probe sets
    are nested in radius, so recall is monotone (asserted at radius 2 in
    tests/test_multiprobe_recall.py)."""
    emb = T(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.expr(_QVEC.format(col="embedding")).alias("qvec"),
    ).withColumn("bucket", F.expr(_bucket_from_qvec("qvec")))
    q = base.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qvec").alias("qe"),
        F.col("bucket"),
    )
    probe_cols = [F.expr(_flip_sql(s)) for s in _probe_sets(radius)]
    probes = q.select("query_id", "qe", F.explode(F.array(*probe_cols)).alias("probe"))
    cand = (
        base.join(F.broadcast(probes), base.bucket == probes.probe)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            _cosine_col("qe", "qvec").alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def _probe_union_sql_radius(radius: int) -> str:
    return "\nUNION ALL\n".join(
        f"SELECT query_id, qe, {_flip_sql(s)} AS probe FROM q" for s in _probe_sets(radius)
    )


@query(
    "ann_multiprobe_lsh_r2",
    oracle=f"""
WITH base AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM base WHERE vec_id < {_N_QUERIES}),
probes AS ({_probe_union_sql_radius(2)}),
cand AS (
  SELECT p.query_id, b.vec_id AS cand_id,
         round(({_dot_sql('qe', 'b.embedding')})
               / (sqrt({_norm_sql('qe')}) * sqrt({_norm_sql('b.embedding')})), 6) AS cosine
  FROM probes p JOIN base b ON p.probe = b.bucket AND b.vec_id <> p.query_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
  FROM cand
) t WHERE rank <= 3
ORDER BY query_id, rank
""",
    tags=("similarity", "ann", "lsh", "multiprobe"),
)
def ann_multiprobe_lsh_r2(spark, sf_dir):
    """Hamming-2 multi-probe ANN: 37 probe buckets per query via the
    parameterized ``multiprobe_topk`` (radius dial — same linear plan
    shape as single-probe). Candidate superset of the radius-1 query;
    recall monotonicity vs radius 0/1 and the brute-force ground truth is
    pinned in tests/test_multiprobe_recall.py."""
    return multiprobe_topk(spark, sf_dir, radius=2)


@query(
    "tumbling_window_hourly",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type,
       count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY hour_start, event_type
""",
    tags=("window", "W6", "streaming-batch"),
)
def tumbling_window_hourly(spark, sf_dir):
    """W6 tumbling event-time window as a batch query (the oracle-checkable
    twin of streaming/incremental.windowed_counts): date_trunc grouping —
    calendar windows, matching the reference's monthly/pentad periods
    rather than uniform durations."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.expr("CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE)").alias(
                "total_value"
            ),
        )
        .orderBy("hour_start", "event_type")
    )


_NEARDUP_T = 0.99


@query(
    "embedding_neardup_dedup",
    oracle=f"""
WITH aug AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000000,
         list_concat([CAST(embedding[1] AS DOUBLE) * 1.02], CAST(embedding[2:] AS DOUBLE[]))
  FROM embeddings WHERE vec_id < 20
),
base AS (SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM aug),
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round(({_dot_sql('a.embedding', 'b.embedding')})
              / (sqrt({_norm_sql('a.embedding')}) * sqrt({_norm_sql('b.embedding')})), 6)
        >= {_NEARDUP_T}
)
SELECT m.vec_id,
       coalesce(min(p.a), m.vec_id) AS keep_id,
       (coalesce(min(p.a), m.vec_id) <> m.vec_id) AS is_dup
FROM aug m LEFT JOIN pairs p ON p.b = m.vec_id
GROUP BY m.vec_id
ORDER BY m.vec_id
""",
    tags=("dedup", "similarity", "ann", "embedding"),
)
def embedding_neardup_dedup(spark, sf_dir):
    """Embedding-cosine near-dup dedup — the vector-space tier of the
    dedup ladder (exact → MinHash-LSH → SimHash → embedding cosine).
    The corpus is augmented with 20 deterministic 2%-perturbed copies
    (cosine ≈ 0.9998 to their originals — the fixture embeddings are
    random, max natural cosine ≈ 0.51), candidate pairs come from the
    sign-LSH bucket equi-join (linear, never all-pairs), survivors pass
    the exact quantized-cosine ≥ 0.99 gate, and each vector's canonical is
    its smallest near-dup neighbour (single-pass min-neighbour — the
    standard one-round approximation of connected components; full CC is
    iterative and out of SQL's reach). keep_id < vec_id marks the dup.
    Perturbed ids are offset by 10_000_000 (beyond any fixture corpus) so
    augmentation never collides with real vec_ids at any SF, and the
    dup-pair join carries no broadcast hint — the pair set is bounded by
    dup density, not structure, so AQE picks the strategy at runtime."""
    emb = T(spark, sf_dir, "embeddings")
    pert_vec = (
        "concat(array(CAST(element_at(embedding, 1) AS DOUBLE) * 1.02), "
        "transform(slice(embedding, 2, 63), x -> CAST(x AS DOUBLE)))"
    )
    orig = emb.select("vec_id", F.expr(_QVEC.format(col="embedding")).alias("qvec"))
    pert = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.expr(
            f"transform({pert_vec}, v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT))"
        ).alias("qvec"),
    )
    aug = orig.unionByName(pert)
    base = aug.withColumn("bucket", F.expr(_bucket_from_qvec("qvec")))
    a = base.select(F.col("vec_id").alias("a"), F.col("qvec").alias("qa"), "bucket")
    b = base.select(F.col("vec_id").alias("b"), F.col("qvec").alias("qb"), "bucket")
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("a") < F.col("b"))
        .filter(_cosine_col("qa", "qb") >= _NEARDUP_T)
        .select("a", "b")
    )
    return (
        aug.join(pairs, aug.vec_id == pairs.b, "left")
        .groupBy("vec_id")
        .agg(F.coalesce(F.min("a"), F.col("vec_id")).alias("keep_id"))
        .select(
            "vec_id", "keep_id", (F.col("keep_id") != F.col("vec_id")).alias("is_dup")
        )
        .orderBy("vec_id")
    )


@query(
    "ann_ivf_probe",
    oracle="""
WITH qv AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qvec
  FROM embeddings
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster_id, cvec
  FROM (SELECT vec_id, qvec AS cvec FROM qv ORDER BY vec_id LIMIT 8)
),
a1 AS (
  SELECT vec_id, qvec, cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cluster_id) AS rn FROM (
      SELECT v.vec_id, v.qvec, c.cluster_id,
             list_sum(list_transform(generate_series(1, len(v.qvec)),
                      i -> (v.qvec[i] - c.cvec[i]) * (v.qvec[i] - c.cvec[i]))) AS dist2
      FROM qv v CROSS JOIN c0 c)
  ) WHERE rn = 1
),
m1 AS (
  SELECT cluster_id, pos,
         CASE WHEN sum(v) < 0 THEN -(abs(sum(v)) // count(*)) ELSE sum(v) // count(*) END AS cv
  FROM (SELECT cluster_id, g.i AS pos, qvec[g.i] AS v
        FROM a1, LATERAL (SELECT unnest(generate_series(1, len(qvec))) AS i) g)
  GROUP BY 1, 2
),
c1 AS (SELECT cluster_id, list(cv ORDER BY pos) AS cvec FROM m1 GROUP BY 1),
a2 AS (
  SELECT vec_id, qvec, cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cluster_id) AS rn FROM (
      SELECT v.vec_id, v.qvec, c.cluster_id,
             list_sum(list_transform(generate_series(1, len(v.qvec)),
                      i -> (v.qvec[i] - c.cvec[i]) * (v.qvec[i] - c.cvec[i]))) AS dist2
      FROM qv v CROSS JOIN c1 c)
  ) WHERE rn = 1
),
m2 AS (
  SELECT cluster_id, pos,
         CASE WHEN sum(v) < 0 THEN -(abs(sum(v)) // count(*)) ELSE sum(v) // count(*) END AS cv
  FROM (SELECT cluster_id, g.i AS pos, qvec[g.i] AS v
        FROM a2, LATERAL (SELECT unnest(generate_series(1, len(qvec))) AS i) g)
  GROUP BY 1, 2
),
c2 AS (SELECT cluster_id, list(cv ORDER BY pos) AS cvec FROM m2 GROUP BY 1),
a3 AS (
  SELECT vec_id, qvec, cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cluster_id) AS rn FROM (
      SELECT v.vec_id, v.qvec, c.cluster_id,
             list_sum(list_transform(generate_series(1, len(v.qvec)),
                      i -> (v.qvec[i] - c.cvec[i]) * (v.qvec[i] - c.cvec[i]))) AS dist2
      FROM qv v CROSS JOIN c2 c)
  ) WHERE rn = 1
),
qs AS (SELECT vec_id AS query_id, qvec AS qq FROM a3 WHERE vec_id < 8),
pc AS (
  SELECT query_id, qq, cluster_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dist2, cluster_id) AS rn FROM (
      SELECT q.query_id, q.qq, c.cluster_id,
             list_sum(list_transform(generate_series(1, len(q.qq)),
                      i -> (q.qq[i] - c.cvec[i]) * (q.qq[i] - c.cvec[i]))) AS dist2
      FROM qs q CROSS JOIN c2 c)
  ) WHERE rn <= 2
),
cand AS (
  SELECT p.query_id, a.vec_id AS cand_id,
         round(CAST(list_sum(list_transform(generate_series(1, len(p.qq)),
                    i -> p.qq[i] * a.qvec[i])) AS DOUBLE)
               / (sqrt(CAST(list_sum(list_transform(p.qq, x -> x * x)) AS DOUBLE))
                  * sqrt(CAST(list_sum(list_transform(a.qvec, x -> x * x)) AS DOUBLE))), 6) AS cosine
  FROM a3 a JOIN pc p USING (cluster_id)
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, cand_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rank
  FROM cand
) WHERE rank <= 3
ORDER BY query_id, rank
""",
    tags=("similarity", "ann", "ivf"),
)
def ann_ivf_probe(spark, sf_dir):
    """IVF ANN (operators/ivf.py): deterministic integer k-means-lite
    coarse quantizer (k=8, 2 Lloyd iterations, init = smallest ids), then
    each query probes its 2 nearest clusters and exact quantized cosine
    ranks the candidates. Recall vs the brute-force ground truth and
    run-to-run determinism are pinned by tests/test_ivf.py; since round 4
    the gate check is a full hash oracle: because the quantizer is
    bit-deterministic integer arithmetic with a FIXED iteration count,
    the "iterative" loop is finitely unrollable — the DuckDB oracle
    replays init -> assign -> update -> assign -> update -> final assign
    as six chained CTEs (Spark's `sum div count` centroid update becomes
    sign(s) * (abs(s) // n) to reproduce truncate-toward-zero under
    DuckDB's floor division). Unrolling is the oracle tier only; the
    Spark operator stays a driver-side loop with broadcast centroids.

    The trained model (assignments + centroids) is MEMOIZED per corpus
    version (plans/ann_memo.py, round-12) and shared with the IVF-PQ
    coarse tier; only the probe runs live per query."""
    from ..operators.ivf import _route_probe_rank
    from .ann_memo import emb_full, kml_model

    assigned, centroids = kml_model(
        spark, sf_dir, "full", lambda: emb_full(spark, sf_dir), k=8
    )
    queries = assigned.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("qq")
    )
    return _route_probe_rank(
        queries, assigned, centroids, nprobe=2, topk=3, id_col="vec_id",
        broadcast_probes=True,
    )
