"""IVF (inverted-file) ANN tier: k-means-lite coarse quantizer + cluster
probing — the third rung of the similarity ladder (brute-force → LSH
buckets → IVF), for when bucket occupancy needs to follow the data
distribution instead of fixed hyperplanes.

Spark-first shape:

- vectors are integer-quantized once (×10⁴, the same quantization as the
  cosine queries) so every distance/centroid computation is exact bigint
  arithmetic — k-means on floats is reduce-order nondeterministic across
  runs/engines, k-means on ints is bit-stable anywhere;
- each Lloyd iteration is: one broadcast of k centroids, one map-side
  nearest-centroid assignment (zip_with/aggregate — codegen, no UDF), one
  (cluster, dim) aggregation; centroids (k×dim ints — index METADATA, not
  data) come back to the driver exactly like any ML model state;
- probing: a query searches only its ``nprobe`` nearest clusters — the
  candidate join is an equi-join on cluster id, linear in corpus size.

The algorithm is iterative, so there is no SQL oracle (rows-only at the
gate); correctness is pinned by tests/test_ivf.py (recall vs brute force,
run-to-run determinism, centroid-update exactness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..checkpoints import ckpt

_QUANT = "transform({col}, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))"
_DIST2 = "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)"


def quantize(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    return emb.select(F.col(id_col), F.expr(_QUANT.format(col=vec_col)).alias("qvec"))


def _assign(vectors: DataFrame, centroids: DataFrame, id_col: str) -> DataFrame:
    """Nearest centroid per vector: broadcast k centroids, map-side dist²,
    deterministic argmin (ties → smallest cluster id)."""
    d = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "dist2", F.expr(_DIST2.format(a="qvec", b="cvec"))
    )
    w = Window.partitionBy(id_col).orderBy("dist2", "cluster_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "qvec", "cluster_id", "dist2")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroid = per-dimension integer mean of the cluster's member
    vectors. ``sum(v) div count(v)`` stays in BIGINT end-to-end — a DOUBLE
    division then truncation would lose exactness once a cluster's
    per-dimension sum exceeds 2^53, breaking the bit-determinism claim
    (round-2 advice)."""
    dims = assigned.select("cluster_id", F.posexplode("qvec").alias("pos", "v"))
    per_dim = dims.groupBy("cluster_id", "pos").agg(
        F.expr("sum(v) div count(v)").alias("cv")
    )
    return per_dim.groupBy("cluster_id").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)").alias("cvec")
    )


def kmeans_lite(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list]:
    """Deterministic Lloyd iterations over quantized vectors. Init:
    centroids = the k smallest ids (deterministic, engine-independent).
    Returns (assignments DataFrame, centroid rows list). Centroids are
    collected per iteration (k×dim ints) and re-broadcast — bounded model
    state, the same pattern as MLlib's driver-held coefficients."""
    spark = emb.sparkSession
    # Materialize the quantized vectors ONCE: the init collect, every
    # Lloyd iteration's _assign, and the final _assign all consume this
    # subtree, and without truncation each re-executes the scan+quantize
    # DAG (round-3 verdict). localCheckpoint, not persist: lineage
    # truncation also keeps the per-iteration plan flat. On a real
    # cluster use a reliable checkpoint() dir so executor loss can't
    # drop blocks mid-iteration.
    vectors = ckpt(quantize(emb, id_col, vec_col))
    init = (
        vectors.orderBy(id_col)
        .limit(k)
        .collect()
    )
    cent_rows = [(i, list(r["qvec"])) for i, r in enumerate(init)]
    for _ in range(iters):
        centroids = spark.createDataFrame(cent_rows, "cluster_id int, cvec array<bigint>")
        assigned = _assign(vectors, centroids, id_col)
        cent_rows = [
            (r["cluster_id"], list(r["cvec"])) for r in _update(assigned).collect()
        ]
        cent_rows.sort()
    centroids = spark.createDataFrame(cent_rows, "cluster_id int, cvec array<bigint>")
    return _assign(vectors, centroids, id_col), cent_rows


def ivf_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 8,
    iters: int = 2,
    nprobe: int = 2,
    topk: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: queries (the ``n_queries`` smallest ids) search only
    their ``nprobe`` nearest clusters; exact quantized cosine ranks the
    candidates. Output: (query_id, cand_id, cosine, rank)."""
    spark = emb.sparkSession
    assigned, cent_rows = kmeans_lite(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    centroids = spark.createDataFrame(cent_rows, "cluster_id int, cvec array<bigint>")

    queries = assigned.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("qq")
    )
    qc = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "dist2", F.expr(_DIST2.format(a="qq", b="cvec"))
    )
    wq = Window.partitionBy("query_id").orderBy("dist2", "cluster_id")
    probes = (
        qc.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qq", "cluster_id")
    )
    dot = "aggregate(zip_with(qq, qvec, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    nrm = "aggregate({v}, 0L, (acc, x) -> acc + x * x)"
    cand = (
        assigned.join(F.broadcast(probes), "cluster_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("cand_id"),
            F.round(
                F.expr(dot)
                / (F.sqrt(F.expr(nrm.format(v="qq"))) * F.sqrt(F.expr(nrm.format(v="qvec")))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "cand_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def _assign_grouped(vectors: DataFrame, centroids: DataFrame, id_col: str) -> DataFrame:
    """Nearest FINE centroid within each vector's own coarse group: an
    equi-join on group_id (per-key candidate set = that group's fine
    centroids), map-side dist², deterministic argmin. Unlike ``_assign``
    the centroid table is a DataFrame joined by key — nothing is
    collected to the driver, so the total centroid count may scale with
    the corpus."""
    d = vectors.join(centroids, "group_id").withColumn(
        "dist2", F.expr(_DIST2.format(a="qvec", b="cvec"))
    )
    w = Window.partitionBy(id_col).orderBy("dist2", "fine_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "group_id", "qvec", "fine_id", "dist2")
    )


def kmeans_grouped(
    vectors: DataFrame,
    k_per_group: int,
    iters: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """Data-parallel k-means WITHIN each group of pre-grouped quantized
    vectors (``group_id``, ``qvec`` columns): the second level of the
    hierarchical (IVF-style) clustering used when total k scales with
    the corpus (SemDeDup's k ∝ n regime). Per Lloyd iteration the cost
    is Σ_g n_g·k_g = n·k_per_group — independent of the number of
    groups — versus flat k-means' n·k_total; with k_total ∝ n that is
    the difference between linear and quadratic total work.

    Same determinism contract as ``kmeans_lite``: init = each group's
    ``k_per_group`` smallest ids, exact BIGINT dist² and integer-mean
    updates, ties → smallest fine_id. Empty fine clusters drop out of
    the update (same behavior as kmeans_lite's collected update).
    Returns ((id, group_id, qvec, fine_id, dist2) assignments, the
    final (group_id, fine_id, cvec) centroid DataFrame they were
    assigned against)."""
    wi = Window.partitionBy("group_id").orderBy(id_col)
    centroids = (
        vectors.withColumn("rn", F.row_number().over(wi))
        .filter(F.col("rn") <= k_per_group)
        .select(
            "group_id", (F.col("rn") - 1).cast("int").alias("fine_id"),
            F.col("qvec").alias("cvec"),
        )
        .transform(ckpt)
    )
    for _ in range(iters):
        assigned = _assign_grouped(vectors, centroids, id_col)
        dims = assigned.select(
            "group_id", "fine_id", F.posexplode("qvec").alias("pos", "v")
        )
        per_dim = dims.groupBy("group_id", "fine_id", "pos").agg(
            F.expr("sum(v) div count(v)").alias("cv")
        )
        centroids = (
            per_dim.groupBy("group_id", "fine_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)"
                ).alias("cvec")
            )
            .transform(ckpt)
        )
    return _assign_grouped(vectors, centroids, id_col), centroids


def kmeans_hierarchical(
    emb: DataFrame,
    k: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-level k-means for the k ∝ corpus regime: a coarse
    ``kmeans_lite`` pass with k1 ≈ √k (driver-held centroids, n·√k per
    iteration) routes each vector to a group, then ``kmeans_grouped``
    refines k2 = ⌈k/k1⌉ fine clusters inside every group (n·√k per
    iteration, centroids stay distributed). Total assignment work is
    n·O(√k) instead of flat k-means' n·k — at SemDeDup's deployment
    scale (k ∝ n) that is the difference between O(n^1.5) and O(n²)
    total work. Returns (id, cluster_id) with cluster_id = coarse·k2 +
    fine (stable composite id)."""
    import math

    k1 = max(2, int(math.isqrt(k)))
    k2 = max(2, math.ceil(k / k1))
    coarse, _ = kmeans_lite(emb, k=k1, iters=iters, id_col=id_col, vec_col=vec_col)
    grouped = ckpt(coarse.select(
        id_col, F.col("cluster_id").alias("group_id"), "qvec"
    ))
    fine, _ = kmeans_grouped(grouped, k_per_group=k2, iters=iters, id_col=id_col)
    return fine.select(
        id_col,
        "qvec",
        (F.col("group_id").cast("bigint") * k2 + F.col("fine_id")).alias("cluster_id"),
    )
