"""IVF ANN tier: integer k-means determinism + probe recall."""

from __future__ import annotations

from data_ingestion_auto_spark.operators.ivf import ivf_topk, kmeans_lite
from data_ingestion_auto_spark.sources.tables import load_table


def test_kmeans_deterministic_across_runs(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _, c1 = kmeans_lite(emb, k=4, iters=2)
    _, c2 = kmeans_lite(emb, k=4, iters=2)
    assert c1 == c2  # exact integer centroids, no float reduce-order drift


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, cents = kmeans_lite(emb, k=4, iters=1)
    n = emb.count()
    rows = assigned.collect()
    assert len(rows) == n
    assert {r["cluster_id"] for r in rows} <= {c[0] for c in cents}


def test_ivf_probe_recall_vs_bruteforce(spark, sf_dir):
    from data_ingestion_auto_spark import plans

    emb = load_table(spark, sf_dir, "embeddings")
    ivf = ivf_topk(emb, n_queries=8, k=8, iters=2, nprobe=2, topk=3).toPandas()
    gt = plans.REGISTRY["embedding_cosine_topk"].spark(spark, sf_dir).toPandas()
    gt3 = gt[gt["rank"] <= 3]
    want = set(zip(gt3.query_id, gt3.cand_id))
    got = set(zip(ivf.query_id, ivf.cand_id))
    recall = len(got & want) / len(want)
    # nprobe=2 of k=8 clusters scans ~25% of the corpus; random embeddings
    # make this a hard fixture — require nontrivial recall and full result
    # shape (3 candidates for every query).
    assert recall > 0.2
    assert len(ivf) == 8 * 3

    # determinism of the full probe output
    ivf2 = ivf_topk(emb, n_queries=8, k=8, iters=2, nprobe=2, topk=3).toPandas()
    assert ivf.equals(ivf2)


def test_hierarchical_kmeans_partitions_and_fine_argmin(spark, sf_dir):
    """Two-level k-means (round 6, the k ∝ corpus regime): every vector
    lands in exactly one composite cluster; determinism across runs; and
    the fine assignment is the true within-group argmin — verified
    against a python brute force over the final fine centroids."""
    from collections import defaultdict

    from data_ingestion_auto_spark.operators.ivf import (
        kmeans_grouped,
        kmeans_hierarchical,
        kmeans_lite,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = kmeans_hierarchical(emb, k=9, iters=2)
    rows = out.collect()
    assert len(rows) == emb.count()  # total partition, one row per vector
    out2 = kmeans_hierarchical(emb, k=9, iters=2).collect()
    assert sorted((r.vec_id, r.cluster_id) for r in rows) == sorted(
        (r.vec_id, r.cluster_id) for r in out2
    )

    # fine argmin check: brute-force the within-group argmin over the
    # EXACT centroids the assignment ran against (kmeans_grouped returns
    # them) — dist2, tie-breaks, and group routing must all agree
    coarse, _ = kmeans_lite(emb, k=3, iters=2)
    import pyspark.sql.functions as F

    grouped = coarse.select(
        "vec_id", F.col("cluster_id").alias("group_id"), "qvec"
    ).localCheckpoint()
    fine, cents_df = kmeans_grouped(grouped, k_per_group=3, iters=2)
    cents = defaultdict(dict)
    for r in cents_df.collect():
        cents[r.group_id][r.fine_id] = list(r.cvec)
    n_checked = 0
    for r in fine.collect():
        best = min(
            (
                (sum((a - b) ** 2 for a, b in zip(r.qvec, cv)), fid)
                for fid, cv in cents[r.group_id].items()
            ),
        )
        assert (best[1], best[0]) == (r.fine_id, r.dist2), r.vec_id
        n_checked += 1
    assert n_checked == emb.count()
