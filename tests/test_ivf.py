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
