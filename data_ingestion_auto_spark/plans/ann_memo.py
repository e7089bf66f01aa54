"""Memoized k-means / quantizer MODEL TABLES for the embedding family
(round-12 verdict #2: the `_corpus_memo` pattern — plans/dedup.py — applied
to the frozen centroid/codebook/assignment tables that `semdedup_clusters`,
`semdedup_hier`, `hierarchical_kmeans_assign`, `incremental_ann_assign`,
`pq_adc_topk`, `ivfpq_adc_topk` and `ann_ivf_probe` each re-derived per
query, ~4.5–5.4 s calibrated apiece at sf0.1).

This IS the production shape, not a benchmark trick: a 100 TB vector
pipeline trains its quantizer ONCE per corpus version and serves every
downstream query from the stored model/index — exactly what
`operators/ivf.py::write_ivf_index` proves on the operator side. The memo
key is the EMBEDDINGS table's file fingerprint (count + per-file
path/size/mtime_ns hash) + the shared `_MEMO_VERSION`, so a regenerated
corpus or a changed algorithm rebuilds; results are bit-identical to the
live derivation because the k-means tiers are exact BIGINT arithmetic
(pinned in tests/test_ivf.py), so every consumer's oracle hash is
unchanged.

Each (assignments, centroids) pair shares ONE training run on a cold memo
via the `shared` dict — the second memo's build reuses the first's model
instead of re-running Lloyd iterations; on a crash between the two
publishes the survivor retrains, which is rare and correct.

CONTRACT: the (variant, k, iters) triple IS the model's identity — the
``emb_builder``/``sub_builder`` passed for a given variant must be a pure
function of the fingerprinted embeddings table (the key cannot see the
builder's code). Registering a new training frame means a new variant
name, exactly like `_MEMO_VERSION` for algorithm changes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .dedup import _corpus_memo
from .helpers import T

_CENT_SCHEMA = "cluster_id int, cvec array<bigint>"


def _emb_memo(spark, sf_dir, name, build, wide: bool = False):
    """``wide=True`` for the corpus-sized assignment/code tables: they
    feed EXPANSION joins (probe lists × queries, codes × query distance
    tables), so the memo must come back with full read parallelism —
    see `_corpus_memo(partitions=...)`. Centroid/codebook tables stay
    single-file (bounded model state, broadcast by consumers)."""
    parts = spark.sparkContext.defaultParallelism if wide else None
    return _corpus_memo(
        spark, sf_dir, name, build, src_file="embeddings.parquet", partitions=parts
    )


# --- corpus frames the models are trained on -------------------------------


def emb_full(spark, sf_dir):
    """The raw embeddings corpus as (vec_id, embedding double[])."""
    return T(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
    )


# --- kmeans_lite (flat, driver-held centroids) ------------------------------


def kml_model(spark, sf_dir, variant: str, emb_builder, k: int, iters: int = 2):
    """Memoized ``kmeans_lite`` model: returns (assignments (vec_id, qvec,
    cluster_id), centroids (cluster_id, cvec)) — both parquet memo reads
    after the first call per corpus version."""
    from ..operators.ivf import kmeans_lite

    shared = {}

    def _train():
        if "a" not in shared:
            shared["a"], shared["c"] = kmeans_lite(emb_builder(), k=k, iters=iters)
        return shared

    tag = f"{variant}_k{k}i{iters}"
    assigned = _emb_memo(
        spark,
        sf_dir,
        f"kml_{tag}_assign",
        lambda: _train()["a"].select("vec_id", "qvec", "cluster_id"),
        wide=True,
    )
    cents = _emb_memo(
        spark,
        sf_dir,
        f"kml_{tag}_cents",
        lambda: spark.createDataFrame(_train()["c"], _CENT_SCHEMA).coalesce(1),
    )
    return assigned, cents


# --- kmeans_grouped (distributed fine centroids) ----------------------------


def kmg_model(spark, sf_dir, variant: str, sub_builder, k_per_group: int, iters: int = 2):
    """Memoized ``kmeans_grouped`` model over a pre-grouped (rid, group_id,
    qvec) frame: returns (codes (rid, group_id, fine_id), centroids
    (group_id, fine_id, cvec))."""
    from ..operators.ivf import kmeans_grouped

    shared = {}

    def _train():
        if "a" not in shared:
            shared["a"], shared["c"] = kmeans_grouped(
                sub_builder(), k_per_group=k_per_group, iters=iters, id_col="rid"
            )
        return shared

    tag = f"{variant}_k{k_per_group}i{iters}"
    codes = _emb_memo(
        spark,
        sf_dir,
        f"kmg_{tag}_codes",
        lambda: _train()["a"].select("rid", "group_id", "fine_id"),
        wide=True,
    )
    cents = _emb_memo(spark, sf_dir, f"kmg_{tag}_cents", lambda: _train()["c"])
    return codes, cents


# --- kmeans_hierarchical (two-level composite ids) --------------------------


def kmh_assign(spark, sf_dir, variant: str, emb_builder, k: int, iters: int = 2):
    """Memoized ``kmeans_hierarchical`` assignment table (vec_id, qvec,
    cluster_id) — the composite coarse·k2+fine ids."""
    from ..operators.ivf import kmeans_hierarchical

    return _emb_memo(
        spark,
        sf_dir,
        f"kmh_{variant}_k{k}i{iters}_assign",
        lambda: kmeans_hierarchical(emb_builder(), k=k, iters=iters),
        wide=True,
    )
