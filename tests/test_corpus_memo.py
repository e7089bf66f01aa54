"""_corpus_memo staleness + publication contract (plans/dedup.py):
the memo key carries the source table's file fingerprint, so a changed
corpus REBUILDS instead of serving stale values, and publication is
atomic via private build dirs."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from data_ingestion_auto_spark.plans.dedup import _corpus_memo


def _mini_sf(spark, tmp_path, name, rows):
    sf = tmp_path / name
    sf.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(sf / "documents.parquet"))
    return str(sf)


def test_changed_corpus_rebuilds_unchanged_corpus_reuses(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CC_MEMO_DIR", str(tmp_path / "memo"))
    os.makedirs(str(tmp_path / "memo"))
    sf = _mini_sf(spark, tmp_path, "sfA", [(1, "aa"), (2, "bb")])

    builds = []

    def build():
        builds.append(1)
        return spark.read.parquet(f"{sf}/documents.parquet").select(
            "doc_id", F.length("text").alias("n")
        )

    got = _corpus_memo(spark, sf, "t1", build)
    assert sorted((r.doc_id, r.n) for r in got.collect()) == [(1, 2), (2, 2)]
    assert builds == [1]
    # unchanged corpus: second call reuses the published memo (no rebuild)
    _corpus_memo(spark, sf, "t1", build).collect()
    assert builds == [1]

    # changed corpus (same directory name, new content → new fingerprint):
    # the memo MUST rebuild, not serve the stale two-row table
    src = f"{sf}/documents.parquet"
    spark.createDataFrame(
        [(1, "aaaa"), (2, "bb"), (3, "c")], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(src + ".new")
    shutil.rmtree(src)
    os.rename(src + ".new", src)
    got2 = _corpus_memo(spark, sf, "t1", build)
    assert builds == [1, 1]
    assert sorted((r.doc_id, r.n) for r in got2.collect()) == [(1, 4), (2, 2), (3, 1)]


def test_same_second_same_size_regeneration_rebuilds(spark, tmp_path, monkeypatch):
    """Review r12: a corpus regenerated in place with EQUAL total bytes
    (content swapped between files, mtimes unchanged at second
    granularity) must still rebuild — the fingerprint hashes per-file
    (relpath, size, mtime_ns), not just totals."""
    monkeypatch.setenv("SPARK_GRAFT_CC_MEMO_DIR", str(tmp_path / "memo3"))
    os.makedirs(str(tmp_path / "memo3"))
    sf = _mini_sf(spark, tmp_path, "sfC", [(1, "ab"), (2, "cd")])
    src = f"{sf}/documents.parquet"

    builds = []

    def build():
        builds.append(1)
        return spark.read.parquet(src).select("doc_id", "text")

    first = {(r.doc_id, r.text) for r in _corpus_memo(spark, sf, "t3", build).collect()}
    assert first == {(1, "ab"), (2, "cd")}
    # regenerate with the same row widths (≈ same bytes) and force every
    # file's mtime to a FIXED whole second so the old bytes+max-int-mtime
    # key could not distinguish the two corpora
    spark.createDataFrame(
        [(1, "xy"), (2, "zw")], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(src + ".new")
    shutil.rmtree(src)
    os.rename(src + ".new", src)
    stamp = int(os.stat(src).st_mtime) + 2
    for root, _, files in os.walk(src):
        for f in files:
            os.utime(os.path.join(root, f), (stamp, stamp))
    os.utime(src, (stamp, stamp))
    got2 = {(r.doc_id, r.text) for r in _corpus_memo(spark, sf, "t3", build).collect()}
    assert builds == [1, 1]
    assert got2 == {(1, "xy"), (2, "zw")}


def test_ann_model_memo_matches_live_kmeans(spark, tmp_path, monkeypatch):
    """plans/ann_memo.py (round-12): the memoized kmeans_lite model is
    BIT-IDENTICAL to the live derivation (exact BIGINT k-means), and the
    second call serves the memo without retraining."""
    from data_ingestion_auto_spark.operators.ivf import kmeans_lite
    from data_ingestion_auto_spark.plans.ann_memo import kml_model

    monkeypatch.setenv("SPARK_GRAFT_CC_MEMO_DIR", str(tmp_path / "memo4"))
    os.makedirs(str(tmp_path / "memo4"))
    sf = tmp_path / "sfD"
    sf.mkdir()
    rows = [(i, [float((i * 7 + d * 3) % 11) / 10 for d in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    emb.coalesce(1).write.mode("overwrite").parquet(str(sf / "embeddings.parquet"))

    trains = []

    def emb_builder():
        trains.append(1)
        return spark.read.parquet(str(sf / "embeddings.parquet"))

    assigned, cents = kml_model(spark, str(sf), "t", emb_builder, k=4)
    live_assigned, live_cents = kmeans_lite(
        spark.read.parquet(str(sf / "embeddings.parquet")), k=4, iters=2
    )
    memo = {(r.vec_id, r.cluster_id, tuple(r.qvec)) for r in assigned.collect()}
    live = {
        (r.vec_id, r.cluster_id, tuple(r.qvec))
        for r in live_assigned.select("vec_id", "qvec", "cluster_id").collect()
    }
    assert memo == live
    assert {(r.cluster_id, tuple(r.cvec)) for r in cents.collect()} == {
        (c, tuple(v)) for c, v in live_cents
    }
    n_trains = len(trains)
    assert n_trains >= 1
    a2, c2 = kml_model(spark, str(sf), "t", emb_builder, k=4)  # warm: no retrain
    a2.collect(), c2.collect()
    assert len(trains) == n_trains


def test_wide_memo_read_parallelism_guaranteed(spark, tmp_path, monkeypatch):
    """Round-12 soak catch, pinned: a memo built with ``partitions=N``
    must come BACK with ≥N partitions even though the files are tiny —
    AQE coalesces the build and maxPartitionBytes PACKS small files into
    one split, and a consumer whose join expands the memoized rows then
    runs the whole expansion in one task (incremental_ann_assign sat
    >12 min single-task at zipf-10× before the fix)."""
    monkeypatch.setenv("SPARK_GRAFT_CC_MEMO_DIR", str(tmp_path / "memo5"))
    os.makedirs(str(tmp_path / "memo5"))
    sf = _mini_sf(spark, tmp_path, "sfE", [(i, "x" * 10) for i in range(100)])
    n = spark.sparkContext.defaultParallelism

    def build():
        return spark.read.parquet(f"{sf}/documents.parquet")

    got = _corpus_memo(spark, sf, "t5", build, partitions=n)
    assert got.rdd.getNumPartitions() >= n
    assert got.count() == 100
    # warm read honors the same guarantee
    again = _corpus_memo(spark, sf, "t5", build, partitions=n)
    assert again.rdd.getNumPartitions() >= n
    # and a no-partitions memo keeps its natural (packed) layout
    plain = _corpus_memo(spark, sf, "t5b", build)
    assert plain.count() == 100


def test_publication_is_rename_atomic(spark, tmp_path, monkeypatch):
    """The published dir appears only complete (Spark's _SUCCESS inside);
    no shared '.building' path exists that a second builder could write
    into after a winner renames."""
    memo_root = str(tmp_path / "memo2")
    monkeypatch.setenv("SPARK_GRAFT_CC_MEMO_DIR", memo_root)
    os.makedirs(memo_root)
    sf = _mini_sf(spark, tmp_path, "sfB", [(1, "x")])
    _corpus_memo(
        spark, sf, "t2", lambda: spark.read.parquet(f"{sf}/documents.parquet")
    ).collect()
    entries = os.listdir(memo_root)
    assert len(entries) == 1 and entries[0].startswith("spark_graft_t2_")
    assert "_SUCCESS" in os.listdir(os.path.join(memo_root, entries[0]))
    assert not [e for e in entries if ".building" in e]  # no shared tmp left
