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
