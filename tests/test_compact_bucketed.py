"""Bucketed-index compaction (operators/layout.py::compact_bucketed_table):
file count collapses to ~buckets, content and probe results are
untouched, and the exchange-free probe layout survives."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_auto_spark.operators import dedup as D
from data_ingestion_auto_spark.operators.layout import compact_bucketed_table


def _banded(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return D.band_signature(D.minhash_signature(D.shingles(docs))).localCheckpoint()


def test_compaction_shrinks_files_preserves_probe(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    base, batches = rows[:300], [rows[300:360], rows[360:420], rows[420:]]

    idx = "t_compact_idx"
    spark.sql(f"DROP TABLE IF EXISTS {idx}")
    D.write_band_index(_banded(spark, base), idx, buckets=8, path=str(tmp_path / "ci"))
    for b in batches:
        D.write_band_index(_banded(spark, b), idx, buckets=8, mode="append")

    probe_rows = _banded(spark, batches[-1])
    before = sorted(
        (r.doc_id, r.dup_of, r.is_dup)
        for r in D.probe_band_index(spark, probe_rows, idx).collect()
    )
    content_before = sorted(
        (r.doc_id, r.band, r.band_hash) for r in spark.table(idx).collect()
    )

    stats = compact_bucketed_table(
        spark,
        idx,
        bucket_cols=["band", "band_hash"],
        sort_cols=["band", "band_hash", "doc_id"],
        buckets=8,
        path=str(tmp_path / "ci_compact"),
    )
    # 1 base write + 3 appends produced strictly more files than buckets;
    # compaction lands one file per bucket
    assert stats["files_before"] > 8
    assert stats["files_after"] == 8

    content_after = sorted(
        (r.doc_id, r.band, r.band_hash) for r in spark.table(idx).collect()
    )
    assert content_after == content_before
    after = sorted(
        (r.doc_id, r.dup_of, r.is_dup)
        for r in D.probe_band_index(spark, probe_rows, idx).collect()
    )
    assert after == before

    # the exchange-free probe physics survive the rewrite
    p = D.probe_band_index(spark, probe_rows, idx)._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in p
