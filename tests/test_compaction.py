"""Small-files compaction (operators/layout.py::compact_parquet_dir):
content-preserving, file-count-reducing, size-targeted."""

from __future__ import annotations

from data_ingestion_auto_spark.operators.layout import compact_parquet_dir


def test_compaction_preserves_rows_and_reduces_files(spark, tmp_path):
    p = str(tmp_path / "many")
    df = spark.range(0, 20_000).selectExpr(
        "id", "id % 7 AS k", "repeat('x', 50) AS pad"
    )
    df.repartition(64).write.parquet(p)  # 64 tiny files
    want = sorted((r.id, r.k) for r in spark.read.parquet(p).collect())

    stats = compact_parquet_dir(spark, p, target_mb=128)
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1  # well under one 128 MB target
    got = sorted((r.id, r.k) for r in spark.read.parquet(p).collect())
    assert got == want
    # staging dir is gone (swap completed)
    import os

    assert not os.path.exists(p + "__compact_staging")


def test_compaction_respects_size_target(spark, tmp_path):
    """A tiny target must yield multiple output files: the file count
    tracks ceil(bytes / target), not a hardcoded 1."""
    p = str(tmp_path / "sized")
    spark.range(0, 60_000).selectExpr(
        "id", "repeat('y', 200) AS pad"
    ).repartition(32).write.parquet(p)
    import math

    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(p)
    fs = jpath.getFileSystem(hconf)
    total = sum(
        st.getLen()
        for st in fs.listStatus(jpath)
        if st.isFile() and not st.getPath().getName().startswith("_")
    )
    target_mb = 1
    expect = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    stats = compact_parquet_dir(spark, p, target_mb=target_mb, sort_by=["id"])
    assert stats["files_after"] == expect, stats
    # sorted-within-partition layout: every file's ids are locally sorted
    rows = spark.read.parquet(p).count()
    assert rows == 60_000
