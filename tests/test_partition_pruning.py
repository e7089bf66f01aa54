"""Partition pruning over the engine's partitioned writer (sinks.py) —
the data-skipping property the 100 TB layout depends on: a predicate on
the partition column must become a PartitionFilter (directory-level
skip, zero data-file reads in the excluded partitions), never a
post-scan filter. Zone-map (min/max row-group) skipping is pinned by
the PushedFilters assertions elsewhere; this covers the directory tier.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_auto_spark.sinks import write_partitioned


def test_partition_filter_prunes_directories(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"])

    rd = spark.read.parquet(path)
    n_langs = rd.select("lang").distinct().count()
    assert n_langs >= 3

    one = rd.filter(F.col("lang") == "en")
    plan = one._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # predicate lands in PartitionFilters (directory skip), not only in
    # the row-level Filter
    assert "PartitionFilters" in plan
    assert "isnotnull(lang" in plan
    # and the scan actually READS fewer files than the full table
    # (inputFiles() reports pre-pruning relation files, so measure the
    # files the filtered scan truly touches at runtime)
    read_files = {r[0] for r in one.select(F.input_file_name()).distinct().collect()}
    all_files = {r[0] for r in rd.select(F.input_file_name()).distinct().collect()}
    assert len(read_files) < len(all_files)
    assert all("lang=en" in f for f in read_files)
    # correctness of the pruned read
    assert one.count() == docs.filter(F.col("lang") == "en").count()


def test_partition_pruning_composes_with_column_pruning(spark, sf_dir, tmp_path):
    """Partition skip + column prune together: the pruned scan must read
    only the requested data column (partition values come from the
    directory names, not file bytes)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    path = str(tmp_path / "docs_by_lang2")
    write_partitioned(docs, path, ["lang"])
    q = (
        spark.read.parquet(path)
        .filter(F.col("lang") == "en")
        .select("doc_id")
    )
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "ReadSchema: struct<doc_id:bigint>" in plan
