"""Format round-trips: every supported format must preserve rows and
types through write→read on a real table, including gzip'd text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_auto_spark.sources.formats import read_table, write_table
from data_ingestion_auto_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("n_nationkey").collect()]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip(spark, nation, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_table(nation, path, fmt)
    back = read_table(spark, path, fmt, schema=nation.schema)
    assert back.schema == nation.schema
    assert _sorted_rows(back) == _sorted_rows(nation)


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_gzip_text_roundtrip(spark, nation, tmp_path, fmt):
    path = str(tmp_path / f"{fmt}_gz")
    write_table(nation, path, fmt, compression="gzip")
    back = read_table(spark, path, fmt, schema=nation.schema)
    assert _sorted_rows(back) == _sorted_rows(nation)


def test_text_formats_require_schema(spark, nation, tmp_path):
    path = str(tmp_path / "noschema")
    write_table(nation, path, "csv")
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, path, "csv")


def test_orc_filter_pushdown(spark, nation, tmp_path):
    """ORC scans must push predicates to stripe stats like parquet does."""
    path = str(tmp_path / "orc_pd")
    write_table(nation, path, "orc")
    df = read_table(spark, path, "orc").filter(F.col("n_nationkey") == 7)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters" in plan and "n_nationkey" in plan.split("PushedFilters")[1][:200]
    assert df.count() == 1
