"""Fixture-table readers.

The engine's storage model is partitioned parquet (schema-on-read, columnar,
predicate pushdown + column pruning for free). At 100 TB these reads become
multi-file partitioned scans; nothing here assumes single files — the paths
are just what the test harness provides.

Reference parity: the reference opens NetCDF/GeoTIFF into arrays
(reference ingest/ecmwf_opendata/__init__.py:296, SURVEY S6); here a scan is
``spark.read.parquet`` and Catalyst prunes columns/partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any scale factor: their
# cardinality is fixed (or near-fixed) by the schema, not the data volume.
BROADCAST_TABLES = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver passes a vanilla session: every timezone-sensitive expression
    # (timestamp_micros casts, unix_micros epochs, date_format over LTZ) must
    # see UTC or the DuckDB hash comparison shifts on a non-UTC JVM default.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # The caller may hand us a vanilla session (the driver does); the
        # nanos-timestamp parquet type needs this runtime conf to scan.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS): read as nanos-since-epoch long
    # (spark.sql.legacy.parquet.nanosAsLong), floor-truncated here to
    # microseconds — matching DuckDB's TIMESTAMP_NS→TIMESTAMP cast — as a
    # naive (ntz) timestamp.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (idempotent).

    Lets operators be written in either DataFrame or SQL form against the
    same names DuckDB's oracle uses.
    """
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
