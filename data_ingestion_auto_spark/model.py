"""Declared schemas for the engine's domain tables (FIXTURES.md §B;
SURVEY §1) + deterministic in-memory fixture builders for the
pipeline-semantics tests.

The core datum is the long/tidy grid: one row per (variable, time, level,
cell) — the relational restatement of the reference's xarray Datasets
(SURVEY §1.1). Wide per-variable frames are derived views (pivot) used
where derived-variable math wants plain projections (J2).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

GRID_SCHEMA = T.StructType(
    [
        T.StructField("namespace", T.StringType(), False),
        T.StructField("variable", T.StringType(), False),
        T.StructField("time", T.TimestampType(), False),
        T.StructField("level", T.IntegerType(), True),  # NULL = surface
        T.StructField("y", T.DoubleType(), False),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("value", T.DoubleType(), True),  # NULL = nodata
        T.StructField("units", T.StringType(), True),
    ]
)

VECTOR_SCHEMA = T.StructType(
    [
        T.StructField("date", T.TimestampType(), False),
        T.StructField("geom_type", T.StringType(), False),
        T.StructField("geom_wkt", T.StringType(), False),
        T.StructField("el_val", T.FloatType(), True),
    ]
)

TILES_SCHEMA = T.StructType(
    [
        T.StructField("tile_id", T.StringType(), False),
        T.StructField("file_order", T.IntegerType(), False),
        T.StructField("y", T.DoubleType(), False),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("date", T.TimestampType(), False),
        T.StructField("available", T.BooleanType(), False),
    ]
)

NODATA_SENTINEL = -9999.0


def make_grid(
    spark: SparkSession,
    variables: tuple[str, ...] = ("u", "v"),
    months: int = 36,
    size: int = 8,
    namespace: str = "test_grid",
) -> DataFrame:
    """Deterministic monthly grid: value = f(x, y, month-of-year) with the
    sentinel −9999 planted on one cell per month (FIXTURES.md §B grid)."""
    rows = []
    for m in range(months):
        t = dt.datetime(2020 + m // 12, m % 12 + 1, 1)
        for var in variables:
            for iy in range(size):
                for ix in range(size):
                    y, x = float(iy), float(ix)
                    val = (ix + iy * size) * 0.5 + (m % 12) * 10.0 + (0.0 if var == "u" else 100.0)
                    if ix == 0 and iy == 0:
                        val = NODATA_SENTINEL  # normalized to NULL at scan
                    rows.append((namespace, var, t, None, y, x, val, "m s**-1"))
    return spark.createDataFrame(rows, GRID_SCHEMA)


def make_tiles(spark: SparkSession) -> DataFrame:
    """Overlapping tiles with NULLs in overlap zones to exercise
    first-non-null overlay precedence (FIXTURES.md §B tiles;
    reference convertmodis.py:102-103)."""
    rows = []
    # tile A covers x 0..3, tile B covers x 2..5; overlap x 2..3.
    for ix in range(4):
        rows.append(("h17v08", 1, 0.0, float(ix), 10.0 + ix if ix != 2 else None))
    for ix in range(2, 6):
        rows.append(("h18v08", 2, 0.0, float(ix), 20.0 + ix))
    return spark.createDataFrame(rows, TILES_SCHEMA)


def make_catalog(spark: SparkSession, n_days: int = 5, unavailable_days: tuple[int, ...] = (3,)) -> DataFrame:
    """Remote-availability catalog (FIXTURES.md §B catalog): day k is a 404
    if k ∈ unavailable_days — exercising skip-without-commit (W5)."""
    rows = []
    for k in range(n_days):
        d = dt.datetime(2024, 1, 1) + dt.timedelta(days=k)
        rows.append((f"https://example.org/{d:%Y/%m/%d}/data.grib", d, k not in unavailable_days))
    return spark.createDataFrame(rows, CATALOG_SCHEMA)
