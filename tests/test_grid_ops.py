"""Grid-domain operator semantics (SURVEY J1/J2/J4/A1/A2/P4/P5 + §7.4's
hard parts: null-vs-sentinel, anomaly null propagation, mosaic overlay
precedence)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestion_auto_spark.model import NODATA_SENTINEL, make_catalog, make_grid, make_tiles
from data_ingestion_auto_spark.operators.grid import (
    anomaly_join,
    climatology_normal,
    derived_wide,
    extent_union,
    latest_available,
    mosaic_coalesce,
    normalize_nodata,
    materialize_nodata,
)


def test_normalize_nodata_sentinel_and_nan(spark):
    df = spark.createDataFrame(
        [(1.0,), (NODATA_SENTINEL,), (float("nan"),), (None,)], "value double"
    )
    out = normalize_nodata(df).collect()
    assert [r.value for r in out] == [1.0, None, None, None]
    back = materialize_nodata(normalize_nodata(df)).collect()
    assert [r.value for r in back] == [1.0, NODATA_SENTINEL, NODATA_SENTINEL, NODATA_SENTINEL]


def test_climatology_mean_ignores_nodata(spark):
    """A1: per-(cell, month-of-year) mean over years; masked cells don't
    contribute (chirps mask semantics)."""
    grid = normalize_nodata(make_grid(spark, variables=("u",), months=36))
    normal = climatology_normal(grid, "u")
    row = normal.filter((F.col("moy") == 1) & (F.col("y") == 1.0) & (F.col("x") == 1.0)).collect()[0]
    # cell (1,1) value = (1 + 8)*0.5 + 0*10 = 4.5 every January → mean 4.5
    assert row.normal == 4.5
    # sentinel cell (0,0) is NULL in every month → normal NULL
    sent = normal.filter((F.col("moy") == 1) & (F.col("y") == 0.0) & (F.col("x") == 0.0)).collect()[0]
    assert sent.normal is None


def test_anomaly_null_semantics(spark):
    """J1: cell null in either input ⇒ anomaly null (SURVEY §5 test list)."""
    grid = normalize_nodata(make_grid(spark, variables=("u",), months=24))
    normal = climatology_normal(grid, "u")
    current = grid.filter(F.date_format("time", "yyyy-MM") == "2021-03")
    res = anomaly_join(current, normal)
    ok = res.filter((F.col("y") == 2.0) & (F.col("x") == 3.0)).collect()[0]
    assert ok.anomaly is not None and abs(ok.anomaly) < 1e-9  # deterministic grid: cur == normal
    nul = res.filter((F.col("y") == 0.0) & (F.col("x") == 0.0)).collect()[0]
    assert nul.current is None and nul.anomaly is None


def test_derived_wide_wind_speed(spark):
    """J2/F2: wide pivot + sqrt(u²+v²) projection, no self-join."""
    grid = normalize_nodata(make_grid(spark, variables=("u", "v"), months=1))
    wide = derived_wide(grid)
    r = wide.filter((F.col("y") == 1.0) & (F.col("x") == 2.0)).collect()[0]
    assert math.isclose(r.wind_speed, math.sqrt(r.u**2 + r.v**2))
    # sentinel cell: u,v NULL → wind_speed NULL
    s = wide.filter((F.col("y") == 0.0) & (F.col("x") == 0.0)).collect()[0]
    assert s.wind_speed is None


def test_mosaic_first_non_null_wins(spark):
    """J4: overlay precedence — first tile in file_order wins unless its
    cell is nodata, then the later tile fills it (convertmodis.py:102-103).
    """
    out = {(r.y, r.x): (r.value, r.source_tile) for r in mosaic_coalesce(make_tiles(spark)).collect()}
    assert out[(0.0, 0.0)] == (10.0, "h17v08")  # only tile A
    assert out[(0.0, 3.0)] == (13.0, "h17v08")  # overlap, A non-null → A wins
    assert out[(0.0, 2.0)] == (22.0, "h18v08")  # overlap, A is nodata → B fills
    assert out[(0.0, 5.0)] == (25.0, "h18v08")  # only tile B


def test_extent_union(spark):
    r = extent_union(make_tiles(spark)).collect()[0]
    assert (r.xmin, r.xmax, r.ymin, r.ymax) == (0.0, 5.0, 0.0, 0.0)


def test_latest_available_skips_missing(spark):
    """S4/W5: day 3 is a 404 → latest is day 4 only if available; here day
    4 (index 4) is available, day 3 (index 3) is not."""
    cat = make_catalog(spark, n_days=5, unavailable_days=(4,))
    r = latest_available(cat).collect()[0]
    assert r.latest.day == 4  # day index 3 (Jan 4) is the latest available
