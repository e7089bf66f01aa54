"""Contour grouped-map UDTF (SURVEY U2): one grid in → many line features
out via applyInPandas."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_ingestion_auto_spark.model import GRID_SCHEMA
from data_ingestion_auto_spark.operators.contour import contour_features


def _ramp_grid(spark, size=6):
    """value = x*10: vertical iso-lines at each multiple of the interval."""
    t = dt.datetime(2024, 1, 1)
    rows = [
        ("ns", "2t", t, None, float(iy), float(ix), ix * 10.0, "degC")
        for iy in range(size)
        for ix in range(size)
    ]
    return spark.createDataFrame(rows, GRID_SCHEMA)


def test_contour_emits_linestrings(spark):
    out = contour_features(_ramp_grid(spark), interval=10.0)
    rows = out.collect()
    assert rows, "ramp grid must produce contours"
    assert all(r.geom_type == "LineString" for r in rows)
    assert all(r.geom_wkt.startswith("LINESTRING (") for r in rows)
    levels = sorted({r.level_value for r in rows})
    # ramp 0..50, interval 10 → interior levels only
    assert levels == [10.0, 20.0, 30.0, 40.0]


def test_contour_level_position(spark):
    """Level-30 contour on value=x*10 sits at x=3.0 for every segment."""
    out = contour_features(_ramp_grid(spark), interval=10.0)
    segs = out.filter(F.col("level_value") == 30.0).collect()
    for r in segs:
        coords = r.geom_wkt.replace("LINESTRING (", "").rstrip(")").split(", ")
        xs = [float(c.split()[0]) for c in coords]
        assert all(abs(x - 3.0) < 1e-6 for x in xs)


def test_contour_nodata_cells_produce_no_segments(spark):
    t = dt.datetime(2024, 1, 1)
    rows = [
        ("ns", "2t", t, None, float(iy), float(ix), None, "degC")
        for iy in range(4)
        for ix in range(4)
    ]
    grid = spark.createDataFrame(rows, GRID_SCHEMA)
    assert contour_features(grid, interval=5.0).count() == 0


def test_contour_multi_surface_rows_are_attributable(spark):
    """Two pressure levels of one variable/time → output carries the
    grouping identity columns so each segment maps to exactly one surface
    (review r12: without them the interleaved rows had no join key)."""
    t = dt.datetime(2024, 1, 1)
    rows = [
        ("ns", "2t", t, lev, float(iy), float(ix), ix * 10.0 + float(lev), "degC")
        for lev in (850, 500)
        for iy in range(4)
        for ix in range(4)
    ]
    grid = spark.createDataFrame(rows, GRID_SCHEMA)
    out = contour_features(grid, interval=10.0)
    assert "namespace" in out.columns and "level" in out.columns
    per_level = {r["level"]: r["count"] for r in out.groupBy("level").count().collect()}
    assert set(per_level) == {850, 500}
    assert all(n > 0 for n in per_level.values())


def test_contour_groups_are_independent(spark):
    """Two timestamps → grouped-map runs per (variable, time)."""
    g1 = _ramp_grid(spark)
    g2 = g1.withColumn("time", F.lit(dt.datetime(2024, 1, 2)).cast("timestamp"))
    out = contour_features(g1.unionByName(g2), interval=10.0)
    per_time = out.groupBy("time").count().collect()
    assert len(per_time) == 2
    assert per_time[0]["count"] == per_time[1]["count"]
