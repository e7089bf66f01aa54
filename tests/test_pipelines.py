"""End-to-end pipeline recompositions (SURVEY §3 restated): forecast batch
with skip/commit/retention; CHIRPS anomaly batch with memoized normals."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_ingestion_auto_spark.model import make_catalog, make_grid
from data_ingestion_auto_spark.pipelines import (
    ECMWF_FORECAST,
    run_anomaly_batch,
    run_forecast_batch,
    CHIRPS_RAINFALL,
)
from data_ingestion_auto_spark.state import StateStore


def _forecast_grid(spark):
    # 2 variables the spec converts + u/v for the derived param
    g = make_grid(spark, variables=("2t", "tp", "msl", "u", "v"), months=3, namespace="ecmwf_forecast")
    return g


def test_forecast_batch_ingests_then_skips(spark, tmp_path):
    grid = _forecast_grid(spark)
    catalog = make_catalog(spark, n_days=1, unavailable_days=())
    # make the catalog's latest date match the newest grid month
    latest_time = grid.agg(F.max("time")).collect()[0][0]
    catalog = spark.createDataFrame([("u", latest_time, True)], "url string, date timestamp, available boolean")
    state = StateStore(str(tmp_path / "state.json"))
    out = str(tmp_path / "out")

    r1 = run_forecast_batch(grid, catalog, ECMWF_FORECAST, state, out)
    assert r1["status"] == "ingested"
    # W3: second tick with unchanged source skips
    r2 = run_forecast_batch(grid, catalog, ECMWF_FORECAST, state, out)
    assert r2["status"] == "skipped"

    written = spark.read.parquet(out)
    vars_written = {r.variable for r in written.select("variable").distinct().collect()}
    assert vars_written == {"2t", "tp", "msl", "wind"}
    # F1: K→°C applied (raw 2t values are ~0-120; converted ≈ -273..-150)
    t2 = written.filter(F.col("variable") == "2t").agg(F.max("value")).collect()[0][0]
    assert t2 < 0


def test_forecast_batch_idempotent_republication(spark, tmp_path):
    """W9: forcing a re-run of the same date (fresh state) must not
    duplicate rows — dynamic partition overwrite."""
    grid = _forecast_grid(spark)
    latest_time = grid.agg(F.max("time")).collect()[0][0]
    catalog = spark.createDataFrame([("u", latest_time, True)], "url string, date timestamp, available boolean")
    out = str(tmp_path / "out")
    s1 = StateStore(str(tmp_path / "s1.json"))
    s2 = StateStore(str(tmp_path / "s2.json"))
    run_forecast_batch(grid, catalog, ECMWF_FORECAST, s1, out)
    n1 = spark.read.parquet(out).count()
    run_forecast_batch(grid, catalog, ECMWF_FORECAST, s2, out)  # fresh state → re-publishes
    assert spark.read.parquet(out).count() == n1


def test_anomaly_batch_memoizes_normals(spark, tmp_path):
    grid = make_grid(spark, variables=("rfe",), months=36, namespace="chirps_rainfall")
    state = StateStore(str(tmp_path / "state.json"))
    normals = str(tmp_path / "normals")
    res = run_anomaly_batch(grid, CHIRPS_RAINFALL, state, normals, "2022-02")
    rows = res.collect()
    assert len(rows) == 64  # 8x8 grid
    # deterministic fixture: current equals its own climatology → anomaly 0
    non_null = [r for r in rows if r.anomaly is not None]
    assert non_null and all(abs(r.anomaly) < 1e-9 for r in non_null)
    # sentinel cell stays null through join (J1 null semantics)
    assert any(r.anomaly is None for r in rows)
    # W7: normals path memoized in state
    assert state.get("chirps_rainfall", "monthly_normals.02") is not None
    assert os.path.isdir(state.get("chirps_rainfall", "monthly_normals.02"))
    # second batch reuses the memoized normals (same result)
    res2 = run_anomaly_batch(grid, CHIRPS_RAINFALL, state, normals, "2022-02")
    assert res2.count() == 64
