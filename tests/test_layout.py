"""Z-order clustering: row-group stats must stay narrow on BOTH
interleaved dimensions (that narrowness is exactly what parquet
row-group pruning consumes at scan time)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_ingestion_auto_spark.operators.layout import write_zordered, zorder_key


@pytest.fixture(scope="module")
def points(spark):
    # Deterministic scatter covering [0,317) × [0,293) with no x/y correlation.
    return spark.range(100_000).select(
        (F.col("id") % 317).cast("double").alias("x"),
        ((F.col("id") * 7919) % 293).cast("double").alias("y"),
        F.col("id").alias("payload"),
    )


def _avg_ranges(path: str, col: str) -> float:
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    spans.append(float(c.statistics.max) - float(c.statistics.min))
    assert spans, f"no stats for {col} in {path}"
    return sum(spans) / len(spans)


def test_zorder_tightens_both_dims(spark, points, tmp_path):
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    # Baseline: single-dimension layout (sorted by x only).
    points.repartitionByRange(8, "x").sortWithinPartitions("x").write.parquet(plain)
    write_zordered(points, zord, ["x", "y"], bits=10, files=8)

    # x-sorted layout: x ranges tight, y ranges ~ the full 293 domain.
    assert _avg_ranges(plain, "y") > 250
    # z-ordered: BOTH dims materially tighter than the full domain, and
    # the average pruning AREA (the quantity row-group skipping actually
    # consumes for 2-D predicates) far below it. Thresholds are loose on
    # purpose: repartitionByRange samples its bounds with a seed derived
    # from the RDD id — a session-global counter — so the split points
    # wobble a little depending on how many RDDs earlier tests created;
    # a tight per-dim bound (0.6× was the round-5 value) flakes when a
    # sampled boundary straddles a high z-bit (observed 0.606× mid-suite,
    # green in isolation). The single-sorted baseline can never pass
    # these: its unsorted dim stays ≈ the full domain (asserted above),
    # pinning the qualitative claim without depending on sample luck.
    zx, zy = _avg_ranges(zord, "x"), _avg_ranges(zord, "y")
    assert zx < 317 * 0.8, zx
    assert zy < 293 * 0.8, zy
    assert (zx / 317) * (zy / 293) < 0.3, (zx, zy)


def test_zorder_roundtrip_and_key_bounds(spark, points, tmp_path):
    path = str(tmp_path / "rt")
    write_zordered(points, path, ["x", "y"], bits=10, files=4)
    back = spark.read.parquet(path)
    assert back.count() == points.count()
    # key fits in bits*ncols and is non-negative
    row = back.agg(F.min("_zkey"), F.max("_zkey")).first()
    assert row[0] >= 0 and row[1] < (1 << 20)
    # same rows survive (payload checksum)
    a = points.agg(F.sum("payload")).first()[0]
    b = back.agg(F.sum("payload")).first()[0]
    assert a == b


def test_zorder_key_rejects_overflow(spark, points):
    with pytest.raises(ValueError):
        zorder_key(points, ["x", "y"], bits=32)
