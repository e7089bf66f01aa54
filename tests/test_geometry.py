"""U3 linestring fix properties (VERDICT.md round-1 item #7): simplicity
detection, Douglas-Peucker tolerance guarantee, endpoint preservation,
the reference's only-simplify-when-not-simple rule, coordinate clamping."""

from __future__ import annotations

import numpy as np
import pytest

from data_ingestion_auto_spark.operators.geometry import (
    clamp_coords,
    dp_simplify,
    fix_linestring,
    is_simple,
    parse_wkt_linestring,
    simplify_linestrings,
    to_wkt_linestring,
)


def _dist_to_polyline(p, line):
    best = np.inf
    for a, b in zip(line[:-1], line[1:]):
        ab = b - a
        t = 0.0 if (ab == 0).all() else np.clip(np.dot(p - a, ab) / np.dot(ab, ab), 0, 1)
        best = min(best, float(np.hypot(*(p - (a + t * ab)))))
    return best


def test_wkt_roundtrip():
    pts = np.array([[1.5, -2.25], [3.0, 4.0]])
    assert np.allclose(parse_wkt_linestring(to_wkt_linestring(pts)), pts)
    with pytest.raises(ValueError):
        parse_wkt_linestring("POINT (1 2)")


def test_is_simple():
    square = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    assert is_simple(square)
    bowtie = np.array([[0, 0], [1, 1], [1, 0], [0, 1]], dtype=float)  # crosses itself
    assert not is_simple(bowtie)
    ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)  # closed ok
    assert is_simple(ring)
    # closed ring whose CLOSING segment doubles back over segment 0: the
    # wraparound junction is adjacent too (review r12) — shapely non-simple
    retrace_ring = np.array([[0, 0], [2, 0], [2, 2], [1, 0], [0, 0]], dtype=float)
    assert not is_simple(retrace_ring)
    # closing segment overshooting the whole first segment — the
    # wraparound retrace predicate fires directly (cross=0, dot<0 at p0)
    overshoot = np.array([[0, 0], [2, 0], [2, 2], [3, 0], [0, 0]], dtype=float)
    assert not is_simple(overshoot)


def test_dp_collinear_collapses_to_endpoints():
    line = np.array([[float(i), 0.0] for i in range(10)])
    out = dp_simplify(line, 0.001)
    assert len(out) == 2
    np.testing.assert_array_equal(out, line[[0, -1]])


def test_dp_preserves_large_features():
    zigzag = np.array([[0, 0], [1, 1], [2, 0], [3, 1], [4, 0]], dtype=float)
    out = dp_simplify(zigzag, 0.001)
    np.testing.assert_array_equal(out, zigzag)  # amplitude 1 ≫ tol


def test_dp_tolerance_band_property():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = rng.integers(5, 60)
        pts = np.cumsum(rng.normal(scale=0.01, size=(n, 2)), axis=0)
        tol = 0.02
        out = dp_simplify(pts, tol)
        # endpoints preserved
        np.testing.assert_array_equal(out[0], pts[0])
        np.testing.assert_array_equal(out[-1], pts[-1])
        # every dropped point is within tol of the simplified chain
        for p in pts:
            assert _dist_to_polyline(p, out) <= tol + 1e-12


def test_fix_only_simplifies_non_simple():
    collinear = np.array([[0, 0], [1, 0.0001], [2, 0]], dtype=float)  # simple
    fixed, was_simple = fix_linestring(collinear)
    assert was_simple and len(fixed) == 3  # untouched despite being DP-collapsible
    bowtie = np.array([[0, 0], [1, 1], [1, 0], [0, 1], [0.5, 0.5001]], dtype=float)
    fixed2, was_simple2 = fix_linestring(bowtie)
    assert not was_simple2 and len(fixed2) <= len(bowtie)


def test_clamp():
    pts = np.array([[-190.0, 95.0], [181.0, -91.0], [10.0, 10.0]])
    out = clamp_coords(pts)
    assert out[:, 0].min() >= -180 and out[:, 0].max() <= 180
    assert out[:, 1].min() >= -90 and out[:, 1].max() <= 90
    np.testing.assert_array_equal(out[2], pts[2])


def test_simplify_linestrings_dataframe(spark):
    rows = [
        (1, "LINESTRING (0.000000 0.000000, 1.000000 0.000000, 2.000000 0.000000)"),
        (2, "LINESTRING (0.0 0.0, 1.0 1.0, 1.0 0.0, 0.0 1.0)"),  # bowtie
    ]
    df = spark.createDataFrame(rows, "line_id long, wkt string")
    out = {r["line_id"]: r for r in simplify_linestrings(df).collect()}
    assert out[1]["was_simple"] and out[1]["n_points_out"] == 3
    assert not out[2]["was_simple"] and out[2]["n_points_out"] <= 4
    assert out[2]["wkt"].startswith("LINESTRING (0.000000 0.000000")
