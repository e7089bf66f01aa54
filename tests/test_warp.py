"""U4 warp/resample kernel invariants (VERDICT.md round-1 item #4):
identity round-trip, bilinear exactness on a linear ramp, nearest
semantics, nodata poisoning, kernel-option surface parity."""

from __future__ import annotations

import numpy as np
import pytest

from data_ingestion_auto_spark.operators.warp import warp_array, warp_resample

RNG = np.random.default_rng(42)


def test_identity_warp_roundtrip():
    arr = RNG.normal(size=(9, 13))
    for kernel in ("nearest", "bilinear"):
        out = warp_array(arr, 9, 13, kernel)
        np.testing.assert_array_equal(out, arr)


def test_bilinear_exact_on_linear_ramp():
    y, x = np.meshgrid(np.arange(8), np.arange(11), indexing="ij")
    arr = 2.0 * y + 3.0 * x
    out = warp_array(arr, 15, 21, "bilinear")
    fy = np.arange(15) * 7 / 14.0
    fx = np.arange(21) * 10 / 20.0
    expect = 2.0 * fy[:, None] + 3.0 * fx[None, :]
    np.testing.assert_allclose(out, expect, rtol=0, atol=1e-12)


def test_nearest_picks_nearest_cell():
    arr = np.arange(12, dtype=float).reshape(3, 4)
    out = warp_array(arr, 2, 2, "nearest")
    # fy = [0, 2], fx = [0, 3] → corners
    np.testing.assert_array_equal(out, [[arr[0, 0], arr[0, 3]], [arr[2, 0], arr[2, 3]]])


def test_downsample_then_upsample_preserves_corners():
    arr = RNG.normal(size=(10, 10))
    down = warp_array(arr, 5, 5, "bilinear")
    up = warp_array(down, 10, 10, "bilinear")
    # corner alignment: the four corners are fixed points of both warps
    for yy in (0, -1):
        for xx in (0, -1):
            assert up[yy, xx] == pytest.approx(arr[yy, xx])


def test_nodata_poisoning():
    arr = np.ones((4, 4))
    arr[1, 1] = np.nan
    nn = warp_array(arr, 4, 4, "nearest")
    assert np.isnan(nn[1, 1]) and np.isfinite(nn).sum() == 15
    bl = warp_array(arr, 7, 7, "bilinear")
    # any target cell whose 2×2 support touches (1,1) is NaN — including
    # zero-weight corners (0·NaN = NaN): the fixed-order arithmetic poisons
    # the whole support, matching the SQL oracle's plain expression.
    assert np.isnan(bl[2, 2]) and np.isnan(bl[0, 0])
    assert np.isfinite(bl[5, 5]) and np.isfinite(bl[6, 6])


def test_kernel_option_surface():
    """All seven reference getResampling options (convertmodis.py:38-56)
    resolve and run; UNSUPPORTED is empty (r10 verdict item #3)."""
    from data_ingestion_auto_spark.operators.warp import UNSUPPORTED

    assert UNSUPPORTED == set()
    arr = RNG.normal(size=(6, 6))
    for opt in (
        "NEAREST_NEIGHBOR",
        "BILINEAR",
        "BICUBIC",
        "AVERAGE",
        "LANCZOS",
        "MODE",
        "CUBIC_CONVOLUTION",
        "CUBIC_SPLINE",
    ):
        out = warp_array(arr, 3, 3, opt)
        assert out.shape == (3, 3) and np.isfinite(out).all()
    with pytest.raises(ValueError):
        warp_array(arr, 2, 2, "no-such-kernel")


def test_cubic_identity_roundtrip():
    """Catmull-Rom interpolates: at d=0 the weight vector is exactly
    (0, 1, 0, 0) in IEEE doubles, so same-shape warp is the identity."""
    arr = RNG.normal(size=(9, 13))
    np.testing.assert_array_equal(warp_array(arr, 9, 13, "cubic"), arr)


def test_convolution_kernels_preserve_constants():
    """All convolution kernels' weights sum to 1 (lanczos by explicit
    normalization), so a constant image stays constant to ulp."""
    arr = np.full((10, 12), 5.25)
    for kernel in ("cubic", "cubic_spline", "lanczos", "bilinear"):
        out = warp_array(arr, 15, 20, kernel)
        np.testing.assert_allclose(out, 5.25, rtol=0, atol=1e-12)


def test_average_exact_block_means():
    arr = np.arange(16, dtype=float).reshape(4, 4)
    out = warp_array(arr, 2, 2, "average")
    np.testing.assert_array_equal(
        out, [[(0 + 1 + 4 + 5) / 4.0, (2 + 3 + 6 + 7) / 4.0],
              [(8 + 9 + 12 + 13) / 4.0, (10 + 11 + 14 + 15) / 4.0]]
    )
    with pytest.raises(ValueError):  # upsampling is not a box-filter op
        warp_array(arr, 8, 8, "average")


def test_mode_majority_tie_and_nan():
    arr = np.array(
        [
            [1.0, 1.0, 2.0, 3.0],  # left block: 1 wins 3-1
            [1.0, 7.0, 2.0, 3.0],  # right block: 2/3 tie 2-2 → smallest (2)
            [np.nan, np.nan, np.nan, np.nan],
            [np.nan, 9.0, np.nan, np.nan],  # NaNs excluded; all-NaN → NaN
        ]
    )
    out = warp_array(arr, 2, 2, "mode")
    assert out[0, 0] == 1.0 and out[0, 1] == 2.0
    assert out[1, 0] == 9.0 and np.isnan(out[1, 1])


def test_warp_resample_dataframe_groups(spark):
    rows = [
        ("a", y, x, float(2 * y + 3 * x)) for y in range(4) for x in range(5)
    ] + [("b", y, x, 7.0) for y in range(4) for x in range(5)]
    grid = spark.createDataFrame(rows, "variable string, y long, x long, value double")
    out = warp_resample(grid, 4, 5, 7, 9, "bilinear").toPandas()
    assert len(out) == 2 * 7 * 9
    b = out[out.variable == "b"]
    assert (b.value == 7.0).all()
    a = out[(out.variable == "a") & (out.y == 0) & (out.x == 8)]
    assert a.value.iloc[0] == pytest.approx(3.0 * 4)  # right edge of the ramp
