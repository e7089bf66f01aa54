"""U4: warp/resample over the long-format grid — a pure-numpy restatement
of the reference's GDAL warp step (reference ingest/modis/convertmodis.py:
38-56 kernel options, :376-378 gdal.Warp invocation).

Spark-first shape: each (group) raster is one applyInPandas group — the
grid arrives long (y, x, value), is densified to a 2-D array, resampled,
and re-emitted long. Groups are independent images, so 1000 executors warp
1000 (variable, time) rasters concurrently; no shuffle beyond the group-by,
and the payload per group is one raster (bounded by image size, not corpus
size).

Determinism: the bilinear arithmetic is written in a fixed evaluation
order — ``(1-dy)*((1-dx)*v00 + dx*v01) + dy*((1-dx)*v10 + dx*v11)`` with
``f = t*(n_in-1)/(n_out-1)`` corner-aligned source coordinates — so an
engine re-implementing the same IEEE-double expression (e.g. the DuckDB
oracle) produces bit-identical results.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# The reference's getResampling option surface (convertmodis.py:38-56),
# mapped onto the kernels implemented here. All seven reference options
# resolve; UNSUPPORTED is kept (empty) for API stability.
KERNEL_ALIASES = {
    "nearest": "nearest",
    "NEAREST_NEIGHBOR": "nearest",
    "bilinear": "bilinear",
    "BILINEAR": "bilinear",
    "BICUBIC": "bilinear",  # getResampling folds BICUBIC into GRA_Bilinear
    "average": "average",
    "AVERAGE": "average",
    "mode": "mode",
    "MODE": "mode",
    "cubic": "cubic",
    "CUBIC": "cubic",
    "CUBIC_CONVOLUTION": "cubic",  # GRA_Cubic (Keys a = -0.5)
    "cubic_spline": "cubic_spline",
    "CUBIC_SPLINE": "cubic_spline",
    "lanczos": "lanczos",
    "LANCZOS": "lanczos",
}
UNSUPPORTED: set[str] = set()

# separable convolution kernels: (tap offsets relative to floor(f),
# weight function of the fractional part d) — weight arithmetic written
# with explicit multiplication chains (never pow()) so the SQL oracle can
# replay the identical IEEE-double expression
_A = -0.5  # GDAL GRA_Cubic is Keys cubic convolution with a = -0.5


def _cubic_weights(d: float) -> list[float]:
    return [
        _A * ((((1.0 + d) * (1.0 + d) * (1.0 + d)) - 5.0 * ((1.0 + d) * (1.0 + d)) + 8.0 * (1.0 + d)) - 4.0),
        ((_A + 2.0) * (d * d * d) - (_A + 3.0) * (d * d)) + 1.0,
        ((_A + 2.0) * ((1.0 - d) * (1.0 - d) * (1.0 - d)) - (_A + 3.0) * ((1.0 - d) * (1.0 - d))) + 1.0,
        _A * ((((2.0 - d) * (2.0 - d) * (2.0 - d)) - 5.0 * ((2.0 - d) * (2.0 - d)) + 8.0 * (2.0 - d)) - 4.0),
    ]


def _cubic_spline_weights(d: float) -> list[float]:
    # uniform cubic B-spline (GDAL GRA_CubicSpline)
    return [
        ((1.0 - d) * (1.0 - d) * (1.0 - d)) / 6.0,
        ((3.0 * (d * d * d) - 6.0 * (d * d)) + 4.0) / 6.0,
        (((-3.0 * (d * d * d) + 3.0 * (d * d)) + 3.0 * d) + 1.0) / 6.0,
        (d * d * d) / 6.0,
    ]


def _lanczos_weights(d: float) -> list[float]:
    """Lanczos-3 windowed sinc at tap offsets -2..3, normalized to sum 1
    (left-to-right summation order). Uses scalar libm sin via ``math`` —
    the weights are emitted as shortest-roundtrip literals into the SQL
    oracle, so cross-engine libm differences cannot leak in."""
    import math

    ws = []
    for off in (-2, -1, 0, 1, 2, 3):
        x = d - off
        if x == 0.0:
            ws.append(1.0)
        elif abs(x) >= 3.0:
            ws.append(0.0)
        else:
            px = math.pi * x
            ws.append((3.0 * math.sin(px) * math.sin(px / 3.0)) / (px * px))
    s = 0.0
    for w in ws:  # fixed order, matches the oracle's literal weights
        s += w
    return [w / s for w in ws]


_SEPARABLE = {
    "cubic": ((-1, 0, 1, 2), _cubic_weights),
    "cubic_spline": ((-1, 0, 1, 2), _cubic_spline_weights),
    "lanczos": ((-2, -1, 0, 1, 2, 3), _lanczos_weights),
}


def _resolve_kernel(kernel: str) -> str:
    if kernel in KERNEL_ALIASES:
        return KERNEL_ALIASES[kernel]
    if kernel in UNSUPPORTED:
        raise NotImplementedError(f"resampling kernel not implemented: {kernel}")
    raise ValueError(f"unknown resampling kernel: {kernel}")


def kernel_taps(kernel: str, n_out: int, n_in: int) -> list[tuple[int, list[int], list[float]]]:
    """Per-target-index (t, clamped source indices, weights) for the
    separable kernels — pure Python (no numpy), SHARED with the SQL
    oracle generator in plans/warp_kernels.py so the hash check pins the
    weights and source coordinates bit-for-bit."""
    import math

    offs, wfun = _SEPARABLE[kernel]
    taps = []
    for t in range(n_out):
        if n_out <= 1 or n_in <= 1:
            f = 0.0
        else:
            f = (t * (n_in - 1)) / float(n_out - 1)
        i0 = math.floor(f)
        d = f - i0
        idxs = [min(max(i0 + o, 0), n_in - 1) for o in offs]
        taps.append((t, idxs, wfun(d)))
    return taps


def block_bounds(n_out: int, n_in: int) -> list[int]:
    """AVERAGE/MODE contributing-block boundaries: target t covers source
    indices [bounds[t], bounds[t+1]) — exact integer arithmetic, shared
    with the oracle generator. Requires n_in >= n_out (downsampling)."""
    if n_in < n_out:
        raise ValueError(
            f"average/mode are downsampling kernels: n_in={n_in} < n_out={n_out}"
        )
    return [(t * n_in) // n_out for t in range(n_out + 1)]


def _src_coords(n_out: int, n_in: int) -> np.ndarray:
    """Corner-aligned fractional source coordinate per target index."""
    t = np.arange(n_out, dtype=np.int64)
    if n_out <= 1 or n_in <= 1:
        return np.zeros(n_out, dtype=np.float64)
    return (t * (n_in - 1)) / float(n_out - 1)


def _apply_separable(arr: np.ndarray, k: str, ny_out: int, nx_out: int) -> np.ndarray:
    """x-pass then y-pass, accumulating taps LEFT TO RIGHT — the same
    ((w0*v0 + w1*v1) + w2*v2) + ... association the SQL oracle writes."""
    ny_in, nx_in = arr.shape
    taps_x = kernel_taps(k, nx_out, nx_in)
    taps_y = kernel_taps(k, ny_out, ny_in)
    tmp = np.empty((ny_in, nx_out), dtype=np.float64)
    for tx, idxs, ws in taps_x:
        acc = ws[0] * arr[:, idxs[0]]
        for w, i in zip(ws[1:], idxs[1:]):
            acc = acc + w * arr[:, i]
        tmp[:, tx] = acc
    out = np.empty((ny_out, nx_out), dtype=np.float64)
    for ty, idxs, ws in taps_y:
        acc = ws[0] * tmp[idxs[0], :]
        for w, i in zip(ws[1:], idxs[1:]):
            acc = acc + w * tmp[i, :]
        out[ty, :] = acc
    return out


def _apply_average(arr: np.ndarray, ny_out: int, nx_out: int) -> np.ndarray:
    """Box average over the contributing block: each row summed left to
    right, rows combined top to bottom, one divide by the block area —
    the exact association the SQL oracle writes. NaN poisons its block
    (consistent with bilinear's nodata behaviour)."""
    ny_in, nx_in = arr.shape
    yb = block_bounds(ny_out, ny_in)
    xb = block_bounds(nx_out, nx_in)
    tmp = np.empty((ny_in, nx_out), dtype=np.float64)
    for tx in range(nx_out):
        acc = arr[:, xb[tx]].astype(np.float64, copy=True)
        for x in range(xb[tx] + 1, xb[tx + 1]):
            acc = acc + arr[:, x]
        tmp[:, tx] = acc
    out = np.empty((ny_out, nx_out), dtype=np.float64)
    widths = np.array([xb[t + 1] - xb[t] for t in range(nx_out)], dtype=np.float64)
    for ty in range(ny_out):
        acc = tmp[yb[ty], :].copy()
        for y in range(yb[ty] + 1, yb[ty + 1]):
            acc = acc + tmp[y, :]
        out[ty, :] = acc / ((yb[ty + 1] - yb[ty]) * widths)
    return out


def _apply_mode(arr: np.ndarray, ny_out: int, nx_out: int) -> np.ndarray:
    """Most frequent value in the contributing block; ties break to the
    SMALLEST value — exact counts, so the result is order-independent
    and any SQL engine replays it with GROUP BY + (count DESC, value ASC).
    NaN cells are excluded from voting; an all-NaN block yields NaN."""
    ny_in, nx_in = arr.shape
    yb = block_bounds(ny_out, ny_in)
    xb = block_bounds(nx_out, nx_in)
    out = np.full((ny_out, nx_out), np.nan, dtype=np.float64)
    for ty in range(ny_out):
        for tx in range(nx_out):
            block = arr[yb[ty] : yb[ty + 1], xb[tx] : xb[tx + 1]].ravel()
            block = block[~np.isnan(block)]
            if block.size == 0:
                continue
            vals, counts = np.unique(block, return_counts=True)
            out[ty, tx] = vals[np.argmax(counts)]  # first max = smallest value
    return out


def warp_array(
    arr: np.ndarray, ny_out: int, nx_out: int, kernel: str = "bilinear"
) -> np.ndarray:
    """Resample one dense 2-D image to (ny_out, nx_out). NaN cells (nodata)
    propagate: nearest passes them through, the convolution kernels
    (bilinear/cubic/cubic_spline/lanczos) and average yield NaN when any
    contributing cell is NaN — GDAL's nodata-poisoning behaviour — and
    mode excludes NaN from voting."""
    k = _resolve_kernel(kernel)
    ny_in, nx_in = arr.shape
    if k in _SEPARABLE:
        return _apply_separable(arr, k, ny_out, nx_out)
    if k == "average":
        return _apply_average(arr, ny_out, nx_out)
    if k == "mode":
        return _apply_mode(arr, ny_out, nx_out)
    fy = _src_coords(ny_out, ny_in)
    fx = _src_coords(nx_out, nx_in)
    if k == "nearest":
        yn = np.minimum(np.floor(fy + 0.5).astype(np.int64), ny_in - 1)
        xn = np.minimum(np.floor(fx + 0.5).astype(np.int64), nx_in - 1)
        return arr[np.ix_(yn, xn)]
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    y1 = np.minimum(y0 + 1, ny_in - 1)
    x1 = np.minimum(x0 + 1, nx_in - 1)
    dy = (fy - y0)[:, None]
    dx = (fx - x0)[None, :]
    v00 = arr[np.ix_(y0, x0)]
    v01 = arr[np.ix_(y0, x1)]
    v10 = arr[np.ix_(y1, x0)]
    v11 = arr[np.ix_(y1, x1)]
    # Fixed evaluation order — keep in sync with the SQL oracle.
    row0 = (1.0 - dx) * v00 + dx * v01
    row1 = (1.0 - dx) * v10 + dx * v11
    return (1.0 - dy) * row0 + dy * row1


def warp_resample(
    grid: DataFrame,
    ny_in: int,
    nx_in: int,
    ny_out: int,
    nx_out: int,
    kernel: str = "bilinear",
    group_cols: Sequence[str] = ("variable",),
) -> DataFrame:
    """Warp every raster in a long grid table. ``grid`` has columns
    ``group_cols + (y, x, value)`` with integer y in [0, ny_in) and x in
    [0, nx_in); output is the same shape over the target dimensions.

    One shuffle (the groupBy); each group materializes exactly one
    ny_in×nx_in array executor-side.
    """
    _resolve_kernel(kernel)  # fail fast on the driver
    gcols = list(group_cols)
    schema = ", ".join(f"{c} string" for c in gcols) + ", y long, x long, value double"

    def warp(pdf: pd.DataFrame) -> pd.DataFrame:
        arr = np.full((ny_in, nx_in), np.nan, dtype=np.float64)
        arr[pdf["y"].to_numpy(np.int64), pdf["x"].to_numpy(np.int64)] = pdf[
            "value"
        ].to_numpy(np.float64)
        out = warp_array(arr, ny_out, nx_out, kernel)
        yy, xx = np.meshgrid(np.arange(ny_out), np.arange(nx_out), indexing="ij")
        res = pd.DataFrame({"y": yy.ravel(), "x": xx.ravel(), "value": out.ravel()})
        for c in gcols:
            res[c] = pdf[c].iloc[0]
        return res[gcols + ["y", "x", "value"]]

    return grid.groupBy(*gcols).applyInPandas(warp, schema)
