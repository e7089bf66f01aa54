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
# mapped onto the kernels implemented here.
KERNEL_ALIASES = {
    "nearest": "nearest",
    "NEAREST_NEIGHBOR": "nearest",
    "bilinear": "bilinear",
    "BILINEAR": "bilinear",
    "BICUBIC": "bilinear",  # getResampling folds BICUBIC into GRA_Bilinear
}
UNSUPPORTED = {"AVERAGE", "LANCZOS", "MODE", "CUBIC_CONVOLUTION", "CUBIC", "CUBIC_SPLINE"}


def _resolve_kernel(kernel: str) -> str:
    if kernel in KERNEL_ALIASES:
        return KERNEL_ALIASES[kernel]
    if kernel in UNSUPPORTED:
        raise NotImplementedError(f"resampling kernel not implemented: {kernel}")
    raise ValueError(f"unknown resampling kernel: {kernel}")


def _src_coords(n_out: int, n_in: int) -> np.ndarray:
    """Corner-aligned fractional source coordinate per target index."""
    t = np.arange(n_out, dtype=np.int64)
    if n_out <= 1 or n_in <= 1:
        return np.zeros(n_out, dtype=np.float64)
    return (t * (n_in - 1)) / float(n_out - 1)


def warp_array(
    arr: np.ndarray, ny_out: int, nx_out: int, kernel: str = "bilinear"
) -> np.ndarray:
    """Resample one dense 2-D image to (ny_out, nx_out). NaN cells (nodata)
    propagate: nearest passes them through, bilinear yields NaN when any
    contributing corner is NaN — GDAL's nodata-poisoning behaviour."""
    k = _resolve_kernel(kernel)
    ny_in, nx_in = arr.shape
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
