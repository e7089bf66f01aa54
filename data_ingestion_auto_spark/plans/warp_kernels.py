"""U4 completion: the five resampling kernels beyond nearest/bilinear —
AVERAGE, MODE, CUBIC (Keys a=-0.5), CUBIC_SPLINE (uniform B-spline) and
LANCZOS (a=3) — closing the reference's full getResampling surface
(reference ingest/modis/convertmodis.py:38-56; gdal.Warp at :376-378).

Oracle strategy (the part that makes these hash-verifiable bit-for-bit):

- The separable kernels' tap indices and WEIGHTS are computed once in
  pure Python by ``operators.warp.kernel_taps`` — the same function the
  executor-side numpy kernel uses — and emitted into the SQL as
  shortest-roundtrip double literals (``CAST('<repr>' AS DOUBLE)``), so
  the oracle consumes the exact IEEE doubles the engine multiplies by.
  The remaining arithmetic is a left-associated multiply-add chain,
  written identically on both sides.
- The kernel applies separably: an x-pass over the source image, then a
  y-pass over the x-pass rows — so the oracle needs taps_x + taps_y
  joins (4+4 cubic, 6+6 lanczos), not taps² .
- AVERAGE sums each block row left-to-right, combines rows top-to-bottom,
  divides once by the block area — replayed with explicit corner joins.
- MODE is exact counts with a smallest-value tie-break: fully
  order-independent, so a generic GROUP BY + row_number oracle replays
  it at any ratio.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.warp import kernel_taps, warp_resample
from .helpers import sort_small
from .registry import query
from .warp import DENSE_CTES, _NX, _NY, _dense_grid

# target shapes: upsample for the convolution kernels (like bilinear's
# 15×20), integral-ratio downsample for the block kernels
_NY_UP, _NX_UP = 15, 20
_NY_AVG, _NX_AVG = 5, 6  # 2×2 blocks from 10×12
_NY_MODE, _NX_MODE = 5, 4  # 2×3 blocks


def _lit(w: float) -> str:
    """Shortest-roundtrip double literal — DuckDB parses the repr string
    back to the identical IEEE double numpy multiplies by."""
    return f"CAST('{w!r}' AS DOUBLE)"


def _sep_oracle(kernel: str, ny_out: int, nx_out: int) -> str:
    """Generate the x-pass/y-pass SQL for a separable kernel, weights and
    clamped indices injected from the SAME kernel_taps the engine uses."""
    taps_x = kernel_taps(kernel, nx_out, _NX)
    taps_y = kernel_taps(kernel, ny_out, _NY)
    k = len(taps_x[0][1])  # taps per axis (4 or 6)
    xcols = ", ".join([f"i{j}" for j in range(k)] + [f"w{j}" for j in range(k)])
    ycols = ", ".join([f"j{j}" for j in range(k)] + [f"u{j}" for j in range(k)])
    xrows = ",\n    ".join(
        "(" + ", ".join([str(t)] + [str(i) for i in idxs] + [_lit(w) for w in ws]) + ")"
        for t, idxs, ws in taps_x
    )
    yrows = ",\n    ".join(
        "(" + ", ".join([str(t)] + [str(i) for i in idxs] + [_lit(w) for w in ws]) + ")"
        for t, idxs, ws in taps_y
    )
    xjoins = "\n  ".join(
        f"JOIN dense s{j} ON s{j}.variable = s0.variable AND s{j}.y = s0.y AND s{j}.x = c.i{j}"
        for j in range(1, k)
    )
    yjoins = "\n  ".join(
        f"JOIN xpass r{j} ON r{j}.variable = r0.variable AND r{j}.x = r0.x AND r{j}.ys = c.j{j}"
        for j in range(1, k)
    )
    xmad = " + ".join(f"c.w{j} * s{j}.value" for j in range(k))
    ymad = " + ".join(f"c.u{j} * r{j}.rval" for j in range(k))
    return f"""
WITH {DENSE_CTES},
xc(xt, {xcols}) AS (VALUES
    {xrows}),
yc(yt, {ycols}) AS (VALUES
    {yrows}),
xpass AS (
  SELECT s0.variable, s0.y AS ys, c.xt AS x, {xmad} AS rval
  FROM xc c
  JOIN dense s0 ON s0.x = c.i0
  {xjoins}
)
SELECT r0.variable AS variable, CAST(c.yt AS BIGINT) AS y, CAST(r0.x AS BIGINT) AS x,
       {ymad} AS value
FROM yc c
JOIN xpass r0 ON r0.ys = c.j0
{yjoins}
ORDER BY variable, y, x
"""


def _run(spark, sf_dir, kernel: str, ny_out: int, nx_out: int):
    grid = _dense_grid(spark, sf_dir)
    # sort_small: orderBy's range sampler would run the applyInPandas
    # warp twice (plans/helpers.py, optimization r13)
    return sort_small(
        warp_resample(grid, _NY, _NX, ny_out, nx_out, kernel).select(
            "variable", "y", "x", "value"
        ),
        "variable",
        "y",
        "x",
    )


@query(
    "warp_resample_grid_cubic",
    oracle=_sep_oracle("cubic", _NY_UP, _NX_UP),
    tags=("U4", "warp", "applyInPandas"),
)
def warp_resample_grid_cubic(spark, sf_dir):
    """U4 CUBIC_CONVOLUTION (GDAL GRA_Cubic, Keys a=-0.5; reference
    convertmodis.py:43,53): 10×12 → 15×20 via separable 4-tap cubic
    convolution; the oracle replays the x-pass/y-pass multiply-add chain
    with the engine's own weights as literals — bit-exact hash."""
    return _run(spark, sf_dir, "CUBIC_CONVOLUTION", _NY_UP, _NX_UP)


@query(
    "warp_resample_grid_cubic_spline",
    oracle=_sep_oracle("cubic_spline", _NY_UP, _NX_UP),
    tags=("U4", "warp", "applyInPandas"),
)
def warp_resample_grid_cubic_spline(spark, sf_dir):
    """U4 CUBIC_SPLINE (uniform cubic B-spline; reference
    convertmodis.py:44,54): 10×12 → 15×20, same separable replay as
    cubic with the B-spline weight table."""
    return _run(spark, sf_dir, "CUBIC_SPLINE", _NY_UP, _NX_UP)


@query(
    "warp_resample_grid_lanczos",
    oracle=_sep_oracle("lanczos", _NY_UP, _NX_UP),
    tags=("U4", "warp", "applyInPandas"),
)
def warp_resample_grid_lanczos(spark, sf_dir):
    """U4 LANCZOS (windowed sinc, a=3, 6 taps/axis, weights normalized to
    sum 1; reference convertmodis.py:45,55): 10×12 → 15×20. The sin()
    evaluations happen ONCE in scalar libm and reach both engines as
    roundtrip literals, so no cross-engine trig drift can leak in."""
    return _run(spark, sf_dir, "LANCZOS", _NY_UP, _NX_UP)


@query(
    "warp_resample_grid_average",
    oracle=f"""
WITH {DENSE_CTES},
t AS (
  SELECT ty.y AS yt, tx.x AS xt
  FROM (SELECT unnest(generate_series(0, {_NY_AVG - 1})) AS y) ty
  CROSS JOIN (SELECT unnest(generate_series(0, {_NX_AVG - 1})) AS x) tx
)
SELECT s00.variable AS variable, CAST(t.yt AS BIGINT) AS y, CAST(t.xt AS BIGINT) AS x,
       ((s00.value + s01.value) + (s10.value + s11.value)) / 4.0 AS value
FROM t
JOIN dense s00 ON s00.y = 2 * t.yt AND s00.x = 2 * t.xt
JOIN dense s01 ON s01.variable = s00.variable AND s01.y = 2 * t.yt AND s01.x = 2 * t.xt + 1
JOIN dense s10 ON s10.variable = s00.variable AND s10.y = 2 * t.yt + 1 AND s10.x = 2 * t.xt
JOIN dense s11 ON s11.variable = s00.variable AND s11.y = 2 * t.yt + 1 AND s11.x = 2 * t.xt + 1
ORDER BY variable, y, x
""",
    tags=("U4", "warp", "applyInPandas"),
)
def warp_resample_grid_average(spark, sf_dir):
    """U4 AVERAGE (box filter; reference convertmodis.py:46,56): 10×12 →
    5×6 over exact 2×2 blocks. The engine sums each block row left-to-
    right and combines rows top-to-bottom; the oracle writes the same
    association ((v00+v01)+(v10+v11))/4 — bit-exact."""
    return _run(spark, sf_dir, "AVERAGE", _NY_AVG, _NX_AVG)


@query(
    "warp_resample_grid_mode",
    oracle=f"""
WITH {DENSE_CTES},
votes AS (
  SELECT variable, CAST(floor(y / 2) AS BIGINT) AS yt,
         CAST(floor(x / 3) AS BIGINT) AS xt, value, count(*) AS cnt
  FROM dense GROUP BY 1, 2, 3, 4
),
ranked AS (
  SELECT variable, yt, xt, value,
         row_number() OVER (
           PARTITION BY variable, yt, xt ORDER BY cnt DESC, value ASC
         ) AS rn
  FROM votes
)
SELECT variable, yt AS y, xt AS x, value FROM ranked WHERE rn = 1
ORDER BY variable, y, x
""",
    tags=("U4", "warp", "applyInPandas"),
)
def warp_resample_grid_mode(spark, sf_dir):
    """U4 MODE (majority vote; reference convertmodis.py:47): 10×12 →
    5×4 over 2×3 blocks, ties to the smallest value — exact counts make
    the kernel order-independent, so a generic GROUP BY + row_number
    oracle replays any ratio."""
    return _run(spark, sf_dir, "MODE", _NY_MODE, _NX_MODE)
