"""U3: linestring validation + simplification without a geometry library —
the reference's shapely path (reference ingest/raster_vector.py:15-38):
clamp coordinates to lon/lat bounds, and ``if not linestring.is_simple:
linestring.simplify(tolerance=0.001)``.

Restated here as pure numpy inside Arrow-batched ``mapInPandas``:

- ``is_simple``: no two non-adjacent segments intersect (the O(n²)
  segment sweep is per-geometry, bounded by vertex count, not corpus
  size — each geometry is one row, so 1000 executors validate 1000
  geometries at once).
- ``dp_simplify``: classic Douglas–Peucker with perpendicular-distance
  tolerance (shapely's ``simplify`` is DP too; its
  ``preserve_topology=True`` variant additionally guards degenerate
  collapses, which for linestrings reduces to keeping ≥2 points — handled
  here).

Geometry stays a WKT string column end-to-end; nothing shuffles except the
projected stats.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def parse_wkt_linestring(wkt: str) -> np.ndarray:
    """'LINESTRING (x y, x y, ...)' → (n, 2) float array."""
    body = wkt.strip()
    if not body.upper().startswith("LINESTRING"):
        raise ValueError(f"not a LINESTRING: {wkt[:40]}")
    body = body[body.index("(") + 1 : body.rindex(")")]
    pts = [p.split() for p in body.split(",")]
    return np.array([[float(a), float(b)] for a, b in pts], dtype=np.float64)


def to_wkt_linestring(pts: np.ndarray) -> str:
    return "LINESTRING (" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts) + ")"


def _segments_intersect(p1, p2, p3, p4) -> bool:
    """Proper/improper intersection test via orientation signs."""

    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(a, b, c):  # c collinear with a-b: is c within the bbox?
        return (
            min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
        )

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and on_seg(p1, p2, p3):
        return True
    if o2 == 0 and on_seg(p1, p2, p4):
        return True
    if o3 == 0 and on_seg(p3, p4, p1):
        return True
    return o4 == 0 and on_seg(p3, p4, p2)


def is_simple(pts: np.ndarray) -> bool:
    """Shapely is_simple for linestrings: no self-intersection except
    consecutive segments sharing their joint vertex. ADJACENT pairs are
    checked too (review r11): shapely reports a collinear retrace
    (A→B→A', the second segment doubling back over the first) as
    non-simple, which the non-adjacent sweep alone misses — cross==0 with
    a negative direction dot is overlap beyond the shared vertex."""
    n = len(pts) - 1  # segment count
    for i in range(n - 1):
        a, b, c = pts[i], pts[i + 1], pts[i + 2]
        cross = (b[0] - a[0]) * (c[1] - b[1]) - (b[1] - a[1]) * (c[0] - b[0])
        dot = (b[0] - a[0]) * (c[0] - b[0]) + (b[1] - a[1]) * (c[1] - b[1])
        if cross == 0.0 and dot < 0.0:
            return False
    # closed ring: the WRAPAROUND junction (last segment into segment 0)
    # is adjacent too (review r12) — a ring whose closing segment doubles
    # back over the first segment is non-simple in shapely, and the pair
    # is excluded from the non-adjacent sweep below, so test it here with
    # the same collinear-retrace predicate
    if n >= 2 and np.array_equal(pts[0], pts[-1]):
        a, b, c = pts[n - 1], pts[n], pts[1]
        cross = (b[0] - a[0]) * (c[1] - b[1]) - (b[1] - a[1]) * (c[0] - b[0])
        dot = (b[0] - a[0]) * (c[0] - b[0]) + (b[1] - a[1]) * (c[1] - b[1])
        if cross == 0.0 and dot < 0.0:
            return False
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1 and np.array_equal(pts[0], pts[-1]):
                continue  # closed ring: first/last touching endpoints is fine
            if _segments_intersect(pts[i], pts[i + 1], pts[j], pts[j + 1]):
                return False
    return True


def _perp_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distance of each point from segment a-b (degenerate a==b → radial)."""
    ab = b - a
    denom = float(ab[0] ** 2 + ab[1] ** 2)
    if denom == 0.0:
        return np.hypot(pts[:, 0] - a[0], pts[:, 1] - a[1])
    return np.abs(ab[0] * (a[1] - pts[:, 1]) - (a[0] - pts[:, 0]) * ab[1]) / np.sqrt(denom)


def dp_simplify(pts: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker: keep endpoints; recursively keep the farthest
    point of any span exceeding the tolerance. Iterative stack (no Python
    recursion limit on pathological geometries)."""
    n = len(pts)
    if n <= 2:
        return pts
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        seg = pts[lo + 1 : hi]
        d = _perp_dist(seg, pts[lo], pts[hi])
        imax = int(np.argmax(d))
        if d[imax] > tolerance:
            mid = lo + 1 + imax
            keep[mid] = True
            stack.append((lo, mid))
            stack.append((mid, hi))
    return pts[keep]


def clamp_coords(pts: np.ndarray) -> np.ndarray:
    """reference raster_vector.py:15-23: lon → [-180, 180], lat → [-90, 90]."""
    out = pts.copy()
    out[:, 0] = np.clip(out[:, 0], -180.0, 180.0)
    out[:, 1] = np.clip(out[:, 1], -90.0, 90.0)
    return out


def fix_linestring(pts: np.ndarray, tolerance: float = 0.001) -> tuple[np.ndarray, bool]:
    """The reference's exact rule (raster_vector.py:25-38): simplify ONLY
    when the linestring is not simple, then clamp. Returns (points,
    was_simple)."""
    simple = is_simple(pts)
    if not simple:
        pts = dp_simplify(pts, tolerance)
    return clamp_coords(pts), simple


def simplify_linestrings(
    geoms: DataFrame, wkt_col: str = "wkt", tolerance: float = 0.001
) -> DataFrame:
    """Vector-geometry fix pass over a WKT linestring column. Output keeps
    every input column except the wkt, plus (wkt fixed, was_simple,
    n_points_in, n_points_out)."""
    carry = [c for c, _ in geoms.dtypes if c != wkt_col]
    schema = (
        ", ".join(f"{c} {t}" for c, t in geoms.dtypes if c != wkt_col)
        + f", {wkt_col} string, was_simple boolean, n_points_in int, n_points_out int"
    )

    def fix(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                pts = parse_wkt_linestring(r[wkt_col])
                fixed, simple = fix_linestring(pts, tolerance)
                rows.append(
                    [r[c] for c in carry]
                    + [to_wkt_linestring(fixed), simple, len(pts), len(fixed)]
                )
            yield pd.DataFrame(
                rows, columns=carry + [wkt_col, "was_simple", "n_points_in", "n_points_out"]
            )

    return geoms.mapInPandas(fix, schema)
