"""Spatial predicates and sink-side query surfaces (SURVEY P10, K4, F10,
W5): point-in-polygon clip, the MVT tile function as a parameterized
filter, webhook payload signing, late-data accounting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .helpers import T
from .registry import query

# P10: the clip polygon (reference clips to an Africa shapefile,
# ingest/__init__.py:49-57). Here: a fixed convex hexagon approximating a
# continental outline; point-in-convex-polygon = the point is on the inner
# side of every edge (cross-product sign tests — pure arithmetic, portable,
# no geo library).
_HEX = [(-20.0, 35.0), (10.0, 38.0), (50.0, 12.0), (52.0, -10.0), (20.0, -35.0), (-15.0, -5.0)]


def _inside_sql(lon: str, lat: str) -> str:
    tests = []
    n = len(_HEX)
    for k in range(n):
        x1, y1 = _HEX[k]
        x2, y2 = _HEX[(k + 1) % n]
        # cross((p2-p1), (p-p1)) <= 0 → right of edge (clockwise polygon)
        tests.append(
            f"(({x2} - {x1}) * ({lat} - {y1}) - ({y2} - {y1}) * ({lon} - {x1})) <= 0.0"
        )
    return " AND ".join(tests)


@query(
    "clip_points_to_polygon",
    oracle=f"""
WITH pts AS (
  SELECT event_id,
         ((value * 7.3) % 360.0) - 180.0 AS lon,
         ((value * 3.7) % 180.0) - 90.0 AS lat
  FROM events
)
SELECT event_id, round(lon, 6) AS lon, round(lat, 6) AS lat
FROM pts
WHERE {_inside_sql('lon', 'lat')}
ORDER BY event_id
""",
    tags=("spatial", "P10", "filter"),
)
def clip_points_to_polygon(spark, sf_dir):
    """P10 spatial clip: keep points inside the (convex) clip polygon —
    edge-sign tests, pure codegen arithmetic, no geo library, no UDF. At
    scale a bbox prefilter (min/max of the polygon) would run first so the
    full test only sees candidates; for a concave polygon the same shape
    holds with a ray-cast UDF after the bbox prefilter (SURVEY P10).
    """
    ev = T(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        (((F.col("value") * 7.3) % 360.0) - 180.0).alias("lon"),
        (((F.col("value") * 3.7) % 180.0) - 90.0).alias("lat"),
    )
    return (
        pts.filter(F.expr(_inside_sql("lon", "lat")))
        .select("event_id", F.round("lon", 6).alias("lon"), F.round("lat", 6).alias("lat"))
        .orderBy("event_id")
    )


# K4: MVT tile function — tile (z, x, y) → web-mercator-degree envelope →
# date filter + bbox intersect + projection (raster_vector.py:83-115). The
# envelope math in lon/lat degrees: tile width = 360/2^z.
_Z, _X, _Y = 3, 4, 2


def _tile_bounds(z: int, x: int, y: int) -> tuple[float, float, float, float]:
    w = 360.0 / (2**z)
    xmin = -180.0 + x * w
    ymax = 90.0 - y * (180.0 / (2**z))
    return xmin, xmin + w, ymax - 180.0 / (2**z), ymax


@query(
    "mvt_tile_query",
    oracle=f"""
WITH pts AS (
  SELECT event_id,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS date_key,
         ((value * 7.3) % 360.0) - 180.0 AS lon,
         ((value * 3.7) % 180.0) - 90.0 AS lat,
         value AS el_val
  FROM events
)
SELECT event_id, date_key, round(lon, 6) AS lon, round(lat, 6) AS lat, el_val
FROM pts
WHERE lon >= {_tile_bounds(_Z, _X, _Y)[0]} AND lon < {_tile_bounds(_Z, _X, _Y)[1]}
  AND lat >= {_tile_bounds(_Z, _X, _Y)[2]} AND lat < {_tile_bounds(_Z, _X, _Y)[3]}
  AND date_key = '2024-01-03'
ORDER BY event_id
""",
    tags=("spatial", "K4", "J3"),
)
def mvt_tile_query(spark, sf_dir):
    """K4: the reference's MVT tile-server function as a parameterized
    filter plan — tile (z={_Z},x={_X},y={_Y}) envelope intersect + date
    equality + projection (raster_vector.py:90-113). On a date-partitioned
    table the date predicate prunes partitions; the bbox is a pushed range
    filter. (MVT byte encoding itself is client-side, out of scope —
    SURVEY K4.)
    """
    xmin, xmax, ymin, ymax = _tile_bounds(_Z, _X, _Y)
    ev = T(spark, sf_dir, "events")
    pts = ev.select(
        "event_id",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("date_key"),
        (((F.col("value") * 7.3) % 360.0) - 180.0).alias("lon"),
        (((F.col("value") * 3.7) % 180.0) - 90.0).alias("lat"),
        F.col("value").alias("el_val"),
    )
    return (
        pts.filter(
            (F.col("lon") >= xmin)
            & (F.col("lon") < xmax)
            & (F.col("lat") >= ymin)
            & (F.col("lat") < ymax)
            & (F.col("date_key") == "2024-01-03")
        )
        .select(
            "event_id",
            "date_key",
            F.round("lon", 6).alias("lon"),
            F.round("lat", 6).alias("lat"),
            "el_val",
        )
        .orderBy("event_id")
    )


@query(
    "webhook_payload_signatures",
    oracle="""
SELECT o_orderkey,
       printf('{"namespace":"ecmwf_forecast","date":"%s","key":%d}',
              strftime(o_orderdate, '%Y-%m-%d'), o_orderkey) AS payload,
       sha256(concat('shared-secret|',
              printf('{"namespace":"ecmwf_forecast","date":"%s","key":%d}',
                     strftime(o_orderdate, '%Y-%m-%d'), o_orderkey))) AS signature
FROM orders
ORDER BY o_orderkey
""",
    tags=("F10", "sink"),
)
def webhook_payload_signatures(spark, sf_dir):
    """F10: webhook notification payloads with keyed digests (the
    reference HMAC-SHA256-signs the POST body, ingest/__init__.py:98-101).
    The real ipad/opad HMAC exists as ``functions.hmac_sha256`` (codegen,
    stdlib-verified in tests/test_functions.py); THIS query's signature
    column stays a keyed sha256 because DuckDB's sha256 is VARCHAR-only
    and cannot hash the raw inner digest — the oracle checks the payload
    shape + keyed-digest plumbing, the pytest vectors check true HMAC.
    Computed per partition at the sink boundary; no shuffle."""
    od = T(spark, sf_dir, "orders")
    payload = F.format_string(
        '{"namespace":"ecmwf_forecast","date":"%s","key":%d}',
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.col("o_orderkey"),
    )
    return od.select(
        "o_orderkey",
        payload.alias("payload"),
        F.sha2(F.concat(F.lit("shared-secret|"), payload), 256).alias("signature"),
    ).orderBy("o_orderkey")


@query(
    "late_data_accounting",
    oracle="""
WITH watermarks AS (
  SELECT user_id, max(ts) - INTERVAL 2 HOUR AS wm
  FROM events GROUP BY user_id
)
SELECT e.user_id,
       count(*) AS n_events,
       count(*) FILTER (WHERE e.ts < w.wm) AS n_late,
       count(*) FILTER (WHERE e.ts >= w.wm) AS n_on_time
FROM events e JOIN watermarks w ON e.user_id = w.user_id
GROUP BY e.user_id
ORDER BY e.user_id
""",
    tags=("W5", "streaming-batch"),
)
def late_data_accounting(spark, sf_dir):
    """W5: late-data accounting against a per-key watermark (max event
    time − 2 h) — the batch-auditable statement of withWatermark's
    drop/keep rule (events older than the watermark would be dropped by
    the streaming aggregate; the reference instead retries 404s next tick,
    tamsat :126-133)."""
    ev = T(spark, sf_dir, "events")
    wm = ev.groupBy("user_id").agg((F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("wm"))
    return (
        ev.join(F.broadcast(wm), "user_id")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count(F.when(F.col("ts") < F.col("wm"), 1)).alias("n_late"),
            F.count(F.when(F.col("ts") >= F.col("wm"), 1)).alias("n_on_time"),
        )
        .orderBy("user_id")
    )


@query(
    "simplify_linestrings_fix",
    oracle=None,  # Douglas-Peucker is iterative: not SQL-expressible; rows-only
    tags=("U3", "geometry", "mapInPandas"),
)
def simplify_linestrings_fix(spark, sf_dir):
    """U3 (reference raster_vector.py:25-38): per-user event tracks become
    WKT linestrings (first 40 points in event order — bounded per-key
    state); each is validated (is_simple) and, only when self-intersecting,
    Douglas-Peucker-simplified at tolerance 0.001, then coordinate-clamped
    — the reference's exact fix_geometry rule. Geometry stays a string
    column; only per-line stats are returned. Correctness is pinned by the
    property tests in tests/test_geometry.py (endpoint preservation,
    tolerance band, simplicity detection)."""
    from ..operators.geometry import simplify_linestrings

    ev = T(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "event_id",
        (((F.col("value") * 7.3) % 360.0) - 180.0).alias("lon"),
        (((F.col("value") * 3.7) % 180.0) - 90.0).alias("lat"),
    )
    lines = (
        pts.groupBy("user_id")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("event_id", "lon", "lat"))), 1, 40
            ).alias("pts")
        )
        .filter(F.size("pts") >= 2)
        .select(
            "user_id",
            F.concat(
                F.lit("LINESTRING ("),
                F.expr("array_join(transform(pts, p -> format_string('%.6f %.6f', p.lon, p.lat)), ', ')"),
                F.lit(")"),
            ).alias("wkt"),
        )
    )
    fixed = simplify_linestrings(lines, "wkt", tolerance=0.001)
    return fixed.select("user_id", "was_simple", "n_points_in", "n_points_out").orderBy(
        "user_id"
    )
