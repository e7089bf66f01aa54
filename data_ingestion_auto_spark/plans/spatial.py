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
    from pyspark.sql import Window as W

    ev = T(spark, sf_dir, "events")
    # watermark as a PARTITION WINDOW (optimization r14, guide §2.4):
    # the old groupBy + broadcast join-back re-planned the events scan
    # under both branches (3 user_id exchanges); the window computes the
    # identical per-key max on the one exchange the final aggregate then
    # reuses.
    wm = (F.max("ts").over(W.partitionBy("user_id")) - F.expr("INTERVAL 2 HOURS")).alias("wm")
    return (
        ev.select("user_id", "ts", wm)
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
    # Bit-for-bit WITH RECURSIVE replay of the deterministic DP stack
    # (graduated from rows-only in round 5, the contour/warp/CC pattern):
    # every kept point is an endpoint of some recursion span, so
    # n_points_out = COUNT(DISTINCT span endpoints); the %.6f round-trip,
    # orientation signs, and perp-distance expression trees mirror
    # operators/geometry.py op-for-op so IEEE doubles agree exactly
    # (verified: zero mismatches at sf0.001/0.01/0.1, with the DP branch
    # exercised on every line).
    oracle=r"""
WITH RECURSIVE
ranked AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS idx,
         fmod(value*7.3, 360.0) - 180.0 AS lon,
         fmod(value*3.7, 180.0) - 90.0 AS lat
  FROM events
),
-- the operator parses the %.6f-formatted WKT back to doubles: replay the
-- text round-trip (printf %.6f is bit-compatible with JVM format_string
-- on these values — checked over all 10k)
pts AS (
  SELECT user_id, idx,
         CAST(printf('%.6f', lon) AS DOUBLE) AS x,
         CAST(printf('%.6f', lat) AS DOUBLE) AS y
  FROM ranked WHERE idx < 40
),
line AS (
  SELECT user_id, count(*) AS n FROM pts GROUP BY user_id HAVING count(*) >= 2
),
seg AS (
  SELECT p1.user_id, p1.idx AS i, p1.x AS ax, p1.y AS ay, p2.x AS bx, p2.y AS by
  FROM pts p1 JOIN pts p2 ON p1.user_id = p2.user_id AND p2.idx = p1.idx + 1
),
ring AS (  -- closed ring: first/last endpoints touching is not a self-cross
  SELECT l.user_id, (pf.x = pl.x AND pf.y = pl.y) AS closed
  FROM line l
  JOIN pts pf ON pf.user_id = l.user_id AND pf.idx = 0
  JOIN pts pl ON pl.user_id = l.user_id AND pl.idx = l.n - 1
),
xpair AS (  -- orientation signs for every non-adjacent segment pair
  SELECT s1.user_id,
    sign((s1.bx-s1.ax)*(s2.ay-s1.ay) - (s1.by-s1.ay)*(s2.ax-s1.ax)) AS o1,
    sign((s1.bx-s1.ax)*(s2.by-s1.ay) - (s1.by-s1.ay)*(s2.bx-s1.ax)) AS o2,
    sign((s2.bx-s2.ax)*(s1.ay-s2.ay) - (s2.by-s2.ay)*(s1.ax-s2.ax)) AS o3,
    sign((s2.bx-s2.ax)*(s1.by-s2.ay) - (s2.by-s2.ay)*(s1.bx-s2.ax)) AS o4,
    s1.ax AS p1x, s1.ay AS p1y, s1.bx AS p2x, s1.by AS p2y,
    s2.ax AS p3x, s2.ay AS p3y, s2.bx AS p4x, s2.by AS p4y
  FROM seg s1
  JOIN seg s2 ON s1.user_id = s2.user_id AND s2.i >= s1.i + 2
  JOIN line l ON l.user_id = s1.user_id
  JOIN ring r ON r.user_id = s1.user_id
  WHERE NOT (s1.i = 0 AND s2.i = l.n - 2 AND r.closed)
),
nonadj AS (
  SELECT l.user_id,
         coalesce(NOT bool_or(
           (x.o1 <> x.o2 AND x.o3 <> x.o4)
           OR (x.o1 = 0 AND x.p3x BETWEEN least(x.p1x,x.p2x) AND greatest(x.p1x,x.p2x)
                        AND x.p3y BETWEEN least(x.p1y,x.p2y) AND greatest(x.p1y,x.p2y))
           OR (x.o2 = 0 AND x.p4x BETWEEN least(x.p1x,x.p2x) AND greatest(x.p1x,x.p2x)
                        AND x.p4y BETWEEN least(x.p1y,x.p2y) AND greatest(x.p1y,x.p2y))
           OR (x.o3 = 0 AND x.p1x BETWEEN least(x.p3x,x.p4x) AND greatest(x.p3x,x.p4x)
                        AND x.p1y BETWEEN least(x.p3y,x.p4y) AND greatest(x.p3y,x.p4y))
           OR (x.o4 = 0 AND x.p2x BETWEEN least(x.p3x,x.p4x) AND greatest(x.p3x,x.p4x)
                        AND x.p2y BETWEEN least(x.p3y,x.p4y) AND greatest(x.p3y,x.p4y))
         ), TRUE) AS nonadj_simple
  FROM line l LEFT JOIN xpair x ON x.user_id = l.user_id
  GROUP BY l.user_id
),
adj AS (  -- adjacent collinear retrace (cross=0, dot<0): shapely non-simple.
          -- For a closed ring the WRAPAROUND junction (last segment into
          -- segment 0) is adjacent too (review r12) — same predicate, same
          -- vector form, mirroring the operator's closed-ring check.
  SELECT s1.user_id,
         bool_or(
           ((s1.bx-s1.ax)*(s2.by-s2.ay) - (s1.by-s1.ay)*(s2.bx-s2.ax)) = 0
           AND ((s1.bx-s1.ax)*(s2.bx-s2.ax) + (s1.by-s1.ay)*(s2.by-s2.ay)) < 0
         ) AS retrace
  FROM seg s1
  JOIN line l ON l.user_id = s1.user_id
  JOIN ring r ON r.user_id = s1.user_id
  JOIN seg s2 ON s1.user_id = s2.user_id
             AND (s2.i = s1.i + 1 OR (r.closed AND s1.i = l.n - 2 AND s2.i = 0))
  GROUP BY s1.user_id
),
simple AS (
  SELECT n.user_id,
         (n.nonadj_simple AND NOT coalesce(a.retrace, FALSE)) AS was_simple
  FROM nonadj n LEFT JOIN adj a USING (user_id)
),
-- Douglas-Peucker as a span fixpoint: split (lo,hi) at the farthest
-- interior point (first index on ties = np.argmax) while its distance
-- exceeds the tolerance
spans AS (
  SELECT user_id, 0::BIGINT AS lo, (l.n - 1)::BIGINT AS hi
  FROM line l JOIN simple s USING (user_id) WHERE NOT s.was_simple
  UNION ALL
  SELECT z.user_id,
         CASE w.which WHEN 0 THEN z.lo ELSE z.mid END AS lo,
         CASE w.which WHEN 0 THEN z.mid ELSE z.hi END AS hi
  FROM (
    SELECT s.user_id, s.lo, s.hi, am.mid
    FROM spans s
    JOIN pts a ON a.user_id = s.user_id AND a.idx = s.lo
    JOIN pts b ON b.user_id = s.user_id AND b.idx = s.hi,
    LATERAL (
      SELECT p.idx AS mid,
             CASE WHEN (b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y) = 0.0
                  THEN sqrt((p.x-a.x)*(p.x-a.x) + (p.y-a.y)*(p.y-a.y))
                  ELSE abs((b.x-a.x)*(a.y-p.y) - (a.x-p.x)*(b.y-a.y))
                       / sqrt((b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y))
             END AS dist
      FROM pts p
      WHERE p.user_id = s.user_id AND p.idx > s.lo AND p.idx < s.hi
      ORDER BY dist DESC, p.idx ASC
      LIMIT 1
    ) am
    WHERE s.hi - s.lo >= 2 AND am.dist > 0.001
  ) z CROSS JOIN (VALUES (0), (1)) w(which)
),
kept AS (  -- every kept point is an endpoint of some span
  SELECT user_id, count(DISTINCT e) AS n_out
  FROM (
    SELECT user_id, lo AS e FROM spans
    UNION ALL
    SELECT user_id, hi AS e FROM spans
  ) GROUP BY user_id
)
SELECT l.user_id,
       s.was_simple,
       CAST(l.n AS INT) AS n_points_in,
       CAST(CASE WHEN s.was_simple THEN l.n ELSE k.n_out END AS INT) AS n_points_out
FROM line l
JOIN simple s USING (user_id)
LEFT JOIN kept k USING (user_id)
ORDER BY l.user_id
""",
    tags=("U3", "geometry", "mapInPandas"),
)
def simplify_linestrings_fix(spark, sf_dir):
    """U3 (reference raster_vector.py:25-38): per-user event tracks become
    WKT linestrings (first 40 points in event order — bounded per-key
    state); each is validated (is_simple) and, only when self-intersecting,
    Douglas-Peucker-simplified at tolerance 0.001, then coordinate-clamped
    — the reference's exact fix_geometry rule. Geometry stays a string
    column; only per-line stats are returned. Correctness: hash-verified
    against a DuckDB WITH RECURSIVE replay of the deterministic DP span
    stack (see the oracle comment) since round 5, plus the property tests
    in tests/test_geometry.py (endpoint preservation, tolerance band,
    simplicity detection)."""
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
    # sort_cut (optimization r13): orderBy's range sampler re-ran the
    # whole mapInPandas DP pass for boundary sampling — 2.55 s with
    # orderBy vs 1.38 s without. The output is per-user (data-sized at
    # scale), so cut lineage and keep the PARALLEL range sort.
    from .helpers import sort_cut

    return sort_cut(
        fixed.select("user_id", "was_simple", "n_points_in", "n_points_out"),
        "user_id",
    )
