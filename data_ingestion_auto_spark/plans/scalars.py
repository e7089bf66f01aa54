"""Scalar-function queries (SURVEY §2.8: F4-F13) — date/pentad calendar
math, string templating, regex extraction, JSON access, geometry clamp,
sinusoidal tile math, coalesce/choose.

All expressions are native Column functions (whole-stage codegen); the
oracle side is the same ANSI expression in DuckDB's dialect.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import clamp, convert_data, next_month_start, pentad_of_day, tile_id, wind_speed
from .helpers import T
from .registry import query

assert wind_speed and convert_data  # re-exported engine fns exercised in core.py too


@query(
    "pentad_calendar",
    oracle="""
SELECT event_id,
       strftime(ts, '%Y-%m-%d') AS day,
       CAST(CASE WHEN day(ts) <= 5 THEN 1 WHEN day(ts) <= 10 THEN 2
                 WHEN day(ts) <= 15 THEN 3 WHEN day(ts) <= 20 THEN 4
                 WHEN day(ts) <= 25 THEN 5 ELSE 6 END AS INTEGER) AS pentad,
       CAST((CASE WHEN day(ts) <= 5 THEN 1 WHEN day(ts) <= 10 THEN 2
                 WHEN day(ts) <= 15 THEN 3 WHEN day(ts) <= 20 THEN 4
                 WHEN day(ts) <= 25 THEN 5 ELSE 6 END - 1) * 5 + 1 AS INTEGER) AS pentad_start_day,
       strftime(date_trunc('month', ts) + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month
FROM events
ORDER BY event_id
""",
    tags=("F5", "W6", "calendar"),
)
def pentad_calendar(spark, sf_dir):
    """Pentad calendar math (F5/W6, reference dateutils.py:18-41): the 6th
    pentad absorbs month ends, so this is a when-chain on day-of-month, not
    a uniform 5-day window. Plus month successor with year rollover
    (dateutils.py:5-15).
    """
    ev = T(spark, sf_dir, "events")
    pent = pentad_of_day(F.dayofmonth("ts"))
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        pent.cast("int").alias("pentad"),
        ((pent - 1) * 5 + 1).cast("int").alias("pentad_start_day"),
        F.date_format(next_month_start(F.col("ts")), "yyyy-MM-dd").alias("next_month"),
    ).orderBy("event_id")


@query(
    "url_templating",
    oracle="""
SELECT o_orderkey,
       printf('https://data.example.org/%04d/%02d/orders_%d.tif',
              CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), o_orderkey) AS url
FROM orders
ORDER BY o_orderkey
""",
    tags=("F6", "string"),
)
def url_templating(spark, sf_dir):
    """URL template expansion (F6): the reference fills `{YYYY}/{MM}`
    placeholders (tamsat_rainfall/__init__.py:111-113, chirps `:77-79`);
    here `format_string` with zero-padded fields.
    """
    od = T(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.format_string(
            "https://data.example.org/%04d/%02d/orders_%d.tif",
            F.year("o_orderdate"),
            F.month("o_orderdate"),
            F.col("o_orderkey"),
        ).alias("url"),
    ).orderBy("o_orderkey")


@query(
    "regex_timestamp_extract",
    oracle="""
WITH files AS (
  SELECT o_orderkey,
         printf('ecmwf_forecast/2t/ecmwf_forecast_2t_%s.000Z.tif',
                strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')) AS path
  FROM orders
)
SELECT o_orderkey, path,
       regexp_extract(path, '(\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2})', 1) AS file_ts,
       (regexp_extract(path, '(\\d{4}-\\d{2}-\\d{2})', 1) < '1995-01-01') AS is_old
FROM files
ORDER BY o_orderkey
""",
    tags=("F7", "P8", "regex"),
)
def regex_timestamp_extract(spark, sf_dir):
    """Filename-embedded timestamp extraction + retention predicate (P8/F7,
    reference utils.py:141-157: regex-extract ISO timestamp from path,
    compare against the watermark). The timestamp-in-filename IS the
    partition column (SURVEY §1.1).
    """
    od = T(spark, sf_dir, "orders")
    files = od.select(
        "o_orderkey",
        F.format_string(
            "ecmwf_forecast/2t/ecmwf_forecast_2t_%s.000Z.tif",
            F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"),
        ).alias("path"),
    )
    ts_re = r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})"
    return files.select(
        "o_orderkey",
        "path",
        F.regexp_extract("path", ts_re, 1).alias("file_ts"),
        (F.regexp_extract("path", r"(\d{4}-\d{2}-\d{2})", 1) < "1995-01-01").alias("is_old"),
    ).orderBy("o_orderkey")


@query(
    "json_props_extract",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
FROM events
ORDER BY event_id
""",
    tags=("F11", "json"),
)
def json_props_extract(spark, sf_dir):
    """JSON decode of a string column (F11: state json / GeoJSON parsing in
    the reference, utils.py:102, raster_vector.py:118-124) via
    get_json_object — no Python, JVM-side JSON path evaluation.
    """
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
    ).orderBy("event_id")


@query(
    "geo_clamp_coordinates",
    oracle="""
SELECT event_id,
       round(greatest(least(((value * 7.3) % 400.0) - 200.0, 180.0), -180.0), 6) AS lon_clamped,
       round(greatest(least(((value * 3.7) % 200.0) - 100.0, 90.0), -90.0), 6) AS lat_clamped
FROM events
ORDER BY event_id
""",
    tags=("F8", "geo"),
)
def geo_clamp_coordinates(spark, sf_dir):
    """World-extent coordinate clamp (F8, reference raster_vector.py:15-23).
    Pseudo-coordinates derived deterministically from the fixture; the clamp
    itself is greatest(least(...)) — pure codegen.
    """
    ev = T(spark, sf_dir, "events")
    lon = (F.col("value") * 7.3) % 400.0 - 200.0
    lat = (F.col("value") * 3.7) % 200.0 - 100.0
    return ev.select(
        "event_id",
        F.round(clamp(lon, -180.0, 180.0), 6).alias("lon_clamped"),
        F.round(clamp(lat, -90.0, 90.0), 6).alias("lat_clamped"),
    ).orderBy("event_id")


@query(
    "sinusoidal_tile_math",
    oracle="""
WITH pts AS (
  SELECT event_id,
         greatest(least(((value * 7.3) % 400.0) - 200.0, 180.0), -180.0) AS lon,
         greatest(least(((value * 3.7) % 200.0) - 100.0, 90.0), -90.0) AS lat
  FROM events
)
SELECT event_id,
       printf('h%02dv%02d',
              CAST(floor((6371007.181 * radians(lon) * cos(radians(lat)) - -20015109.354) / 1111950.519667) AS INTEGER),
              CAST(floor((10007554.677 - 6371007.181 * radians(lat)) / 1111950.519667) AS INTEGER)) AS tile
FROM pts
ORDER BY event_id
""",
    tags=("F9", "geo"),
)
def sinusoidal_tile_math(spark, sf_dir):
    """Sinusoidal-projection tile assignment (F9, reference
    modis/pymodis.py:14-40): lon/lat → sinusoidal metres → 10° tile indices
    → 'hHHvVV'. The tile id is the engine's spatial partition key — at scale
    this is how raster cells co-locate (SURVEY J4 mosaic).
    """
    ev = T(spark, sf_dir, "events")
    lon = clamp((F.col("value") * 7.3) % 400.0 - 200.0, -180.0, 180.0)
    lat = clamp((F.col("value") * 3.7) % 200.0 - 100.0, -90.0, 90.0)
    return ev.select("event_id", tile_id(lon, lat).alias("tile")).orderBy("event_id")


@query(
    "coalesce_choose",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'O' THEN 'open'
            WHEN o_orderstatus = 'F' THEN 'finished'
            ELSE 'other' END AS status_label,
       coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS priority_label
FROM orders
ORDER BY o_orderkey
""",
    tags=("F13", "projection"),
)
def coalesce_choose(spark, sf_dir):
    """when/otherwise + coalesce/nullif (F13: the reference's
    `Numeric.choose` nodata overlay convertmodis.py:102-103 and `xr.where`
    chirps_rainfall/__init__.py:104)."""
    od = T(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "F", "finished")
        .otherwise("other")
        .alias("status_label"),
        F.coalesce(F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("URGENT!")).alias(
            "priority_label"
        ),
    ).orderBy("o_orderkey")
