"""Format-agnostic table IO: parquet, ORC, CSV, JSON-lines.

The reference ingests whatever each upstream serves — GRIB, NetCDF,
GeoTIFF, gzip'd TIFF, XML, HTML listings, GeoJSON
(`reference/ingest/utils.py:121-136`, `chirps_rainfall/__init__.py:332-340`,
`raster_vector.py:117-144`) — decoding at the boundary and normalizing
into arrays. The relational analogue: accept any columnar/row format at
the landing boundary and normalize into the engine's typed DataFrames.

All four formats ride Spark's native readers (JVM scans, no Python in
the data path). Parquet/ORC carry their own schema and push filters down
to row-group/stripe stats; CSV/JSON are schema-on-read — the explicit
``StructType`` contract here avoids the 2-pass inference scan at 100 TB
and pins types against drift. gzip codecs decode transparently on read
for the text formats (splittability caveat documented in ``read_table``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_TEXT_FORMATS = {"csv", "json"}
_FORMATS = {"parquet", "orc"} | _TEXT_FORMATS


def write_table(df: DataFrame, path: str, fmt: str, compression: str | None = None) -> None:
    """Write ``df`` at ``path`` in ``fmt``; CSV gets a header row."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    w = df.write.mode("overwrite").format(fmt)
    if compression:
        w = w.option("compression", compression)
    if fmt == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_table(
    spark: SparkSession, path: str, fmt: str, schema: StructType | None = None
) -> DataFrame:
    """Read ``path`` as ``fmt``. For CSV/JSON a schema is REQUIRED: at
    scale, inference costs a full extra pass and silently widens types;
    self-describing formats (parquet/ORC) ignore it. gzip'd text files
    decode transparently but are NOT splittable — one task per file — so
    landing pipelines should re-encode to parquet/ORC before heavy use."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    r = spark.read.format(fmt)
    if fmt in _TEXT_FORMATS:
        if schema is None:
            raise ValueError(f"{fmt} requires an explicit schema")
        r = r.schema(schema)
        if fmt == "csv":
            r = r.option("header", "true")
    return r.load(path)
