"""data_ingestion_auto_spark — a PySpark-native incremental analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL system (``wmo-raf/data-ingestion-auto``), re-expressed
Spark-first: DataFrame/SQL plans optimized by Catalyst, partitioned parquet
storage, broadcast/range joins, window analytics, Structured Streaming for
incremental semantics, and Pandas-UDF-backed grouped-map operators for the
few raster-specific operations Spark lacks natively.

Layout (SURVEY.md §7):
    session     SparkSession factory (AQE, Arrow, UTC, dynamic overwrite)
    model       declared StructType schemas for the engine's tables
    state       watermark/state store (incremental-ingest bookkeeping)
    sources/    table readers + catalog/listing scans
    operators/  relational + domain operators (joins, aggs, windows, dedup,
                similarity, text analysis, mosaic, contour, multimodal)
    functions/  scalar function library (unit convert, pentad calendar,
                clamp, tile math, templating)
    plans/      the named-query registry consumed by __spark_entry__.py
    streaming/  Structured Streaming recompositions of the pipelines
    sinks       partitioned writes, idempotent overwrite, retention
"""

__version__ = "0.1.0"
