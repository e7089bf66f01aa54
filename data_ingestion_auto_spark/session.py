"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]`` (one JVM); the configs below are the ones
that matter at cluster scale too: AQE for runtime re-planning (join strategy
switch, shuffle-partition coalescing, skew-join splitting), Arrow for any
pandas-UDF exchange, UTC session timezone (oracle comparability), and
dynamic partition overwrite for idempotent per-partition sinks (the Spark
analogue of the reference's delete-then-insert upsert,
reference raster_vector.py:146-164).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Slightly below the core count: leaves idle slots so speculative copies
# of stalled tasks (this host exhibits intermittent thread stalls) can
# launch immediately instead of waiting for the stalled wave to finish.
DEFAULT_SHUFFLE_PARTITIONS = max(4, int(os.environ.get("SPARK_GRAFT_CPUS", "32")) * 3 // 4)


def get_session(
    app_name: str = "data_ingestion_auto_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Scale notes: every setting here is declarative and survives a move from
    ``local[32]`` to a 1000-executor cluster — nothing pins data to the
    driver. ``spark.sql.shuffle.partitions`` is only the pre-AQE upper
    bound; AQE coalesces to the real parallelism at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    nshuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Stragglers: re-launch slow tasks (this host shows intermittent
        # multi-second thread stalls; on a real cluster this guards against
        # slow nodes).
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "1s")
        .config("spark.speculation.multiplier", "2")
        .config("spark.speculation.quantile", "0.5")
        .config("spark.ui.enabled", "false")
        # Gate-time memory budget (VERDICT r10 item #1): the driver's
        # correctness gate runs this JVM NEXT TO a DuckDB oracle process
        # on the same host; r10 recorded 3 oracle-side OOMs (DuckDB
        # failed to allocate 2 KiB on a trivial projection) because a
        # 16g JVM heap plus page cache starved it. 12g is ample for the
        # sf0.1 bench surface (measured: no spills at 12g) and leaves
        # the oracle ~4g of headroom on a 16-core/32g gate host. Raise
        # via SPARK_GRAFT_DRIVER_MEM for bigger local experiments.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Re-apply runtime SQL confs in case getOrCreate() reused a session.
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        # events.parquet stores TIMESTAMP(NANOS); Spark's reader has no
        # nanos timestamp type — read as long, normalized in sources.tables.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
    }.items():
        spark.conf.set(k, v)
    spark.sparkContext.setLogLevel("WARN")
    return spark
