"""Multi-dimensional data layout: Z-order (Morton) clustering.

The reference's outputs are one-dimensional layouts — time-partitioned
files (`reference/ingest/ecmwf_opendata/__init__.py:306-314`) prune on
time alone. Queries that also filter space (the MVT tile path,
`reference/ingest/raster_vector.py:103-113`) scan every file of the
matching date. Z-ordering interleaves the bits of several columns into
one sort key so parquet row-group min/max stats stay narrow on EVERY
interleaved dimension at once; Spark's scan-level row-group pruning then
skips data for predicates on any of them.

All codegen column expressions — the only driver-side state is one
min/max row per column (same bounded-model pattern as the IVF
centroids). At 100 TB: `repartitionByRange` on the z-key does the global
range shuffle (sampled bounds, no driver sort), and each output task
writes one locality-tight file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Morton-interleaved BIGINT key over ``cols``.

    Each column is affinely scaled to ``[0, 2^bits)`` using its global
    min/max (one scalar aggregate, collected once), then bit ``b`` of
    column ``i`` lands at position ``b * len(cols) + i``. Total key width
    ``bits * len(cols)`` must stay ≤ 63.
    """
    if bits * len(cols) > 63:
        raise ValueError("zorder key wider than 63 bits")
    bounds = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn = float(bounds[f"mn_{c}"])
        span = float(bounds[f"mx_{c}"]) - mn or 1.0
        s = ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * F.lit(top)).cast("bigint")
        scaled.append(F.least(F.lit(top).cast("bigint"), F.greatest(F.lit(0).cast("bigint"), s)))
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1).cast("bigint"))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return z


def write_zordered(
    df: DataFrame, path: str, cols: list[str], bits: int = 12, files: int = 8
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partition on the key (sampled bounds — no global sort on one
    node), sort within each task, one locality-tight file per task. The
    ``_zkey`` column is kept in the output: dropping it after the sort
    would let Catalyst collapse the projection below the sort, and it
    doubles as the clustering metadata."""
    zdf = df.withColumn("_zkey", zorder_key(df, cols, bits))
    (
        zdf.repartitionByRange(files, "_zkey")
        .sortWithinPartitions("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet_dir(
    spark,
    path: str,
    target_mb: int = 128,
    sort_by: list[str] | None = None,
) -> dict:
    """Small-files compaction — the OPTIMIZE primitive every long-lived
    parquet dataset needs: streaming sinks, per-ingest appends, and
    retention rewrites all accrete files far below the row-group sweet
    spot, and at 100 TB the scan's task-scheduling and footer-reading
    overhead becomes file-count-bound instead of byte-bound. Rewrites
    the directory into ceil(total_bytes / target) files (optionally
    sorted within partitions to restore row-group min/max locality —
    compose with ``zorder_key`` for multi-dimensional layouts), then
    atomically swaps the staged result in via FileSystem rename.

    Not a table-catalog operation: this is the path-level sibling of the
    bucketed-table writers (write_band_index / write_ivf_index keep
    their OWN layout through saveAsTable and must not pass through
    here — compaction would destroy the bucket-file mapping).

    Returns {"files_before", "files_after", "bytes"} for observability.
    At scale: one full read + one ``repartition`` shuffle + one write —
    the same bill as any retention rewrite; schedule it with the
    retention job, never per-ingest."""
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)

    def _data_files(p):
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isFile() and not name.startswith("_") and not name.startswith("."):
                out.append((name, st.getLen()))
        return out

    before = _data_files(jpath)
    total_bytes = sum(sz for _, sz in before)
    n_out = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if sort_by:
        staged_df = df.repartition(n_out).sortWithinPartitions(*sort_by)
    else:
        staged_df = df.repartition(n_out)
    staged = path.rstrip("/") + "__compact_staging"
    staged_df.write.mode("overwrite").parquet(staged)
    # atomic-enough swap: the staged dir is complete (write committed)
    # before the original disappears; a crash between delete and rename
    # leaves the staging dir intact for manual recovery.
    fs.delete(jpath, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(staged), jpath)
    after = _data_files(jpath)
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes": total_bytes,
    }


def compact_bucketed_table(
    spark,
    table: str,
    bucket_cols: list[str],
    sort_cols: list[str],
    buckets: int = 16,
    path: str | None = None,
) -> dict:
    """Small-files compaction for the BUCKETED index tables — the
    catalog-side sibling of ``compact_parquet_dir`` (which must not
    touch bucketed layouts). Every ``mode='append'`` ingest into a
    stored index (band / IVF / CDC chunk) writes its own set of bucket
    files, so after N daily ingests each bucket holds ~N small files
    and probe scans go file-count-bound — the same disease compaction
    cures elsewhere, but here the cure must PRESERVE the bucket-file
    mapping or every future probe pays an Exchange again.

    Rewrite: content through a lineage cut (safe to overwrite the files
    being replaced), repartitioned on the bucket columns into exactly
    ``buckets`` partitions — Spark's repartition hash and its bucket
    hash are both Murmur3 on the same columns, so each task holds
    exactly one bucket and the rewrite lands ONE file per bucket — then
    ``saveAsTable`` re-declares the bucketing spec and sort order.

    Returns {"files_before", "files_after"} for observability. Cost:
    one index-sized read + one shuffle + one write — schedule with
    retention, never per-ingest (the append-capacity design already
    keeps per-ingest work bounded)."""
    from ..checkpoints import ckpt

    def _n_files() -> int:
        loc = None
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
            if r.col_name == "Location":
                loc = r.data_type
        if loc is None:
            raise RuntimeError(
                f"DESCRIBE TABLE EXTENDED {table} reported no Location row; "
                "cannot count bucket files for a table without a filesystem "
                "location"
            )
        jvm = spark._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(loc)
        fs = jpath.getFileSystem(hconf)
        n = 0
        it = fs.listFiles(jpath, True)
        while it.hasNext():
            f = it.next()
            name = f.getPath().getName()
            if not name.startswith("_") and not name.startswith("."):
                n += 1
        return n

    files_before = _n_files()
    cols = spark.table(table).columns
    survivors = ckpt(spark.table(table))
    writer = (
        survivors.repartition(buckets, *[survivors[c] for c in bucket_cols])
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, bucket_cols[0], *bucket_cols[1:])
        .sortBy(sort_cols[0], *sort_cols[1:])
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    # explicit check (not assert — must survive python -O): the rewrite
    # must be schema-preserving or every index reader breaks silently
    got = spark.table(table).columns
    if got != cols:
        raise RuntimeError(
            f"compact_bucketed_table changed the schema of {table}: "
            f"{cols} -> {got}"
        )
    return {"files_before": files_before, "files_after": _n_files()}
