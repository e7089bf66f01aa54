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
