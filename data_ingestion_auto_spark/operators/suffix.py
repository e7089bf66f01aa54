"""Prefix-doubling suffix ranking (Manber–Myers) — the unbounded-document
construction path for the suffix-array ExactSubstr tier.

`plans/substring_sa.py` builds the suffix array by sorting materialized
per-document suffixes directly, which is linear-in-corpus only because
documents are length-bounded (suffix bytes ≈ cap/2 × corpus bytes). When
documents are NOT bounded, the classic fix is prefix doubling: suffixes
are ranked by their first 2^k tokens, and each round re-ranks by the
PAIR (rank[p], rank[p + 2^k]) — after ceil(log2(max_len)) rounds the
rank order equals full lexicographic suffix order, and no round ever
materializes more than one integer pair per position.

Spark-first distribution:

- the per-round re-rank is a DENSE RANK over (r, r2) pairs — computed
  distributed in two passes (range-partition the distinct keys,
  row_number per partition in parallel, add broadcast per-partition
  offsets), never a single-partition global window;
- the rank-at-offset lookup is a self equi-join on (doc_id, i + 2^k) —
  positions past the document end rank 0, which sorts before every real
  rank (a shorter suffix is a prefix of the longer → sorts first),
  reproducing the sentinel-termination of the single-machine build;
- each round ``localCheckpoint``s its rank table (same iterative-lineage
  discipline as kmeans_lite / connected_components).

Equal suffixes (identical token runs ending two documents) keep equal
ranks — exactly the tie semantics the direct sort produces via its
deterministic (suf, doc_id, i) tie-break, checked by the equivalence
test (tests/test_suffix_ranks.py) against `substring_sa`'s direct sort
on the fixture corpus.

Cost model at 100 TB: rounds = log2(longest document), each round =
one distinct + one range exchange over position-count integer pairs +
one equi-join — no token arrays move after round 0. The direct sort in
plans/substring_sa.py stays the default while the corpus contract caps
document length; this operator is the escape hatch when it doesn't.

Reference scope: LLM-pipeline tier (COVERAGE.md); reference dedup is
file-level state skips (ingest/__init__.py:118-135).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_NP = 32


def _dense_rank(df: DataFrame, cols: list[str], out: str) -> DataFrame:
    """Distributed dense rank over ``cols``: range-partition the distinct
    keys so partitions are totally ordered, row_number within each
    partition IN PARALLEL (windows keyed on spark_partition_id), then add
    each partition's broadcast cumulative offset. The only ordered pass
    over all keys is the ≤ _NP-row offset scan."""
    keys = df.select(*cols).distinct()
    pid = keys.repartitionByRange(_NP, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    wo = W.partitionBy("_pid").orderBy(*cols)
    local = pid.withColumn("_lr", F.row_number().over(wo))
    counts = local.groupBy("_pid").agg(F.max("_lr").alias("_n"))
    woff = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offs = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(woff), F.lit(0))
    ).select("_pid", "_off")
    ranked = local.join(F.broadcast(offs), "_pid").select(
        *cols, (F.col("_lr") + F.col("_off")).alias(out)
    )
    return df.join(ranked, cols)


def suffix_order_ranks(positions: DataFrame) -> DataFrame:
    """positions: (doc_id, i, tok) — one row per token position. Returns
    (doc_id, i, r) with r a dense rank over all per-document suffixes in
    lexicographic order of their token runs (to the document end); equal
    ranks iff the suffixes are identical strings.

    r is suffix-array order: sorting positions by r reproduces the order
    `plans/substring_sa.py` gets by sorting materialized suffix arrays,
    without ever materializing them (prefix doubling — see module
    docstring)."""
    return suffix_rank_levels(positions)[-1][1]


def suffix_rank_levels(positions: DataFrame) -> list[tuple[int, DataFrame]]:
    """Prefix-doubling rank LEVELS: [(span, ranks)] where each ranks
    DataFrame (doc_id, i, r) orders suffixes by their first ``span``
    tokens (end-sentinel padded — see module docstring). The last level
    is full suffix order (what `suffix_order_ranks` returns); keeping
    the ladder enables the O(log L) LCP walk (`suffix_lcp`) without
    ever materializing a suffix."""
    max_i = positions.agg(F.max("i")).collect()[0][0]
    if max_i is None:  # empty corpus: one level of zero rows, no ladder
        return [(1, positions.select("doc_id", "i", F.lit(0).alias("r")))]
    max_len = max_i + 1
    cur = (
        _dense_rank(positions.select("doc_id", "i", "tok"), ["tok"], "r")
        .select("doc_id", "i", "r")
        .localCheckpoint()
    )
    levels = [(1, cur)]
    span = 1
    while span < max_len:
        shifted = cur.select(
            "doc_id", (F.col("i") - span).alias("i"), F.col("r").alias("r2")
        )
        paired = cur.join(shifted, ["doc_id", "i"], "left").fillna(0, ["r2"])
        cur = (
            _dense_rank(paired, ["r", "r2"], "rn")
            .select("doc_id", "i", F.col("rn").alias("r"))
            .localCheckpoint()
        )
        span *= 2
        levels.append((span, cur))
    return levels


def suffix_lcp(
    pairs: DataFrame, levels: list[tuple[int, DataFrame]], lengths: DataFrame
) -> DataFrame:
    """Token-level LCP of suffix pairs via the rank-level walk — the
    standard Manber–Myers descent: for spans from largest to smallest,
    if both suffixes' rank-at-offset agree, the common prefix extends by
    that span. Each level costs two equi-joins on (doc, position) over
    the PAIR set (never the corpus), so arbitrary-length LCP is
    O(log max_len) joins with only integers moving.

    Equal-rank at a level where a suffix ends inside the span means the
    suffixes are identical to their ends — the walk may overshoot
    there, so the result clamps to both suffixes' remaining lengths
    (exactness proved by tests/test_suffix_ranks.py against directly
    materialized suffixes).

    pairs: (a_doc, a_i, b_doc, b_i); lengths: (doc_id, n_tokens).
    Returns pairs + lcp."""
    cur = pairs.withColumn("done", F.lit(0))
    for span, df in sorted(levels, key=lambda t: -t[0]):
        ra = df.select(
            F.col("doc_id").alias("_rad"),
            F.col("i").alias("_rai"),
            F.col("r").alias("_ra"),
        )
        rb = df.select(
            F.col("doc_id").alias("_rbd"),
            F.col("i").alias("_rbi"),
            F.col("r").alias("_rb"),
        )
        cur = (
            cur.join(
                ra,
                (F.col("a_doc") == F.col("_rad"))
                & (F.col("a_i") + F.col("done") == F.col("_rai")),
                "left",
            )
            .join(
                rb,
                (F.col("b_doc") == F.col("_rbd"))
                & (F.col("b_i") + F.col("done") == F.col("_rbi")),
                "left",
            )
            .withColumn(
                "done",
                F.col("done")
                + F.when(
                    F.col("_ra").isNotNull() & (F.col("_ra") == F.col("_rb")),
                    F.lit(span),
                ).otherwise(F.lit(0)),
            )
            .drop("_rad", "_rai", "_ra", "_rbd", "_rbi", "_rb")
            .localCheckpoint()
        )
    la = lengths.select(
        F.col("doc_id").alias("a_doc"), F.col("n_tokens").alias("_na")
    )
    lb = lengths.select(
        F.col("doc_id").alias("b_doc"), F.col("n_tokens").alias("_nb")
    )
    return (
        cur.join(la, "a_doc")
        .join(lb, "b_doc")
        .withColumn(
            "lcp",
            F.least(
                F.col("done"),
                F.col("_na") - F.col("a_i"),
                F.col("_nb") - F.col("b_i"),
            ),
        )
        .drop("done", "_na", "_nb")
    )
