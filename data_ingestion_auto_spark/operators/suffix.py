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
  distributed in one range exchange (range-partition the rows,
  dense_rank per partition in parallel, add broadcast per-partition
  distinct-key offsets), never a single-partition global window;
- the rank-at-offset lookup is a self equi-join on (doc_id, i + 2^k) —
  positions past the document end rank 0, which sorts before every real
  rank (a shorter suffix is a prefix of the longer → sorts first),
  reproducing the sentinel-termination of the single-machine build;
- each round's ranked frame is durably cut inside `_dense_rank`
  (``checkpoints.ckpt`` — reliable checkpoint dir when configured,
  localCheckpoint fallback — same iterative-lineage discipline as
  kmeans_lite / connected_components), which doubles as the
  partitioning pin its docstring explains.

Equal suffixes (identical token runs ending two documents) keep equal
ranks — exactly the tie semantics the direct sort produces via its
deterministic (suf, doc_id, i) tie-break, checked by the equivalence
test (tests/test_suffix_ranks.py) against `substring_sa`'s direct sort
on the fixture corpus.

Cost model at 100 TB: rounds = log2(longest document), each round =
one distinct + two bounded exchanges over position-count integer pairs
(the range partition, then the window's _pid hash re-partition — see
_dense_rank) + one equi-join — no token arrays move after round 0. The direct sort in
plans/substring_sa.py stays the default while the corpus contract caps
document length; this operator is the escape hatch when it doesn't.

Reference scope: LLM-pipeline tier (COVERAGE.md); reference dedup is
file-level state skips (ingest/__init__.py:118-135).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..checkpoints import ckpt

_NP = 32
_ROWS_PER_PART = 50_000  # target ladder rows per sort partition


def _adaptive_np(n_rows: int) -> int:
    """Range-partition count proportional to data (one partition per
    ~50k rows), floored at 4 for parallelism and capped at _NP locally;
    on a real cluster raise _NP with the executor count."""
    return max(4, min(_NP, int(n_rows) // _ROWS_PER_PART + 1))


def _dense_rank(
    df: DataFrame, cols: list[str], out: str, np: int | None = None
) -> DataFrame:
    """Distributed dense rank over ``cols``: range-partition the ROWS so
    partitions are totally key-ordered (equal keys land together by the
    range-partitioner contract), dense_rank within each partition IN
    PARALLEL (windows keyed on spark_partition_id), then add each
    partition's broadcast cumulative distinct-key offset. The only
    ordered pass over all keys is the ≤ _NP-row offset scan.

    Exchange accounting (corrected r11 after a live-plan check): the
    range partition is followed by a SECOND full-data exchange — Spark
    hash-partitions on _pid to satisfy the window, because the range
    partitioning on ``cols`` does not advertise distribution-by-_pid.
    So this is TWO bounded parallel exchanges per call, not one; the
    property actually being defended (and what the round-9 rewrite
    bought vs the distinct + join-back construction's three extra
    exchanges) is NO single-partition global window anywhere — every
    exchange here is np-way parallel over (key, id) integer pairs.

    The locally-ranked frame is EAGERLY checkpointed before the offset
    scan: ``spark_partition_id`` over a range exchange is
    execution-dependent (sampled bounds + nondeterministic shuffle
    fetch order), so letting the offset branch and the output branch
    re-execute the exchange independently can misalign _pid between
    them and collide ranks across partitions (observed: ~700 collisions
    on a 26k-key ladder base before the cut). The cut pins ONE
    partitioning that both branches read.

    ``np`` is the range-partition count: callers that know the row
    count pass the adaptive value from `_adaptive_np` so partition
    count tracks data size (a 270k-row ladder level needs a handful of
    sort partitions, a 10^12-row one needs thousands — a constant
    would be wrong at both ends)."""
    pid = df.repartitionByRange(np or _NP, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    wo = W.partitionBy("_pid").orderBy(*cols)
    local = ckpt(pid.withColumn("_lr", F.dense_rank().over(wo)))
    counts = local.groupBy("_pid").agg(F.max("_lr").alias("_n"))
    woff = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offs = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(woff), F.lit(0))
    ).select("_pid", "_off")
    return local.join(F.broadcast(offs), "_pid").select(
        *df.columns, (F.col("_lr") + F.col("_off")).alias(out)
    )


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


def suffix_rank_levels(
    positions: DataFrame | None = None,
    docs: DataFrame | None = None,
    base_span: int = 1,
) -> list[tuple[int, DataFrame]]:
    """Prefix-doubling rank LEVELS: [(span, ranks)] where each ranks
    DataFrame (doc_id, i, r) orders suffixes by their first ``span``
    tokens (end-sentinel padded — see module docstring). The last level
    is full suffix order (what `suffix_order_ranks` returns); keeping
    the ladder enables the O(log L) LCP walk (`suffix_lcp`) without
    ever materializing a suffix.

    Two base constructions:

    - ``positions`` (doc_id, i, tok) with ``base_span=1``: the classic
      per-token base — ceil(log2(max_len)) doubling rounds;
    - ``docs`` (doc_id, w token arrays) with ``base_span=k``: the base
      level ranks by the first k tokens directly (one dense rank over
      length-≤k array slices — array<string> is range-orderable and its
      shorter-is-prefix-first ordering IS the end-sentinel semantics),
      saving log2(k) doubling rounds. `suffix_lcp` then needs ``docs``
      too, for the ≤k-token tail compare its descent leaves.

    Doubling rounds alternate between dense-rank COMPACTION and a free
    ARITHMETIC combine: after a compacted level (r ≤ n_positions), the
    next level's key ``r * (n+1) + r2`` is order- and
    equality-preserving with no exchange at all — a rank round only has
    to follow to bring the domain back under n before the next combine.
    The combine is used only while (n+1)² fits a bigint (n < ~3e9
    positions); past that every round compacts, so the construction is
    exact at any scale and merely stops taking the shortcut. Levels
    need not be dense — the walk (`suffix_lcp`) compares for equality
    and `sa_positions` only needs order — except the base-1 path's
    final level, which `suffix_order_ranks` documents as dense and
    which always ends on a compaction round there.
    """
    if base_span > 1:
        if docs is None:
            raise ValueError("base_span > 1 requires docs (doc_id, w)")
        max_len, n_pos = docs.agg(
            F.max(F.size("w")), F.sum(F.size("w"))
        ).collect()[0]
        if max_len is None:  # empty corpus
            return [
                (
                    base_span,
                    docs.select(
                        "doc_id", F.lit(0).alias("i"), F.lit(0).alias("r")
                    ),
                )
            ]
        base_keys = docs.select(
            "doc_id",
            F.posexplode(
                F.expr(f"transform(w, (x, j) -> slice(w, j + 1, {base_span}))")
            ).alias("i", "key"),
        )
        np = _adaptive_np(n_pos)
        # no outer ckpt: _dense_rank materializes its ranked frame
        # internally; the residual lineage (broadcast-offset join) is flat
        cur = _dense_rank(base_keys, ["key"], "r", np=np).select(
            "doc_id", "i", "r"
        )
        levels = [(base_span, cur)]
        span = base_span
    else:
        if positions is None:
            raise ValueError("base_span == 1 requires positions (doc_id, i, tok)")
        max_i, n_pos = positions.agg(F.max("i"), F.count(F.lit(1))).collect()[0]
        if max_i is None:  # empty corpus: one level of zero rows, no ladder
            return [(1, positions.select("doc_id", "i", F.lit(0).alias("r")))]
        max_len = max_i + 1
        np = _adaptive_np(n_pos)
        cur = _dense_rank(
            positions.select("doc_id", "i", "tok"), ["tok"], "r", np=np
        ).select("doc_id", "i", "r")
        levels = [(1, cur)]
        span = 1
    # arithmetic combine is sound only after a COMPACTED level and while
    # (n+1)^2 fits a bigint; mult > max(r) makes (r, r2) -> r*mult + r2
    # injective and lexicographic.
    mult = int(n_pos) + 1
    can_arith = mult * mult < (1 << 62)
    compacted = True
    while span < max_len:
        shifted = cur.select(
            "doc_id", (F.col("i") - span).alias("i"), F.col("r").alias("r2")
        )
        paired = cur.join(shifted, ["doc_id", "i"], "left").fillna(0, ["r2"])
        span *= 2
        if can_arith and compacted and (span < max_len or base_span > 1):
            # free combine; the NEXT round must compact. The base-1
            # path's final level never takes it, keeping the density
            # `suffix_order_ranks` documents.
            cur = ckpt(
                paired.select(
                    "doc_id",
                    "i",
                    (F.col("r") * F.lit(mult) + F.col("r2")).alias("r"),
                )
            )
            compacted = False
        else:
            cur = _dense_rank(paired, ["r", "r2"], "rn", np=np).select(
                "doc_id", "i", F.col("rn").alias("r")
            )
            compacted = True
        levels.append((span, cur))
    return levels


_TAIL_LCP = (
    "CASE WHEN array_position("
    "zip_with({a}, {b}, (x, y) -> CASE WHEN x <=> y THEN 0 ELSE 1 END), 1) = 0 "
    "THEN least(size({a}), size({b})) ELSE array_position("
    "zip_with({a}, {b}, (x, y) -> CASE WHEN x <=> y THEN 0 ELSE 1 END), 1) - 1 END"
)


def suffix_lcp(
    pairs: DataFrame,
    levels: list[tuple[int, DataFrame]],
    lengths: DataFrame,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Token-level LCP of suffix pairs via the rank-level walk — the
    standard Manber–Myers descent: for spans from largest to smallest,
    if both suffixes' rank-at-offset agree, the common prefix extends by
    that span. Each level costs two equi-joins on (doc, position) over
    the PAIR set (never the corpus), so arbitrary-length LCP is
    O(log max_len) joins with only integers moving. The whole descent
    is ONE lazy plan (no per-level materialization — the rank levels
    are already durably cut, and the pair set threads through as
    integer columns).

    When the ladder's smallest span k is > 1 (base-span construction),
    the descent resolves LCP to a multiple of k with residue < k; the
    residue is settled exactly by ONE direct compare of the next ≤k
    tokens (slice from ``docs``'s w arrays at offset done — required
    in that case).

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
        )
    min_span = min(s for s, _ in levels)
    if min_span > 1:
        if docs is None:
            raise ValueError("base-span ladder requires docs for the tail")
        wa = docs.select(F.col("doc_id").alias("a_doc"), F.col("w").alias("_wa"))
        wb = docs.select(F.col("doc_id").alias("b_doc"), F.col("w").alias("_wb"))
        cur = (
            cur.join(wa, "a_doc")
            .join(wb, "b_doc")
            .withColumn(
                "_ta", F.expr(f"slice(_wa, a_i + done + 1, {min_span})")
            )
            .withColumn(
                "_tb", F.expr(f"slice(_wb, b_i + done + 1, {min_span})")
            )
            .withColumn(
                "done",
                F.col("done") + F.expr(_TAIL_LCP.format(a="_ta", b="_tb")),
            )
            .drop("_wa", "_wb", "_ta", "_tb")
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


def sa_positions(ranks: DataFrame, np: int | None = None) -> DataFrame:
    """Global suffix-array POSITION for each ranked suffix: row number
    in (r, doc_id, i) order — the same total order the direct sort's
    (suf, doc_id, i) key induces, since equal r ⇔ identical suffixes.

    Built with the `_dense_rank` construction (range-partition the
    keys, row_number per partition in parallel, broadcast cumulative
    offsets); the keys are unique, so dense rank == row number.
    Suffix-array ADJACENCY then becomes a plain self equi-join on
    ``pos == pos - 1`` — no data-sized global window and no
    partition-seam fix-up at all."""
    return _dense_rank(ranks, ["r", "doc_id", "i"], "pos", np=np).select(
        "doc_id", "i", "pos"
    )
