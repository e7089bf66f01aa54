"""Deduplication operators for large-scale text corpora.

Four tiers, all pure DataFrame compositions (no Python UDFs — every hash is
Spark's built-in ``md5``, so plans stay in whole-stage codegen and results
are engine-portable):

- exact:       hash-groupBy on a content digest
- n-gram Jaccard: shingle explode → self-join on shingle → pair agg
- MinHash:     k permutations via keyed md5, min per permutation
- MinHash-LSH: band the signature, bucket-join — the 100 TB path: candidate
  generation is linear in corpus size (shuffle on band key), never the
  quadratic all-pairs join.

SimHash lives in plans/dedup.py as generated bit expressions.

Scale notes: at 100 TB the only viable near-dup path is MinHash-LSH (or
SimHash bucketing): shingle self-joins are quadratic in bucket size. The
LSH design keeps every shuffle keyed on (band_id, band_hash) whose
cardinality grows with the corpus, so buckets stay small; skewed buckets
(boilerplate shingles) are handled by AQE skew-join or by capping bucket
size before the pair expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_digest(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-dup digest: md5 of the raw content."""
    return df.withColumn("digest", F.md5(F.col(text_col)))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the smallest id per identical content; report group size.

    One shuffle on the digest; map-side partial agg keeps the shuffle
    proportional to distinct contents.
    """
    return (
        content_digest(df, text_col)
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5) -> DataFrame:
    """Distinct k-character shingles per document (positional substrings).

    posexplode over a sequence of start offsets — stays JVM-side; the
    distinct collapses repeated shingles before any join.
    """
    n = f"greatest(length({text_col}) - {k - 1}, 1)"
    return (
        df.select(
            F.col(id_col),
            F.explode(F.expr(f"transform(sequence(1, {n}), i -> substring({text_col}, i, {k}))")).alias(
                "shingle"
            ),
        )
        .distinct()
    )


def jaccard_pairs(
    sh: DataFrame, sizes: DataFrame, id_col: str = "doc_id", threshold: float = 0.5
) -> DataFrame:
    """All-pairs n-gram Jaccard via shingle self-join (small-corpus tier;
    LSH below is the scale path). Pairs restricted to a < b."""
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signature(sh: DataFrame, id_col: str = "doc_id", num_perm: int = 16) -> DataFrame:
    """MinHash signature: permutation i = md5(i || '|' || shingle); the
    signature element is the lexicographic MIN digest — a pure-string
    minhash that is identical in any engine with md5.

    Output: (id, perm, minhash) long form — one shuffle on id.
    """
    perms = F.explode(F.expr(f"sequence(0, {num_perm - 1})")).alias("perm")
    return (
        sh.select(F.col(id_col), F.col("shingle"), perms)
        .withColumn("h", F.md5(F.concat_ws("|", F.col("perm"), F.col("shingle"))))
        .groupBy(id_col, "perm")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidates(
    sig: DataFrame, id_col: str = "doc_id", bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature and emit candidate pairs sharing any band bucket.

    band_hash = md5 of the band's minhashes in perm order (deterministic
    string agg). The pair join is per (band, band_hash) bucket — linear
    candidate generation, the LSH scale path.
    """
    banded = (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.array_join(
                    F.expr("transform(array_sort(collect_list(struct(perm, minhash))), s -> s.minhash)"),
                    "|",
                )
            ).alias("band_hash")
        )
    )
    a = banded.select(F.col(id_col).alias("a"), "band", "band_hash")
    b = banded.select(F.col(id_col).alias("b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
