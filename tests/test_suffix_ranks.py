"""Equivalence of prefix-doubling suffix ranks (operators/suffix.py)
with the direct suffix sort that `plans/substring_sa.py` builds on —
the two constructions must induce the SAME suffix-array order, with
equal ranks exactly for identical suffixes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_auto_spark.operators.suffix import suffix_order_ranks


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    """~100-doc md5-deterministic slice — small enough for a collected
    reference, still containing engineered near-dup pairs (equal-suffix
    ties across documents)."""
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1", "2"))
        .select("doc_id", F.split("text", " ").alias("w"))
        .localCheckpoint()
    )


def test_prefix_doubling_matches_direct_suffix_sort(spark, corpus):
    positions = corpus.select(
        "doc_id", F.posexplode("w").alias("i", "tok")
    )
    ranked = suffix_order_ranks(positions).collect()

    # direct reference: materialize every suffix, sort lexicographically
    suf = {
        (r.doc_id, i): tuple(r.w[i:])
        for r in corpus.collect()
        for i in range(len(r.w))
    }
    assert len(ranked) == len(suf)

    by_rank: dict[int, set] = {}
    for row in ranked:
        by_rank.setdefault(row.r, set()).add(suf[(row.doc_id, row.i)])
    # 1) equal rank -> identical suffix
    for r, sufs in by_rank.items():
        assert len(sufs) == 1, f"rank {r} spans {len(sufs)} distinct suffixes"
    # 2) rank order == lexicographic suffix order
    ordered = [next(iter(by_rank[r])) for r in sorted(by_rank)]
    assert ordered == sorted(ordered)
    # 3) dense: ranks are 1..n_distinct
    assert sorted(by_rank) == list(range(1, len(by_rank) + 1))
    # 4) the fixture's engineered dups produce genuine cross-doc ties
    assert len(by_rank) < len(suf)


def test_dense_rank_helper_is_parallel(spark):
    """The helper's only ordered scan over ALL keys must be the ≤ _NP-row
    offset table: the plan's data-sized window partitions on
    spark_partition_id, never unpartitioned."""
    from data_ingestion_auto_spark.operators.suffix import _dense_rank

    df = spark.range(10_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    out = _dense_rank(df, ["k"], "r")
    got = {(r.k, r.r) for r in out.select("k", "r").distinct().collect()}
    assert got == {(k, k + 1) for k in range(97)}


def test_lcp_walk_matches_direct_lcp(spark, corpus):
    """The rank-level LCP walk (suffix_lcp) must equal directly computed
    token LCP on a deterministic pair sample — including the overshoot
    clamp cases (equal suffixes of different docs, prefix-of-longer)."""
    from data_ingestion_auto_spark.operators.suffix import (
        suffix_lcp,
        suffix_rank_levels,
    )

    rows = corpus.collect()
    docs = {r.doc_id: r.w for r in rows}
    ids = sorted(docs)
    # deterministic pair sample: consecutive doc pairs at a few offsets
    # (mostly LCP 0) PLUS the fixture's engineered near-dup pairs (shared
    # 15-token prefixes → long LCPs exercising the multi-level descent
    # and the overshoot clamp)
    pair_rows = []
    for a, b in zip(ids, ids[1:]):
        for ai, bi in ((0, 0), (1, 0), (0, 2), (3, 3)):
            if ai < len(docs[a]) and bi < len(docs[b]):
                pair_rows.append((a, ai, b, bi))
    by_prefix: dict[tuple, list[int]] = {}
    for d, w in docs.items():
        if len(w) >= 15:
            by_prefix.setdefault(tuple(w[:15]), []).append(d)
    for group in by_prefix.values():
        if len(group) > 1:
            a, b = sorted(group)[:2]
            pair_rows += [(a, 0, b, 0), (a, 2, b, 2), (a, 0, b, 1)]
    pairs = spark.createDataFrame(
        pair_rows, "a_doc long, a_i int, b_doc long, b_i int"
    )
    positions = corpus.select("doc_id", F.posexplode("w").alias("i", "tok"))
    lengths = corpus.select("doc_id", F.size("w").alias("n_tokens"))
    got = {
        (r.a_doc, r.a_i, r.b_doc, r.b_i): r.lcp
        for r in suffix_lcp(pairs, suffix_rank_levels(positions), lengths).collect()
    }

    def direct(a, ai, b, bi):
        sa, sb = docs[a][ai:], docs[b][bi:]
        n = 0
        for x, y in zip(sa, sb):
            if x != y:
                break
            n += 1
        return n

    assert len(got) == len(pair_rows)
    for (a, ai, b, bi) in pair_rows:
        assert got[(a, ai, b, bi)] == direct(a, ai, b, bi), (a, ai, b, bi)
    # the near-dup fixture must exercise a long-LCP pair
    assert max(got.values()) >= 15


def test_empty_input_yields_one_empty_level(spark):
    """ADVICE r8 (low): empty positions used to raise TypeError
    (None + 1) at the max-length probe; now it returns a single empty
    rank level and suffix_order_ranks returns an empty frame."""
    from data_ingestion_auto_spark.operators.suffix import suffix_rank_levels

    empty = spark.createDataFrame([], "doc_id long, i int, tok string")
    levels = suffix_rank_levels(empty)
    assert len(levels) == 1 and levels[0][0] == 1
    assert levels[0][1].count() == 0
    assert suffix_order_ranks(empty).count() == 0


def test_base_span_ladder_matches_base1(spark, corpus):
    """The base-span-8 ladder (array-slice base + alternating arithmetic
    combine) must induce the SAME final suffix order and tie classes as
    the base-1 per-token ladder."""
    from collections import defaultdict

    from data_ingestion_auto_spark.operators.suffix import suffix_rank_levels

    positions = corpus.select("doc_id", F.posexplode("w").alias("i", "tok"))
    r1 = {(r.doc_id, r.i): r.r for r in suffix_order_ranks(positions).collect()}
    r8 = {
        (r.doc_id, r.i): r.r
        for r in suffix_rank_levels(docs=corpus, base_span=8)[-1][1].collect()
    }
    assert set(r1) == set(r8)
    ks = sorted(r1)
    assert sorted(ks, key=lambda k: (r1[k], k)) == sorted(
        ks, key=lambda k: (r8[k], k)
    )
    t1, t8 = defaultdict(set), defaultdict(set)
    for k in ks:
        t1[r1[k]].add(k)
        t8[r8[k]].add(k)
    assert sorted(t1.values(), key=lambda s: min(s)) == sorted(
        t8.values(), key=lambda s: min(s)
    )


def test_lcp_walk_base_span_matches_direct(spark, corpus):
    """suffix_lcp over the base-8 ladder (descent stops at span 8, the
    residue settled by the ≤8-token tail compare) must equal direct
    token LCP — including same-doc pairs and the overshoot clamp."""
    from data_ingestion_auto_spark.operators.suffix import (
        suffix_lcp,
        suffix_rank_levels,
    )

    rows = corpus.collect()
    docs = {r.doc_id: r.w for r in rows}
    ids = sorted(docs)
    pair_rows = []
    for a, b in zip(ids, ids[1:]):
        for ai, bi in ((0, 0), (1, 0), (0, 2), (3, 3), (5, 9)):
            if ai < len(docs[a]) and bi < len(docs[b]):
                pair_rows.append((a, ai, b, bi))
    # same-doc pairs too (adjacency pairs in the real query include them)
    for d, w in docs.items():
        if len(w) > 12:
            pair_rows += [(d, 0, d, 1), (d, 2, d, 7)]
    by_prefix: dict[tuple, list[int]] = {}
    for d, w in docs.items():
        if len(w) >= 15:
            by_prefix.setdefault(tuple(w[:15]), []).append(d)
    for group in by_prefix.values():
        if len(group) > 1:
            a, b = sorted(group)[:2]
            pair_rows += [(a, 0, b, 0), (a, 2, b, 2), (a, 0, b, 1), (a, 9, b, 9)]
    pairs = spark.createDataFrame(
        pair_rows, "a_doc long, a_i int, b_doc long, b_i int"
    )
    lengths = corpus.select("doc_id", F.size("w").alias("n_tokens"))
    levels = suffix_rank_levels(docs=corpus, base_span=8)
    got = {
        (r.a_doc, r.a_i, r.b_doc, r.b_i): r.lcp
        for r in suffix_lcp(pairs, levels, lengths, docs=corpus).collect()
    }

    def direct(a, ai, b, bi):
        n = 0
        for u, v in zip(docs[a][ai:], docs[b][bi:]):
            if u != v:
                break
            n += 1
        return n

    for a, ai, b, bi in pair_rows:
        assert got[(a, ai, b, bi)] == direct(a, ai, b, bi), (a, ai, b, bi)
