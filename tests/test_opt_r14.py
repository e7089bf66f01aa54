"""Focused pins for the round-14 optimization internals: each test pins
an equivalence claim an optimization relies on, on inputs small enough
to brute-force."""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_assign_lit_matches_assign(spark):
    """The literal-centroid map-side argmin must reproduce the
    crossJoin+window `_assign` bit-for-bit, including the NULL-poisoned
    vector (all dist² NULL -> smallest cluster id under both orderings)
    and exact distance ties (same (dist2, cluster_id) tie-break)."""
    from data_ingestion_auto_spark.operators.ivf import (
        _assign,
        _assign_lit,
        cent_df,
        quantize,
    )

    rows = [
        (1, [1.0, 2.0, 3.0]),
        (2, [float("nan"), 1.0, 1.0]),  # quantizes to [NULL, 10000, 10000]
        (3, [0.0, 0.0, 0.0]),
        (4, [1.0, 2.0, 3.0]),
        (5, [100.0, -50.0, 7.25]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v = quantize(emb)
    # centroid 0 and the duplicate of vector 1/4 tie exactly for those
    # vectors; centroid 1 is the zero vector; 2 matches vector 5 exactly
    cent_rows = [(0, [10000, 20000, 30000]), (1, [0, 0, 0]), (2, [1000000, -500000, 72500])]
    a_old = sorted(tuple(r) for r in _assign(v, cent_df(spark, cent_rows), "vec_id").collect())
    a_new = sorted(tuple(r) for r in _assign_lit(v, cent_rows, "vec_id").collect())
    assert a_old == a_new


def test_update_wide_matches_explode(spark):
    """The wide per-dimension `_update(dim=...)` must match the explode
    path, including an all-NULL-vector cluster (which the explode path
    drops entirely) and NULL elements (excluded from sum and count)."""
    from data_ingestion_auto_spark.operators.ivf import _assign_lit, _update, quantize

    rows = [(1, [1.0, 2.0]), (2, [3.0, 5.0]), (3, [float("nan")] * 2)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v = quantize(emb)
    # cluster 1 is far away: only the NULL-poisoned vector lands there
    # (all-NULL dist² -> cluster 0 actually; craft instead two clusters
    # where vectors 1+2 share cluster 0 and nothing real joins cluster 1)
    cent_rows = [(0, [20000, 35000]), (1, [99990000, 99990000])]
    assigned = _assign_lit(v, cent_rows, "vec_id")
    u_old = sorted((r["cluster_id"], tuple(r["cvec"])) for r in _update(assigned).collect())
    u_new = sorted(
        (r["cluster_id"], tuple(r["cvec"])) for r in _update(assigned, dim=2).collect()
    )
    assert u_old == u_new
    # integer-mean check: (10000+30000) div 2, (20000+50000) div 2
    assert u_new == [(0, (20000, 35000))]


def test_cc_frontier_shapes_identical(spark):
    """Frontier-filtered connected components must return the identical
    label table at every (hops, jumps) round shape — semi-naive
    evaluation of the monotone min recursion is exact, not a heuristic.
    The graph mixes a long chain (frontier shrinks to the advancing
    min), a triangle, and isolated pairs."""
    from data_ingestion_auto_spark.operators import dedup as D

    edges = (
        [(i, i + 1) for i in range(20, 40)]  # 20-link chain
        + [(1, 2), (2, 3), (1, 3)]  # triangle
        + [(50, 51), (60, 61)]  # islands
    )
    pairs = spark.createDataFrame(edges, "a long, b long")
    ref = None
    for h, j in ((5, 1), (3, 3), (1, 0), (4, 2)):
        out = sorted(
            (r["node"], r["component"])
            for r in D.connected_components(
                pairs, hops_per_round=h, jumps_per_round=j, max_iter=40
            ).collect()
        )
        if ref is None:
            ref = out
        assert out == ref
    # ground truth: chain -> 20, triangle -> 1, islands -> 50/60
    truth = {n: 20 for n in range(20, 41)}
    truth.update({1: 1, 2: 1, 3: 1, 50: 50, 51: 50, 60: 60, 61: 60})
    assert dict(ref) == truth


def test_sql_str_literal_roundtrips_both_parser_modes(spark):
    """The VALUES-literal escaping must survive BOTH parser modes
    (ADVICE r13): default mode backslash-escapes, legacy
    escapedStringLiterals takes backslashes raw."""
    from data_ingestion_auto_spark.plans.tokenizer import _sql_str_literal

    cases = ["plain", "it's", "back\\slash", "both\\'s", "\\\\double", "tick''s"]
    prior = spark.conf.get("spark.sql.parser.escapedStringLiterals", "false")
    try:
        for mode in ("false", "true"):
            spark.conf.set("spark.sql.parser.escapedStringLiterals", mode)
            legacy = mode == "true"
            for s in cases:
                got = spark.sql(
                    f"SELECT {_sql_str_literal(s, legacy)} AS v"
                ).collect()[0]["v"]
                assert got == s, (mode, s, got)
    finally:
        spark.conf.set("spark.sql.parser.escapedStringLiterals", prior)


def test_sort_small_call_sites_are_pinned():
    """sort_small funnels its whole input through ONE task — safe only
    for outputs bounded by construction (ADVICE r13). Pin the call sites
    so a data-sized caller can't slip in silently: additions must be
    reviewed against the bounded-output contract and added here."""
    import re
    import subprocess

    out = subprocess.run(
        ["grep", "-rn", r"sort_small(", os.path.join(REPO, "data_ingestion_auto_spark")],
        capture_output=True,
        text=True,
    ).stdout
    files = sorted(
        {
            os.path.relpath(line.split(":", 1)[0], REPO)
            for line in out.splitlines()
            if line.strip() and "def sort_small" not in line
        }
    )
    allowed = {
        "data_ingestion_auto_spark/plans/binary_decode.py",  # fixed raster dims
        "data_ingestion_auto_spark/plans/contour.py",  # fixed-grid segment inventory
        "data_ingestion_auto_spark/plans/helpers.py",  # the definition module
        "data_ingestion_auto_spark/plans/warp.py",  # fixed output grids
        "data_ingestion_auto_spark/plans/warp_kernels.py",  # fixed output grids
    }
    assert set(files) <= allowed, f"unreviewed sort_small call sites: {files}"


def test_assign_grouped_matches_window_argmin(spark):
    """The grouped argmin's min over struct(dist2 IS NULL, dist2,
    fine_id, ...) must replay the old row_number window's
    (asc_nulls_last(dist2), fine_id) order — including a MIXED-null
    group (one fine centroid with a NULL dimension poisons only its own
    dist², so the leading null flag is load-bearing, unlike
    _assign_lit's all-or-none case)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_ingestion_auto_spark.operators.ivf import _DIST2, _assign_grouped

    vectors = spark.createDataFrame(
        [(1, 0, [1, 2]), (2, 0, [9, 9]), (3, 1, [5, 5])],
        "vec_id long, group_id int, qvec array<bigint>",
    )
    # group 0: fine 0 has a NULL dimension (dist² NULL for every vector
    # probing it), fine 1 is sane — the window ranks fine 1 first, and
    # so must the min-struct; group 1: exact tie on dist² breaks to the
    # smaller fine_id.
    centroids = spark.createDataFrame(
        [(0, 0, [None, 2]), (0, 1, [1, 2]), (1, 0, [5, 6]), (1, 1, [5, 4])],
        "group_id int, fine_id int, cvec array<bigint>",
    )
    got = sorted(tuple(r) for r in _assign_grouped(vectors, centroids, "vec_id").collect())
    d = vectors.join(centroids, "group_id").withColumn(
        "dist2", F.expr(_DIST2.format(a="qvec", b="cvec"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc_nulls_last("dist2"), "fine_id")
    ref = sorted(
        tuple(r)
        for r in d.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("vec_id", "group_id", "qvec", "fine_id", "dist2")
        .collect()
    )
    assert got == ref
    # and the NULL-dimension centroid never wins while a sane one exists
    by_id = {r[0]: r for r in got}
    assert by_id[1][3] == 1 and by_id[2][3] == 1  # group-0 vectors -> fine 1
    assert by_id[3][3] == 0  # tie in group 1 -> smaller fine_id


def test_min_struct_top1_matches_window(spark):
    """top_ngram_char_fraction's argmin fold: min over
    struct(-c, bigram) must equal row_number over (c DESC, bigram ASC)
    including exact count ties."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows = [
        (1, "aa", 3), (1, "ab", 3), (1, "zz", 5),
        (2, "mm", 1), (2, "aa", 1),
    ]
    df = spark.createDataFrame(rows, "doc_id long, bigram string, c long")
    w = W.partitionBy("doc_id").orderBy(F.col("c").desc(), "bigram")
    via_window = {
        (r["doc_id"], r["bigram"], r["c"])
        for r in df.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
    }
    via_min = {
        (r["doc_id"], r["t"]["bigram"], r["t"]["c"])
        for r in df.groupBy("doc_id")
        .agg(F.min(F.struct((-F.col("c")).alias("negc"), "bigram", "c")).alias("t"))
        .collect()
    }
    assert via_window == via_min == {(1, "zz", 5), (2, "aa", 1)}
