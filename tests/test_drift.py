"""Exact two-sample KS (plans/drift.py): hand-checkable crafted case +
the metric axioms on the fixture matrix."""

from __future__ import annotations

import os
import tempfile

import duckdb

from data_ingestion_auto_spark import plans
from data_ingestion_auto_spark.plans.drift import ks_drift_matrix


def test_crafted_ks_value_and_engine_parity(spark):
    """A = lengths {1,2,3,4}, B = {3,4,5,6}: F_A(2)=1/2, F_B(2)=0, and no
    x gives a larger gap -> D = 1/2 exactly (d_num = 8 over n_a*n_b=16).
    C == A -> D(A,C) = 0. Spark == oracle on the crafted corpus."""
    docs = []
    did = 0
    for src, lens in (("a", [1, 2, 3, 4]), ("b", [3, 4, 5, 6]), ("c", [1, 2, 3, 4])):
        for ln in lens:
            docs.append((did, " ".join(["w"] * ln), src))
            did += 1
    d = tempfile.mkdtemp()
    spark.createDataFrame(docs, "doc_id long, text string, source string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        (r.source_a, r.source_b): (r.d_num, r.n_a, r.n_b, r.d_stat)
        for r in ks_drift_matrix(spark, d).collect()
    }
    assert got[("a", "b")] == (8, 4, 4, 0.5)
    assert got[("a", "c")] == (0, 4, 4, 0.0)
    assert got[("b", "c")] == (8, 4, 4, 0.5)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    want = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in con.execute(plans.REGISTRY["ks_drift_matrix"].oracle).fetchall()
    }
    assert got == want


def test_fixture_matrix_axioms(spark, sf_dir):
    rows = ks_drift_matrix(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # D in [0, 1], exact rational consistency
        assert 0.0 <= r.d_stat <= 1.0
        assert r.d_stat == r.d_num / (r.n_a * r.n_b)
        assert r.source_a < r.source_b


def test_crafted_tvd_value_and_engine_parity(spark):
    """A = {x:2, y:2}, B = {y:1, z:3} (4 tokens each):
    TVD = 1/2(|1/2-0| + |1/2-1/4| + |0-3/4|) = 3/4 exactly —
    tvd_num = |2*4-1*4| (shared y) + (4-2)*4 (a-only x) + (4-1)*4
    (b-only z) = 24 over 2*16 = 32. C == A -> 0, disjoint D -> 1.
    Spark == oracle on the crafted corpus."""
    import os
    import tempfile

    import duckdb

    from data_ingestion_auto_spark import plans
    from data_ingestion_auto_spark.plans.drift import unigram_tvd_matrix

    corpus = (
        (0, "x x y", "a"),
        (1, "y", "a"),
        (2, "y z z", "b"),
        (3, "z", "b"),
        (4, "x x y", "c"),
        (5, "y", "c"),
        (6, "q q q q", "d"),  # vocabulary disjoint from everyone
    )
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        list(corpus), "doc_id long, text string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        (r.source_a, r.source_b): (r.n_a, r.n_b, r.shared_vocab, r.tvd_num, r.tvd)
        for r in unigram_tvd_matrix(spark, d).collect()
    }
    assert got[("a", "b")] == (4, 4, 1, 24, 0.75)
    assert got[("a", "c")] == (4, 4, 2, 0, 0.0)
    assert got[("a", "d")] == (4, 4, 0, 32, 1.0)  # disjoint vocab -> TVD 1
    assert got[("b", "c")] == (4, 4, 1, 24, 0.75)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    want = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5], r[6])
        for r in con.execute(plans.REGISTRY["unigram_tvd_matrix"].oracle).fetchall()
    }
    assert got == want


def test_tvd_fixture_matrix_axioms(spark, sf_dir):
    from data_ingestion_auto_spark.plans.drift import unigram_tvd_matrix

    rows = unigram_tvd_matrix(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.tvd <= 1.0
        assert r.tvd == r.tvd_num / (2.0 * r.n_a * r.n_b)
        assert r.source_a < r.source_b
        # shared-vocab coverage never exceeds either side's token mass
        assert r.shared_vocab <= min(r.n_a, r.n_b) or r.shared_vocab <= 64


def test_crafted_trimmed_mean_drops_the_outlier(spark):
    """Source a: lengths 1..9 plus a 1000-token outlier (n=10, trim 1
    each side) -> kept 2..9, mean 5.5 while the raw mean is 103.9; the
    outlier never reaches the statistic. Source b: n=5 -> floor(5/10)=0,
    nothing trimmed, plain mean. Spark == oracle on the crafted corpus."""
    import os
    import tempfile

    import duckdb

    from data_ingestion_auto_spark import plans
    from data_ingestion_auto_spark.plans.drift import trimmed_mean_length

    docs = []
    did = 0
    for ln in list(range(1, 10)) + [1000]:
        docs.append((did, " ".join(["w"] * ln), "a"))
        did += 1
    for ln in (2, 4, 6, 8, 10):
        docs.append((did, " ".join(["w"] * ln), "b"))
        did += 1
    d = tempfile.mkdtemp()
    spark.createDataFrame(docs, "doc_id long, text string, source string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        r.source: (r.n_docs, r.n_trimmed_each_side, r.n_kept, r.kept_len_sum, r.trimmed_mean)
        for r in trimmed_mean_length(spark, d).collect()
    }
    assert got["a"] == (10, 1, 8, 44, 5.5)
    assert got["b"] == (5, 0, 5, 30, 6.0)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    want = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(plans.REGISTRY["trimmed_mean_length"].oracle).fetchall()
    }
    assert got == want
