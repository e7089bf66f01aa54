"""AMS F2 sketch (plans/sketches.py::ams_f2_estimate): engine sketch
values equal a pure-Python reference, and the estimator lands within
its variance envelope on the fixture."""

from __future__ import annotations

import hashlib

from data_ingestion_auto_spark.plans.sketches import _AMS_K


def _sign(sk: int, token: str) -> int:
    return 1 if hashlib.md5(f"{sk}|{token}".encode()).hexdigest()[0] in "89abcdef" else -1


def test_engine_equals_python_reference(spark):
    import os
    import tempfile

    from data_ingestion_auto_spark import plans

    docs = [
        (0, "a a a b c"),
        (1, "b c d d d d"),
        (2, "e"),
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))

    toks = [t for _, txt in docs for t in txt.split(" ")]
    from collections import Counter

    c = Counter(toks)
    f2 = sum(v * v for v in c.values())  # 9+4+4+16+1 = 34
    assert f2 == 34
    ests = []
    for sk in range(_AMS_K):
        s = sum(_sign(sk, t) for t in toks)
        ests.append(s * s)
    want_mean = sum(ests) // _AMS_K

    row = plans.REGISTRY["ams_f2_estimate"].spark(spark, d).collect()[0]
    assert row.f2_exact == f2
    assert row.est_mean == want_mean
    assert row.est_min == min(ests) and row.est_max == max(ests)


def test_fixture_estimate_within_variance_envelope(spark, sf_dir):
    from data_ingestion_auto_spark import plans

    row = plans.REGISTRY["ams_f2_estimate"].spark(spark, sf_dir).collect()[0]
    assert row.f2_exact > 0
    # Var[mean of k] = 2 F2^2 / k -> std ~ 0.35 F2 at k=16; 5 sigma
    assert abs(row.err_ppm) <= 1_800_000
    # identity between the reported mean and the reported error
    err = (
        (row.est_mean - row.f2_exact) * 1_000_000 // row.f2_exact
        if row.est_mean >= row.f2_exact
        else -((row.f2_exact - row.est_mean) * 1_000_000 // row.f2_exact)
    )
    assert err == row.err_ppm
