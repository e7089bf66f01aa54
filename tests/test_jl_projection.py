"""JL random-sign projection (plans/jl_projection.py): the engine
expression equals a pure-Python reference, and the measured distortion
tracks what the lemma predicts.

For unit vectors u, v with angle θ, a ±1/√d' sign projection gives
cos_proj − cos_exact approximately N(0, c/d') with c ≈ 1 for the
near-orthogonal pairs this fixture has, so E|Δcos| ≈ √(2/π)/√d'. The
test pins the MEASURED mean into [0.5×, 2×] of that prediction — loose
enough to never flake (4,950 pairs), tight enough to catch a wrong sign
matrix, a truncated projection, or a norm bug (any of which push the
mean toward 0 or toward the ~0.8 of uncorrelated cosines).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_ingestion_auto_spark.plans.jl_projection import (
    _D_IN,
    _D_OUT,
    _SIGNS,
    _SPARK_PROJ,
)


def test_engine_projection_equals_python_reference(spark):
    vec = [((-1) ** j) * (j + 1) / 100.0 for j in range(_D_IN)]
    df = spark.createDataFrame([(0, vec)], "vec_id long, embedding array<double>")
    q = [round(x * 10000.0) for x in vec]
    want = [sum(int(q[j]) * _SIGNS[i][j] for j in range(_D_IN)) for i in range(_D_OUT)]
    got = (
        df.selectExpr(
            "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qvec"
        )
        .selectExpr(f"{_SPARK_PROJ} AS pvec")
        .collect()[0]["pvec"]
    )
    assert list(got) == want


def test_sign_matrix_is_balanced_and_deterministic():
    # md5-derived signs: deterministic across runs/processes, and no
    # output dimension is degenerate (all-same-sign rows project every
    # vector onto the same ray)
    from data_ingestion_auto_spark.plans.jl_projection import _jl_signs

    assert _jl_signs() == _SIGNS
    for row in _SIGNS:
        assert len(row) == _D_IN
        assert {1, -1} == set(row)
        # crude balance: between 25% and 75% positive
        pos = sum(1 for s in row if s == 1)
        assert _D_IN // 4 <= pos <= 3 * _D_IN // 4


def test_measured_distortion_tracks_the_lemma(spark, sf_dir):
    from data_ingestion_auto_spark import plans

    df = plans.REGISTRY["jl_projection_distortion"].spark(spark, sf_dir)
    r = df.select(
        F.avg(F.abs(F.col("cos_exact") - F.col("cos_proj"))).alias("mean_err"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert r["n"] == 4950
    predicted = math.sqrt(2.0 / math.pi) / math.sqrt(_D_OUT)
    assert 0.5 * predicted <= r["mean_err"] <= 2.0 * predicted
