"""The approx-binned decile profile must track the exact ntile profile:
per-decile counts within tolerance and value ranges consistent — the
contract that lets the sketch tier replace the global-sort tier at
scale."""

from __future__ import annotations


def test_binned_deciles_track_exact(spark, sf_dir):
    from data_ingestion_auto_spark import plans

    exact = {
        r["decile"]: r
        for r in plans.REGISTRY["order_value_deciles"].spark(spark, sf_dir).collect()
    }
    binned = {
        r["decile"]: r
        for r in plans.REGISTRY["order_value_deciles_binned"].spark(spark, sf_dir).collect()
    }
    assert set(binned) == set(exact) == set(range(1, 11))
    total = sum(r["n"] for r in exact.values())
    for d in range(1, 11):
        # counts within 5% of the ideal tile size
        assert abs(binned[d]["n"] - total / 10) <= total * 0.05, (d, binned[d]["n"])
        # value ranges nest sanely: each binned decile's lo/hi within one
        # exact-decile neighbourhood
        lo_ok = exact[max(1, d - 1)]["lo"] <= binned[d]["lo"] <= exact[min(10, d + 1)]["hi"]
        hi_ok = exact[max(1, d - 1)]["lo"] <= binned[d]["hi"] <= exact[min(10, d + 1)]["hi"]
        assert lo_ok and hi_ok, (d, binned[d])


def test_binned_deciles_small_sample_matches_oracle(spark, tmp_path):
    """Round-9 ADVICE: a tiny orders table used to KeyError (target rank
    i*(n+1)//10 = 0 or absent) while the DuckDB oracle degraded to NULL
    edges. Both engines must now agree on the degenerate profile: with
    every edge NULL/absent, all rows land in decile 1."""
    import duckdb

    from data_ingestion_auto_spark import plans

    d = tmp_path / "tiny"
    d.mkdir()
    rows = [(k, 100.0 + k) for k in range(1, 7)]
    spark.createDataFrame(rows, "o_orderkey long, o_totalprice double").coalesce(
        1
    ).write.parquet(str(d / "orders.parquet"))
    got = (
        plans.REGISTRY["order_value_deciles_binned"].spark(spark, str(d)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet/*.parquet'"
    )
    want = con.execute(plans.REGISTRY["order_value_deciles_binned"].oracle).fetchall()
    assert [(r["decile"], r["n"], r["lo"], r["hi"]) for r in got] == [
        tuple(w) for w in want
    ]


def test_partition_plan_is_balanced_and_total(spark, sf_dir):
    """The sampled equi-depth boundaries must cover every row (buckets
    sum to the table) and actually balance: no bucket beyond 3x the
    ideal load on the fixture, ranges non-overlapping and ordered."""
    from data_ingestion_auto_spark import plans
    from data_ingestion_auto_spark.plans.helpers import T

    rows = sorted(
        plans.REGISTRY["partition_plan_histogram"].spark(spark, sf_dir).collect(),
        key=lambda r: r.bucket,
    )
    total = sum(r.n_rows for r in rows)
    assert total == T(spark, sf_dir, "lineitem").count()
    assert 1 <= len(rows) <= 32
    for r in rows:
        assert r.lo <= r.hi
        assert r.load_ppm <= 3_000_000
    # buckets partition the key space: ranges ordered (adjacent buckets
    # may share a boundary key value, but never invert)
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
