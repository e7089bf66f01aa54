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
