"""Decompose the fixed per-query overhead the bench pays 218 times.

Times a ladder of trivial actions under the engine session (and conf
toggles) to attribute the ~0.5-0.9s floor observed for scan+project+noop
at sf0.1: is it Py4J construction, Catalyst planning, AQE stage breaks,
speculation bookkeeping, the noop commit, or task scheduling?

Usage: python3 tools/overhead_probe.py [toggle ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_ingestion_auto_spark.session import get_session  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(fn, n=5):
    best = float("inf")
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        ts.append(dt)
        best = min(best, dt)
    ts.sort()
    return best, ts[len(ts) // 2]


def main() -> None:
    extra = {}
    for a in sys.argv[1:]:
        k, _, v = a.partition("=")
        extra[k] = v
    spark = get_session("overhead_probe", extra_conf=extra)
    # toggles applied as runtime confs where possible
    for k, v in extra.items():
        try:
            spark.conf.set(k, v)
        except Exception as e:  # noqa: BLE001
            print("conf-set-failed", k, e)
    noop = lambda df: df.write.mode("overwrite").format("noop").save()  # noqa: E731

    region = spark.read.parquet(f"{SF}/region.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")

    # Warm everything once
    noop(orders.select("o_orderkey"))
    noop(region)

    ladder = {
        # pure JVM action floor: no files, no python
        "range1_noop": lambda: noop(spark.range(1)),
        "range1_count": lambda: spark.range(1).count(),
        # tiny file scan (5 rows)
        "region_noop": lambda: noop(region),
        # 150k-row scan+project
        "orders_proj_noop": lambda: noop(orders.select("o_orderkey", "o_totalprice")),
        # plan construction only (no action): Py4J + analysis
        "orders_proj_construct": lambda: orders.select(
            "o_orderkey", "o_totalprice"
        ).schema,
        # fresh read.parquet each time (listing + footer)
        "fresh_read_construct": lambda: spark.read.parquet(
            f"{SF}/orders.parquet"
        ).select("o_orderkey").schema,
        # scan+filter+agg (1 shuffle)
        "orders_agg_noop": lambda: noop(
            orders.groupBy("o_orderstatus").agg(F.sum("o_totalprice"))
        ),
        # join (broadcast) + agg
        "join_agg_noop": lambda: noop(
            orders.join(nation, orders.o_custkey % 25 == nation.n_nationkey)
            .groupBy("n_name")
            .count()
        ),
    }
    for name, fn in ladder.items():
        best, med = t(fn)
        print(f"{name:26s} best={best:7.3f} med={med:7.3f}", flush=True)


if __name__ == "__main__":
    main()
