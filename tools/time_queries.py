"""Fine-grained per-query timing: construction vs noop-execution split.

Usage: python tools/time_queries.py [--reps N] name [name ...]
       python tools/time_queries.py --all

Times, per query: t_construct (REGISTRY[name].spark(...) — includes any
eager subtrees / memo builds on first touch) and t_exec (noop sink write),
best-of-N for each. Memo state is whatever the process has built so far —
run a query twice to see its steady-state split. Prints one line per rep
so build-vs-steady is visible.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from data_ingestion_auto_spark import plans
    from data_ingestion_auto_spark.session import get_session

    spark = get_session("time_queries")
    names = sorted(plans.REGISTRY) if "--all" in args else args
    # JVM/codegen warmup
    plans.REGISTRY["q1_pricing_summary"].spark(spark, sf_dir).collect()
    for name in names:
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"{name}#r{rep}")
            t0 = time.perf_counter()
            df = plans.REGISTRY[name].spark(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            print(
                f"{name} rep{rep}: construct={t1 - t0:.3f}s exec={t2 - t1:.3f}s "
                f"total={t2 - t0:.3f}s",
                flush=True,
            )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
