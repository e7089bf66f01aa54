"""Sweep connected_components round shapes (hops/jumps per round) on the
real corpus pair graph and verify every variant returns the identical
label table. Usage: python tools/cc_probe.py [sf_dir] [h:j ...]
Default sweep: 3:3 (current), 4:2, 5:2, 6:0, 6:2, 8:0.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and ":" not in args[0] else "/root/testdata/sf0.1"
    combos = [a for a in args if ":" in a] or ["3:3", "4:2", "5:2", "6:0", "6:2", "8:0"]

    from data_ingestion_auto_spark import plans  # noqa: F401
    from data_ingestion_auto_spark.operators.dedup import connected_components
    from data_ingestion_auto_spark.plans.dedup import corpus_lsh_pairs
    from data_ingestion_auto_spark.session import get_session

    spark = get_session("cc_probe")
    spark.sql("select 1").collect()
    pairs = corpus_lsh_pairs(spark, sf_dir)  # builds sig+pairs memos once
    pairs.count()

    ref = None
    for combo in combos:
        h, j = (int(x) for x in combo.split(":"))
        for rep in range(2):
            spark.sparkContext.setJobDescription(f"cc h={h} j={j} rep{rep}")
            t0 = time.perf_counter()
            out = connected_components(pairs, hops_per_round=h, jumps_per_round=j)
            rows = sorted((r["node"], r["component"]) for r in out.collect())
            dt = time.perf_counter() - t0
            if ref is None:
                ref = rows
            ok = rows == ref
            print(f"h={h} j={j} rep{rep}: {dt:.2f}s rows={len(rows)} match={ok}", flush=True)
            if not ok:
                raise SystemExit(f"MISMATCH at h={h} j={j}")


if __name__ == "__main__":
    main()
