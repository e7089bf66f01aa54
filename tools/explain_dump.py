"""Dump .explain("formatted") for registry queries to plans/r13/.

Usage:
    python tools/explain_dump.py [--suffix before|after] [--round rNN] [name ...]

With no names, dumps EVERY registered query. Output lands in
<repo>/plans/<round>/<query>_<suffix>.txt (default round: r14). Also prints a one-line red-flag
summary per query: counts of Exchange / BatchEvalPython / ArrowEvalPython
nodes, CartesianProduct, unpartitioned-Window risk, and whether any scan
shows PushedFilters.

Plan-only: DataFrames are constructed but not executed (construction may
still trigger memo builds / eager subtrees — that is the engine's
documented construction behaviour, unchanged here).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    suffix = "before"
    rnd = "r14"
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i : i + 2]
    if "--round" in args:
        i = args.index("--round")
        rnd = args[i + 1]
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    from data_ingestion_auto_spark import plans
    from data_ingestion_auto_spark.session import get_session

    spark = get_session("explain_dump")
    names = args or sorted(plans.REGISTRY)
    flags = {}
    for name in names:
        try:
            df = plans.REGISTRY[name].spark(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record and continue
            txt = f"ERROR during construction/explain: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        n_ex = len(re.findall(r"\bExchange\b", txt))
        n_py = len(re.findall(r"BatchEvalPython", txt))
        n_ar = len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow|PythonMapInArrow", txt))
        n_cart = len(re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", txt))
        # A Window whose partition spec is empty shows "Window [..], [..]" with
        # no partition expressions; cheap heuristic: SinglePartition exchange
        # feeding a Window / Sort.
        n_single = len(re.findall(r"Exchange SinglePartition", txt))
        pushed = "PushedFilters: \[[^\]]" in txt or re.search(r"PushedFilters: \[[A-Za-z]", txt) is not None
        flags[name] = (n_ex, n_py, n_ar, n_cart, n_single, pushed)
        print(
            f"{name}: exch={n_ex} pyRow={n_py} pyArrow={n_ar} cart={n_cart} "
            f"singlePart={n_single} pushed={pushed}",
            flush=True,
        )
    # Summary of the scariest plans.
    bad = [
        (n, f)
        for n, f in flags.items()
        if f[1] > 0 or f[3] > 0 or f[4] > 0
    ]
    print(f"\n== {len(names)} plans dumped to {out_dir} (suffix={suffix}) ==")
    if bad:
        print("red-flagged (pyRow / cartesian / single-partition exchange):")
        for n, f in sorted(bad):
            print(f"  {n}: exch={f[0]} pyRow={f[1]} pyArrow={f[2]} cart={f[3]} singlePart={f[4]}")


if __name__ == "__main__":
    main()
