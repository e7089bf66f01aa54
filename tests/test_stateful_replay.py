"""Equivalence proof for ``stateful_dedup_replay`` (round-4 verdict #5):
the closed-form relational rule the driver hash-verifies must compute
exactly what ``streaming/stateful.py::dedup_stream`` computes.

Two directions:

(a) the EXACT operator body (floor/seen update loop, retention eviction)
    simulated in plain Python over the full sf fixture arrival stream
    matches the registered Spark query batch-for-batch — this is the
    proof of the module-docstring claim that the eviction floor admits
    the |{prior larger keys}| <= R closed form;
(b) the REAL applyInPandasWithState operator, driven micro-batch by
    micro-batch through a file stream on an engineered fixture hitting
    every verdict class (cross-batch dup, within-batch dup, below-floor
    fresh key), matches the registered query on the same fixture.
"""

from __future__ import annotations

import datetime as dt
import hashlib
from collections import defaultdict

from data_ingestion_auto_spark.plans.stateful_replay import _RETENTION

HOUR_US = 3_600_000_000


def _d1(eid: int) -> int:
    return int(hashlib.md5(str(eid).encode()).hexdigest()[:3], 16) % 3600


def _d2(eid: int) -> int:
    return 3600 + int(hashlib.md5(f"r:{eid}".encode()).hexdigest()[:5], 16) % 172800


def _key(eid: int) -> int:
    return int(hashlib.md5(f"k:{eid}".encode()).hexdigest()[:8], 16)


def _arrivals(rows):
    """(user, event, ts_us) rows -> (user, key, batch_hour_index) arrival
    occurrences — the python mirror of the query's arrival model."""
    out = []
    for u, e, us in rows:
        out.append((u, _key(e), (us + _d1(e) * 1_000_000) // HOUR_US))
        out.append((u, _key(e), (us + _d2(e) * 1_000_000) // HOUR_US))
    return out


def _simulate_operator(arrivals, retention=_RETENTION):
    """Run dedup_stream's exact per-key state update over hourly batches:
    verdict = key > floor and key not in seen; seen.add when key > floor;
    at batch end cap seen to the retention largest, advancing the floor.
    Returns {batch_hour: (n_arrivals, n_first_seen)}."""
    by_batch = defaultdict(list)
    for u, k, b in arrivals:
        by_batch[b].append((u, k))
    state: dict[int, tuple[int, set]] = {}
    out = {}
    for b in sorted(by_batch):
        n_true = 0
        for u, k in by_batch[b]:
            floor, seen = state.setdefault(u, (-1, set()))
            if k > floor and k not in seen:
                n_true += 1
            if k > floor:
                seen.add(k)
        for u in {u for u, _ in by_batch[b]}:
            floor, seen = state[u]
            if len(seen) > retention:
                ordered = sorted(seen)
                floor = max(floor, ordered[-retention - 1])
                seen = set(ordered[-retention:])
            state[u] = (floor, seen)
        out[b] = (len(by_batch[b]), n_true)
    return out


def _fmt(batch_hour: int) -> str:
    t = dt.datetime.fromtimestamp(batch_hour * 3600, dt.timezone.utc)
    return t.strftime("%Y-%m-%d %H:%M:%S")


def _query_rows(spark, sf_dir):
    from data_ingestion_auto_spark import plans

    return {
        r["batch_start"]: (int(r["n_arrivals"]), int(r["n_first_seen"]), int(r["n_dup"]))
        for r in plans.REGISTRY["stateful_dedup_replay"].spark(spark, sf_dir).collect()
    }


def test_closed_form_matches_operator_simulation(spark, sf_dir, duck):
    """(a): python replica of dedup_stream's state loop over the FULL
    fixture arrival stream == the registered closed-form query."""
    rows = duck.execute("SELECT user_id, event_id, epoch_us(ts) FROM events").fetchall()
    sim = _simulate_operator(_arrivals(rows))
    got = _query_rows(spark, sf_dir)
    assert len(got) == len(sim)
    for b, (n, n_true) in sim.items():
        assert got[_fmt(b)] == (n, n_true, n - n_true), f"batch {_fmt(b)}"
    # the fixture genuinely exercises the bounded-state tier: some first
    # arrivals must be suppressed by the eviction floor
    n_events = len(rows)
    total_first = sum(v[0] for v in sim.values()), sum(v[1] for v in sim.values())
    assert total_first[1] < n_events, "eviction floor never bound — fixture too easy"


def _pick_fixture_ids():
    """Deterministically search event ids so the engineered fixture hits
    every verdict class (no randomness: pure md5 scans)."""
    # 12 base ids, skipping any whose scrambled keys collide
    base, seen_keys = [], set()
    eid = 1
    while len(base) < 12:
        if _key(eid) not in seen_keys:
            base.append(eid)
            seen_keys.add(_key(eid))
        eid += 1
    # below-floor id: scrambled key smaller than at least 9 base keys
    floor_candidate = next(
        e
        for e in range(1000, 5000)
        if _key(e) not in seen_keys
        and sum(1 for b in base if _key(b) > _key(e)) >= _RETENTION + 1
    )
    # within-batch-dup id: both arrivals land in one hour when ts is offset
    # by (3600 - d1) seconds => needs d2 - d1 < 3600
    wb_candidate = next(
        e
        for e in range(5000, 20000)
        if _key(e) not in seen_keys
        and _key(e) != _key(floor_candidate)
        and _d2(e) - _d1(e) < 3600
    )
    return base, floor_candidate, wb_candidate


def test_real_streaming_operator_agrees_on_fixture(spark, tmp_path):
    """(b): the actual applyInPandasWithState operator, one micro-batch
    per arrival hour, produces the same per-batch accounting as the
    registered batch query on the same engineered events fixture."""
    from data_ingestion_auto_spark.streaming.incremental import file_stream
    from data_ingestion_auto_spark.streaming.stateful import dedup_stream

    base, floor_id, wb_id = _pick_fixture_ids()
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [(e, t0, 1, "click", 1.0, "{}") for e in base]
    # late fresh key: first-arrives after every base key => below floor
    rows.append((floor_id, t0 + dt.timedelta(days=3), 1, "click", 1.0, "{}"))
    # offset ts so both of wb_id's arrivals land in the same hour
    rows.append(
        (wb_id, t0 + dt.timedelta(days=6, seconds=3600 - _d1(wb_id)), 1, "click", 1.0, "{}")
    )
    # second user: plain cross-batch dedup only (state is per-key-group)
    rows += [(e, t0, 2, "view", 2.0, "{}") for e in range(200, 202)]

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    fixture_dir = str(tmp_path / "sfdir")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        f"{fixture_dir}/events.parquet"
    )
    expected = _query_rows(spark, fixture_dir)

    # sanity: the fixture hits all three non-trivial verdict classes
    arrivals = _arrivals(
        [(u, e, int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)) for e, ts, u, *_ in rows]
    )
    occ = defaultdict(int)
    for a in arrivals:
        occ[a] += 1
    assert any(m > 1 for m in occ.values()), "no within-batch duplicate"
    sim = _simulate_operator(arrivals)
    n_keys = len({(u, k) for u, k, _ in arrivals})
    assert sum(t for _, t in sim.values()) < n_keys, "below-floor suppression absent"

    # drive the real operator: one file (= one micro-batch) per arrival hour
    by_batch = defaultdict(list)
    for u, k, b in arrivals:
        by_batch[b].append((u, k))
    src, ckpt, sink = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "sink")
    got = {}
    prev_rows, prev_true = 0, 0
    for b in sorted(by_batch):
        batch_rows = [
            (
                k,
                dt.datetime.fromtimestamp(b * 3600, dt.timezone.utc).replace(tzinfo=None),
                u,
                "x",
                0.0,
                "{}",
            )
            for u, k in by_batch[b]
        ]
        spark.createDataFrame(batch_rows, schema).coalesce(1).write.mode("append").parquet(src)
        q = (
            dedup_stream(file_stream(spark, src), retention_ids=_RETENTION)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.read.parquet(sink).collect()
        cur_true = sum(1 for r in out if r.first_seen)
        n_new = len(out) - prev_rows
        got[_fmt(b)] = (n_new, cur_true - prev_true, n_new - (cur_true - prev_true))
        prev_rows, prev_true = len(out), cur_true

    assert got == expected


def test_running_anomaly_replay_matches_operator(spark, tmp_path):
    """stateful_running_anomaly_replay states the running-mean rule in
    exact micro-unit arithmetic; the real applyInPandasWithState operator
    accumulates a float total. Drive the operator across two micro-batches
    and check every (running_mean, anomaly) agrees within 1e-6."""
    from data_ingestion_auto_spark.streaming.incremental import file_stream
    from data_ingestion_auto_spark.streaming.stateful import running_anomaly_stream

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (e, t0 + dt.timedelta(minutes=e), u, "x", float(v), "{}")
        for u, e, v in [
            (1, 1, 10.0), (1, 2, 20.25), (1, 3, 7.5), (1, 4, 100.125),
            (2, 5, 3.0), (2, 6, 4.0),
        ]
    ]
    fixture_dir = str(tmp_path / "sfdir")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        f"{fixture_dir}/events.parquet"
    )
    from data_ingestion_auto_spark import plans

    expected = {
        (r.user_id, r.event_id): (r.n_prior, r.running_mean_micro, r.anomaly_micro)
        for r in plans.REGISTRY["stateful_running_anomaly_replay"]
        .spark(spark, fixture_dir)
        .collect()
    }

    src, ckpt, sink = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "sink")
    for batch in (rows[:3] + rows[4:5], rows[3:4] + rows[5:]):  # split mid-user
        spark.createDataFrame(batch, schema).coalesce(1).write.mode("append").parquet(src)
        q = (
            running_anomaly_stream(file_stream(spark, src))
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        (r.user_id, r.event_id): (r.running_mean, r.anomaly)
        for r in spark.read.parquet(sink).collect()
    }
    assert set(got) == set(expected)
    for k, (mean_f, anom_f) in got.items():
        n_prior, mean_u, anom_u = expected[k]
        if n_prior == 0:
            assert mean_f is None and anom_f is None and mean_u is None
        else:
            assert abs(mean_f - mean_u / 1e6) <= 1e-6, k
            assert abs(anom_f - anom_u / 1e6) <= 1e-6, k
