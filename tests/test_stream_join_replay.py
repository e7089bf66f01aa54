"""Equivalence proof for ``stream_stream_join_replay`` (round-5 verdict
"Next round" #2): the closed-form batch replay the driver hash-verifies
must compute exactly what the REAL watermarked stream-stream interval
join (``streaming/incremental.py::stream_stream_interval_join``) emits —
the same pair set AND the same per-micro-batch emission timing.

Method (the ``stateful_dedup_replay`` recipe): densify sf0.001's events
by compressing 30 days into ~6 hours, derive md5-deterministic arrival
hours for every click/purchase, then drive the real streaming join one
availableNow cycle per arrival hour (one new file per side per cycle,
checkpointed state across restarts) and compare each cycle's newly-sunk
rows against the replay rows whose ``emit_batch`` is that hour.
"""

from __future__ import annotations

import datetime as dt
import hashlib
from collections import defaultdict

HOUR_US = 3_600_000_000


def _delay(salt: str, eid: int) -> int:
    return int(hashlib.md5(f"{salt}{eid}".encode()).hexdigest()[:3], 16) % 3600


def _fmt(batch_hour_us: int) -> str:
    t = dt.datetime.fromtimestamp(batch_hour_us // 1_000_000, dt.timezone.utc)
    return t.strftime("%Y-%m-%d %H:%M:%S")


def test_real_stream_stream_join_agrees_on_fixture(spark, sf_dir, tmp_path):
    from data_ingestion_auto_spark import plans
    from data_ingestion_auto_spark.sources.tables import load_table
    from data_ingestion_auto_spark.streaming.incremental import (
        file_stream,
        stream_stream_interval_join,
    )

    # --- densified fixture: 30 days -> ~6 h, same users/types/ids ---
    src_rows = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .collect()
    )
    min_ts = min(r.ts for r in src_rows)
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (r.event_id, t0 + (r.ts - min_ts) / 120, r.user_id, r.event_type, r.value, r.props)
        for r in src_rows
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    fixture_dir = str(tmp_path / "sfdir")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        f"{fixture_dir}/events.parquet"
    )

    expected = defaultdict(set)
    for r in (
        plans.REGISTRY["stream_stream_join_replay"].spark(spark, fixture_dir).collect()
    ):
        expected[r.emit_batch].add((r.user_id, r.left_id, r.right_id, r.lag_seconds))
    n_expected = sum(len(v) for v in expected.values())
    assert n_expected >= 50, "densified fixture too sparse to exercise the join"

    # --- python mirror of the arrival model: which hour each side arrives ---
    def arrival_hour_us(ts: dt.datetime, salt: str, eid: int) -> int:
        us = int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        return ((us + _delay(salt, eid) * 1_000_000) // HOUR_US) * HOUR_US

    left_by_hour, right_by_hour = defaultdict(list), defaultdict(list)
    arr_of = {}
    for row in rows:
        eid, ts, _, etype = row[0], row[1], row[2], row[3]
        if etype == "click":
            h = arrival_hour_us(ts, "jl:", eid)
            left_by_hour[h].append(row)
            arr_of[("l", eid)] = h
        elif etype == "purchase":
            h = arrival_hour_us(ts, "jr:", eid)
            right_by_hour[h].append(row)
            arr_of[("r", eid)] = h

    # the fixture must exercise all three buffering classes: left waits for
    # right, right waits for left (out-of-order arrival), same-batch match
    classes = set()
    for pairs in expected.values():
        for _, lid, rid, _ in pairs:
            lh, rh = arr_of[("l", lid)], arr_of[("r", rid)]
            classes.add("same" if lh == rh else ("left_first" if lh < rh else "right_first"))
    assert classes == {"same", "left_first", "right_first"}, classes

    # replay's emit_batch must be the later arrival hour (model self-check)
    for batch, pairs in expected.items():
        for _, lid, rid, _ in pairs:
            assert _fmt(max(arr_of[("l", lid)], arr_of[("r", rid)])) == batch

    # --- drive the real operator: one availableNow cycle per arrival hour ---
    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    empty = spark.createDataFrame([], schema).coalesce(1)
    empty.write.parquet(src_l)
    empty.write.parquet(src_r)

    hours = sorted(set(left_by_hour) | set(right_by_hour))
    seen = set()
    for h in hours:
        if left_by_hour.get(h):
            spark.createDataFrame(left_by_hour[h], schema).coalesce(1).write.mode(
                "append"
            ).parquet(src_l)
        if right_by_hour.get(h):
            spark.createDataFrame(right_by_hour[h], schema).coalesce(1).write.mode(
                "append"
            ).parquet(src_r)
        q = (
            stream_stream_interval_join(
                file_stream(spark, src_l), file_stream(spark, src_r)
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        all_rows = {
            (r.user_id, r.left_id, r.right_id, r.lag_seconds)
            for r in spark.read.parquet(sink).collect()
        }
        emitted_now = all_rows - seen
        assert emitted_now == expected.get(_fmt(h), set()), f"batch {_fmt(h)}"
        seen = all_rows

    assert seen == set().union(*expected.values())
    assert len(seen) == n_expected


def test_stream_stream_join_state_bounded(spark, tmp_path):
    """The watermark must actually EVICT join state: 24 hourly
    micro-batches of one click + one purchase per hour (same user) are
    processed with maxFilesPerTrigger=1, so the event-time watermark
    advances batch by batch; with watermark 2 h and join span 1 h the
    state store should hold only the last few hours of rows — never the
    whole stream. Asserts the final batch's total state rows are a small
    constant while 24 rows were ingested (the docstring's
    state ∝ keys × window claim, machine-checked)."""
    import datetime as dt

    from data_ingestion_auto_spark.streaming.incremental import (
        EVENTS_SCHEMA,
        stream_stream_interval_join,
    )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    t0 = dt.datetime(2024, 5, 1)
    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    n_hours = 12
    for h in range(n_hours):
        ts = t0 + dt.timedelta(hours=h)
        spark.createDataFrame(
            [(1000 + h, ts, 1, "click", 1.0, "{}")], schema
        ).coalesce(1).write.mode("append").parquet(src_l)
        spark.createDataFrame(
            [(2000 + h, ts + dt.timedelta(minutes=30), 1, "buy", 1.0, "{}")], schema
        ).coalesce(1).write.mode("append").parquet(src_r)

    def one_file_stream(path):
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(path)
        )

    q = (
        stream_stream_interval_join(one_file_stream(src_l), one_file_stream(src_r))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # every same-hour click->buy pair must have been emitted
    out = spark.read.parquet(str(tmp_path / "sink")).collect()
    assert len(out) == n_hours and all(r.lag_seconds == 1800 for r in out)

    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in (q.recentProgress or [])
        if p.get("stateOperators")
    ]
    assert state_rows, "no state metrics captured"
    # 24 rows ingested; steady-state buffer = rows younger than the 2 h
    # watermark on each side (+ the current batch) — a small constant.
    assert state_rows[-1] <= 16, state_rows
    assert max(state_rows) <= 20, state_rows
