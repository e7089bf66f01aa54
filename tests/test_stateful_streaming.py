"""applyInPandasWithState custom stateful operators: cross-batch dedup and
incremental running-mean anomaly (SURVEY §2.10 / W-ops). Parquet sink —
the memory sink cannot resume from a checkpoint."""

from __future__ import annotations

import datetime as dt

from data_ingestion_auto_spark.streaming.incremental import file_stream
from data_ingestion_auto_spark.streaming.stateful import dedup_stream, running_anomaly_stream


def _write(spark, path, ids_values, user=1):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (eid, base + dt.timedelta(minutes=eid), user, "click", float(v), "{}")
        for eid, v in ids_values
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("append").parquet(path)


def _run(spark, stream_df, sink, ckpt):
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(sink).collect()


def test_stateful_dedup_across_batches(spark, tmp_path):
    src, ckpt, sink = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "sink")
    _write(spark, src, [(1, 10), (2, 20)])
    out1 = _run(spark, dedup_stream(file_stream(spark, src)), sink, ckpt)
    assert {(r.event_id, r.first_seen) for r in out1} == {(1, True), (2, True)}

    # second batch: one replayed id, one new — state survives via checkpoint
    _write(spark, src, [(2, 20), (3, 30)])
    out2 = _run(spark, dedup_stream(file_stream(spark, src)), sink, ckpt)
    assert {(r.event_id, r.first_seen) for r in out2} == {
        (1, True),
        (2, True),
        (2, False),  # replayed id flagged by cross-batch state
        (3, True),
    }


def test_running_anomaly_incremental_state(spark, tmp_path):
    src, ckpt, sink = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "sink")
    _write(spark, src, [(1, 10.0), (2, 20.0)])
    out1 = _run(spark, running_anomaly_stream(file_stream(spark, src)), sink, ckpt)
    by_id = {r.event_id: r for r in out1}
    assert by_id[1].running_mean is None  # nothing before the first value
    assert by_id[2].running_mean == 10.0 and by_id[2].anomaly == 10.0

    # next batch: mean over state (10, 20) = 15
    _write(spark, src, [(3, 30.0)])
    out2 = _run(spark, running_anomaly_stream(file_stream(spark, src)), sink, ckpt)
    r3 = {r.event_id: r for r in out2}[3]
    assert r3.running_mean == 15.0 and r3.anomaly == 15.0


def test_stateful_dedup_bounded_retention(spark, tmp_path):
    """Advisor fix: state holds at most retention_ids of the largest seen
    ids; an id at or below the eviction floor counts as a duplicate
    (watermark semantics), a fresh id is still first_seen."""
    src, ckpt, sink = str(tmp_path / "s2"), str(tmp_path / "c2"), str(tmp_path / "k2")
    _write(spark, src, [(i, i) for i in range(10)])
    stream = dedup_stream(file_stream(spark, src), retention_ids=4)
    out1 = _run(spark, stream, sink, ckpt)
    assert all(r.first_seen for r in out1) and len(out1) == 10

    # retention=4 → floor=5 after batch 1: ids ≤ 5 are "seen" even though
    # their exact membership was evicted; 7 is retained; 100 is fresh.
    _write(spark, src, [(0, 0), (5, 5), (7, 7), (100, 100)])
    out2 = _run(spark, dedup_stream(file_stream(spark, src), retention_ids=4), sink, ckpt)
    by = {}
    for r in out2:
        by.setdefault(r.event_id, []).append(r.first_seen)
    assert by[0] == [True, False]
    assert by[5] == [True, False]
    assert by[7] == [True, False]
    assert by[100] == [True]
