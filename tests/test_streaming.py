"""Structured Streaming recompositions (SURVEY §2.9): incremental file
source, availableNow catch-up, tumbling windows, session windows,
checkpoint-resume (W1/W4/W6/W10)."""

from __future__ import annotations

import datetime as dt

from data_ingestion_auto_spark.streaming import (
    file_stream,
    sessionized_stream,
    start_foreach_batch_upsert,
    start_windowed_aggregate,
    windowed_counts,
)


def _write_events(spark, path, day, n=20, start_hour=0):
    base = dt.datetime(2024, 1, day)
    rows = [
        (
            i,
            base + dt.timedelta(hours=start_hour, minutes=7 * i),
            i % 3,
            "click" if i % 2 else "view",
            float(i),
            "{}",
        )
        for i in range(n)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("append").parquet(path)


def test_available_now_catchup_and_incremental_resume(spark, tmp_path):
    """W4: availableNow drains pending files and stops; a later run with
    the same checkpoint processes ONLY new files (checkpointed offsets =
    the reference's state watermark, W3). Parquet sink — the memory sink
    doesn't support checkpoint recovery."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    _write_events(spark, src, day=1)

    def run():
        q = (
            file_stream(spark, src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(sink).count() == 20

    # new file arrives; resume from the same checkpoint → only the new
    # file is processed (no re-ingestion of day 1)
    _write_events(spark, src, day=2)
    run()
    out = spark.read.parquet(sink)
    assert out.count() == 40
    assert out.filter("day(ts) = 1").count() == 20
    assert out.filter("day(ts) = 2").count() == 20


def test_windowed_counts_shape(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_events(spark, src, day=1)
    q = start_windowed_aggregate(
        windowed_counts(file_stream(spark, src), window="1 hour", watermark="0 seconds"),
        "aggshape",
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM aggshape").collect()
    assert {c for c in rows[0].asDict()} == {"window_start", "window_end", "event_type", "n", "total_value"}
    # 20 events, 7-min spacing → spans 3 hours; at least 2 closed windows emitted
    assert len(rows) >= 2


def test_session_window_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_events(spark, src, day=1, n=10)  # 7-min gaps < 30-min session gap
    # complete mode: append withholds sessions until a later batch's
    # watermark passes their end (never happens with one availableNow
    # batch), and session windows reject update mode.
    q = start_windowed_aggregate(
        sessionized_stream(file_stream(spark, src), gap="30 minutes", watermark="0 seconds"),
        "sess",
        str(tmp_path / "ckpt"),
        output_mode="complete",
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess").collect()
    assert rows
    # 10 events over 3 users, all within one session per user
    assert sum(r.n_events for r in rows) == 10
    assert len(rows) == 3


def test_foreach_batch_upsert_idempotent_with_state(spark, tmp_path):
    """W9 streaming: foreachBatch + dynamic partition overwrite + state
    commit — rerunning the stream over the same input (fresh checkpoint,
    same sink) does not duplicate rows, and the watermark lands in the
    state store."""
    from pyspark.sql import functions as F

    from data_ingestion_auto_spark.state import StateStore

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    _write_events(spark, src, day=1)
    state = StateStore(str(tmp_path / "state.json"))

    def run(ckpt):
        stream = file_stream(spark, src).withColumn(
            "day_key", F.date_format("ts", "yyyy-MM-dd")
        )
        q = start_foreach_batch_upsert(
            stream, sink, "day_key", str(tmp_path / ckpt), state_store=state, dataset_id="ev"
        )
        q.awaitTermination(120)

    run("ckpt1")
    n1 = spark.read.parquet(sink).count()
    assert n1 == 20
    assert state.get("ev", "last_update") == "2024-01-01"
    # replay from scratch (fresh checkpoint): same partitions overwritten,
    # not appended — exactly-once EFFECT
    run("ckpt2")
    assert spark.read.parquet(sink).count() == n1


def test_foreach_batch_upsert_integer_watermark_advances(spark, tmp_path):
    """Watermark monotonicity compares in the partition column's native
    domain (review r12): with an INTEGER day key, prev=9 then batch max=10
    must advance to '10' — lexicographic '9' > '10' would pin it forever."""
    from pyspark.sql import functions as F

    from data_ingestion_auto_spark.state import StateStore

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    _write_events(spark, src, day=1)
    state = StateStore(str(tmp_path / "state.json"))
    state.commit("ev", {"last_update": "9"})  # prior integer high-water mark

    stream = file_stream(spark, src).withColumn("day_num", F.lit(10))
    q = start_foreach_batch_upsert(
        stream, sink, "day_num", str(tmp_path / "ckpt"), state_store=state, dataset_id="ev"
    )
    q.awaitTermination(120)
    assert state.get("ev", "last_update") == "10"


def test_foreach_batch_upsert_all_null_keys_commit_no_watermark(spark, tmp_path):
    """An all-NULL partition-key first batch must not commit the literal
    string 'None' as the watermark (review r12: a later real batch would
    fail to parse it); the epoch still commits, last_update stays absent."""
    from pyspark.sql import functions as F

    from data_ingestion_auto_spark.state import StateStore

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    _write_events(spark, src, day=1)
    state = StateStore(str(tmp_path / "state.json"))

    stream = file_stream(spark, src).withColumn(
        "day_key", F.lit(None).cast("string")
    )
    q = start_foreach_batch_upsert(
        stream, sink, "day_key", str(tmp_path / "ckpt"), state_store=state, dataset_id="ev"
    )
    q.awaitTermination(120)
    assert state.get("ev", "last_update") is None
    assert state.get("ev", "epoch") is not None


def test_foreach_batch_upsert_legacy_corrupt_watermark_recovers(spark, tmp_path):
    """ADVICE r12: legacy state written by the pre-r12 code (the literal
    string 'None') must not crash int() on every batch and permanently
    fail the stream — the unusable stored mark is treated as absent and
    the watermark re-derives from the current batch."""
    from pyspark.sql import functions as F

    from data_ingestion_auto_spark.state import StateStore

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    _write_events(spark, src, day=1)
    state = StateStore(str(tmp_path / "state.json"))
    state.commit("ev", {"last_update": "None"})  # legacy corrupt state

    stream = file_stream(spark, src).withColumn("day_num", F.lit(10))
    q = start_foreach_batch_upsert(
        stream, sink, "day_num", str(tmp_path / "ckpt"), state_store=state, dataset_id="ev"
    )
    q.awaitTermination(120)
    assert state.get("ev", "last_update") == "10"
    assert spark.read.parquet(sink).count() == 20


def test_stream_static_anomaly_join(spark, tmp_path):
    """W7 stream-static join: micro-batches score against the
    materialized normals table; a normals refresh between runs is picked
    up by the next batch."""
    from pyspark.sql import functions as F

    from data_ingestion_auto_spark.streaming import stream_static_anomaly

    src, sink = str(tmp_path / "src"), str(tmp_path / "sink")
    _write_events(spark, src, day=1, n=6)  # users 0,1,2; values 0..5
    normals_path = str(tmp_path / "normals")
    spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0)], "user_id long, normal_value double"
    ).write.mode("overwrite").parquet(normals_path)

    def run(ckpt):
        normals = spark.read.parquet(normals_path)
        q = (
            stream_static_anomaly(file_stream(spark, src), normals)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r.event_id): r for r in spark.read.parquet(sink).collect()}

    out = run("c1")
    assert len(out) == 6
    # event 3 → user 0 (3 % 3), value 3.0, normal 1.0 → anomaly 2.0
    assert out[3].normal_value == 1.0 and out[3].anomaly == 2.0
    # refresh normals, new batch uses the new static side
    spark.createDataFrame(
        [(0, 10.0), (1, 20.0), (2, 30.0)], "user_id long, normal_value double"
    ).write.mode("overwrite").parquet(normals_path)
    _write_events(spark, src, day=2, n=3)
    out2 = run("c1")
    day2 = [r for r in out2.values() if r.ts.day == 2]
    assert day2 and all(r.normal_value in (10.0, 20.0, 30.0) for r in day2)


def test_stream_stream_interval_join(spark, tmp_path):
    """§2.9 stream-stream: purchases join clicks of the same user within
    1 h; the batch-mode equivalent of the same join proves the match set."""
    import datetime as dt

    from data_ingestion_auto_spark.streaming.incremental import (
        file_stream,
        stream_stream_interval_join,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def _rows(kind, spec):
        return [
            (eid, base + dt.timedelta(minutes=m), uid, kind, 1.0, "{}")
            for eid, uid, m in spec
        ]

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    clicks = _rows("click", [(1, 7, 0), (2, 7, 30), (3, 9, 0)])
    buys = _rows("buy", [(101, 7, 45), (102, 9, 90), (103, 8, 10)])
    src_l, src_r = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(clicks, schema).coalesce(1).write.parquet(src_l)
    spark.createDataFrame(buys, schema).coalesce(1).write.parquet(src_r)

    joined = stream_stream_interval_join(
        file_stream(spark, src_l), file_stream(spark, src_r)
    )
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.left_id, r.right_id, r.lag_seconds) for r in spark.read.parquet(sink).collect()}
    # user 7: buy@45min matches click@0 (45') and click@30 (15'); user 9's
    # buy@90min is outside 1h of click@0; user 8 has no click.
    assert got == {(1, 101, 2700), (2, 101, 900)}
