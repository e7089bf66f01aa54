"""Cold-start contract of the four foreachBatch ingest loops (review
r11): launched against a NOT-yet-existing index, the dedup/CDC/search
loops bootstrap an empty index on epoch 0 (first probe sees no
partners, first append populates it), while the IVF loop raises a
descriptive error (the quantizer is a trained model — Faiss's
train-before-add contract). Also pins the monotone-watermark fix in
start_foreach_batch_upsert."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from data_ingestion_auto_spark.state import StateStore
from data_ingestion_auto_spark.streaming.incremental import (
    start_cdc_ingest_stream,
    start_dedup_ingest_stream,
    start_foreach_batch_upsert,
    start_search_ingest_stream,
)


def _drop_with_location(spark, *tables):
    """DROP + remove the warehouse dir: the local in-memory catalog forgets
    managed tables across JVMs while their warehouse directories persist,
    so a bare DROP IF EXISTS no-ops and the bootstrap's saveAsTable dies
    with LOCATION_ALREADY_EXISTS on re-runs."""
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)


_LONG = " ".join(f"tok{i}" for i in range(60))


def _src(spark, tmp, tag, batches, schema="doc_id long, text string"):
    src = tmp / f"src_{tag}"
    src.mkdir()
    for i, batch in enumerate(batches):
        f = src / f"b{i}"
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(f))
        t = time.time() - 100 + i * 50
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (t, t))
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )


def test_dedup_loop_cold_starts_from_no_index(spark, tmp_path):
    b1 = [(1, "alpha beta gamma delta " + _LONG)]
    b2 = [(2, "alpha beta gamma delta " + _LONG), (3, "totally different words here")]
    stream = _src(spark, tmp_path, "cold_dedup", [b1, b2])
    _drop_with_location(spark, "t_cold_band")
    q = start_dedup_ingest_stream(
        spark,
        stream,
        "t_cold_band",
        assign_path=str(tmp_path / "a"),
        checkpoint=str(tmp_path / "c"),
        buckets=4,
    )
    q.awaitTermination(300)
    rows = {r.doc_id: r for r in spark.read.parquet(str(tmp_path / "a")).collect()}
    assert not rows[1].is_dup  # epoch 0 against the bootstrapped empty index
    assert rows[2].is_dup and rows[2].dup_of == 1  # cross-epoch partner found
    assert not rows[3].is_dup
    assert spark.table("t_cold_band").count() > 0  # index populated


def test_cdc_loop_cold_starts_from_no_index(spark, tmp_path):
    b1 = [(10, "prefix words " + _LONG)]
    b2 = [(20, "other lead-in quoting " + _LONG), (30, "novel standalone text")]
    stream = _src(spark, tmp_path, "cold_cdc", [b1, b2])
    _drop_with_location(spark, "t_cold_cdc")
    q = start_cdc_ingest_stream(
        spark,
        stream,
        "t_cold_cdc",
        assign_path=str(tmp_path / "ca"),
        checkpoint=str(tmp_path / "cc"),
        buckets=4,
    )
    q.awaitTermination(300)
    rows = {r.doc_id: r for r in spark.read.parquet(str(tmp_path / "ca")).collect()}
    assert rows[10].n_shared == 0
    assert rows[20].is_dup and rows[20].dup_of == 10  # quoted passage caught
    assert not rows[30].is_dup


def test_search_loop_cold_starts_from_no_index(spark, tmp_path):
    b1 = [(1, "spark shuffle join"), (2, "window order sort")]
    b2 = [(3, "spark spark spark shuffle")]
    stream = _src(spark, tmp_path, "cold_search", [b1, b2])
    _drop_with_location(spark, "t_cold_post", "t_cold_post_docs")
    q = start_search_ingest_stream(
        spark,
        stream,
        "t_cold_post",
        standing_terms=("spark", "shuffle"),
        hits_path=str(tmp_path / "hits"),
        checkpoint=str(tmp_path / "sc"),
        buckets=4,
        k=5,
    )
    q.awaitTermination(300)
    hits = spark.read.parquet(str(tmp_path / "hits"))
    last = hits.agg(F.max("epoch_id")).collect()[0][0]
    final = {r.doc_id for r in hits.filter(F.col("epoch_id") == last).collect()}
    assert final == {1, 3}  # both spark/shuffle docs, across epochs


def test_ann_loop_refuses_cold_start_with_clear_error(spark, tmp_path):
    from data_ingestion_auto_spark.streaming.incremental import (
        start_ann_ingest_stream,
    )

    stream = _src(
        spark,
        tmp_path,
        "cold_ann",
        [[(1, [0.1, 0.2, 0.3, 0.4])]],
        schema="vec_id long, embedding array<double>",
    )
    _drop_with_location(spark, "t_cold_ivf")
    q = start_ann_ingest_stream(
        spark,
        stream,
        "t_cold_ivf",
        assign_path=str(tmp_path / "aa"),
        checkpoint=str(tmp_path / "ac"),
    )
    with pytest.raises(Exception, match="train it first"):
        q.awaitTermination(300)
        raise RuntimeError("stream should have failed")  # pragma: no cover


def test_upsert_watermark_is_monotone_under_late_batches(spark, tmp_path):
    """A late batch (max partition value BELOW the stored watermark)
    rewrites its partitions but never regresses last_update (W3)."""
    src = tmp_path / "wm_src"
    src.mkdir()
    batches = [
        [(1, "2026-05-02", 1.0)],  # newest first
        [(2, "2026-05-01", 2.0)],  # late arrival
    ]
    for i, b in enumerate(batches):
        f = src / f"b{i}"
        spark.createDataFrame(b, "id long, day string, v double").coalesce(
            1
        ).write.mode("overwrite").parquet(str(f))
        t = time.time() - 100 + i * 50
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (t, t))
    stream = (
        spark.readStream.schema("id long, day string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    state = StateStore(str(tmp_path / "wm_state.json"))
    q = start_foreach_batch_upsert(
        stream,
        out_path=str(tmp_path / "wm_out"),
        partition_col="day",
        checkpoint=str(tmp_path / "wm_ckpt"),
        state_store=state,
        dataset_id="wm",
    )
    q.awaitTermination(300)
    assert state.get("wm") == "2026-05-02"  # late 05-01 batch didn't regress it
    assert spark.read.parquet(str(tmp_path / "wm_out")).count() == 2
