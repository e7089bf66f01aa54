"""Streaming closure of the stored CDC chunk-index lifecycle
(streaming/incremental.py::start_cdc_ingest_stream) — checked against a
sequential batch-mode control and replayed to pin the at-least-once
refinement contract, mirroring the band/IVF stream suites."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from data_ingestion_auto_spark.operators import cdc_index as C
from data_ingestion_auto_spark.streaming.incremental import start_cdc_ingest_stream

_P = " ".join(f"p{i}" for i in range(60))  # 8 chunks, verified
_Q = " ".join(f"qx{i}" for i in range(40))  # 7 chunks, verified


@pytest.fixture(scope="module")
def corpus_batches(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "intro words here " + _P),
            (3, "totally different content stream of tokens one two three"),
        ],
        "doc_id long, text string",
    )
    b1 = [(100, "a longer different prefix quoting " + _P), (101, _Q)]
    b2 = [(200, "leading filler tokens " + _Q), (201, "wholly novel standalone sentence")]
    return corpus, b1, b2


def _run_stream(spark, tmp, corpus, b1, b2, tag):
    idx = f"t_cstream_idx_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {idx}")
    C.write_chunk_index(corpus, idx, buckets=4, path=str(tmp / f"cidx_{tag}"))
    src = tmp / f"csrc_{tag}"
    src.mkdir(exist_ok=True)
    for i, batch in enumerate((b1, b2)):
        f = src / f"b{i}"
        spark.createDataFrame(batch, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(f))
        t = time.time() - 100 + i * 50
        for root, _, files in os.walk(f):
            for name in files:
                os.utime(os.path.join(root, name), (t, t))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = start_cdc_ingest_stream(
        spark,
        stream,
        idx,
        assign_path=str(tmp / f"cassign_{tag}"),
        checkpoint=str(tmp / f"cckpt_{tag}"),
        buckets=4,
    )
    q.awaitTermination(300)
    return idx, str(tmp / f"cassign_{tag}")


def test_stream_matches_sequential_batch_control(spark, corpus_batches, tmp_path):
    corpus, b1, b2 = corpus_batches
    idx, assign_path = _run_stream(spark, tmp_path, corpus, b1, b2, "a")
    got = {
        r.doc_id: (r.n_chunks, r.n_shared, r.shared_tokens, r.dup_of, r.is_dup)
        for r in spark.read.parquet(assign_path).collect()
    }

    ctrl = f"t_cctrl_idx_a"
    spark.sql(f"DROP TABLE IF EXISTS {ctrl}")
    C.write_chunk_index(corpus, ctrl, buckets=4, path=str(tmp_path / "ccidx"))
    want = {}
    for batch in (b1, b2):
        bdf = spark.createDataFrame(batch, "doc_id long, text string").localCheckpoint()
        for r in C.probe_chunk_index(spark, bdf, ctrl).collect():
            want[r.doc_id] = (r.n_chunks, r.n_shared, r.shared_tokens, r.dup_of, r.is_dup)
        C.write_chunk_index(bdf, ctrl, buckets=4, mode="append")
    assert got == want
    # cross-epoch: batch-2's quoting doc hits batch-1's fresh doc
    assert got[200][4] and got[200][3] == 101
    # quoting doc hit the original corpus owner
    assert got[100][4] and got[100][3] == 2
    # streamed index equals the control index row-for-row
    s_rows = sorted((r.doc_id, r.chash) for r in spark.table(idx).collect())
    c_rows = sorted((r.doc_id, r.chash) for r in spark.table(ctrl).collect())
    assert s_rows == c_rows


def test_replay_keeps_index_and_refines(spark, corpus_batches, tmp_path):
    corpus, b1, b2 = corpus_batches
    idx, assign_path = _run_stream(spark, tmp_path, corpus, b1, b2, "r")
    before = sorted((r.doc_id, r.chash) for r in spark.table(idx).collect())
    first = {
        r.doc_id: (r.n_shared, r.shared_tokens, r.dup_of, r.is_dup)
        for r in spark.read.parquet(assign_path).collect()
    }

    src = tmp_path / "csrc_r"
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = start_cdc_ingest_stream(
        spark,
        stream,
        idx,
        assign_path=assign_path,
        checkpoint=str(tmp_path / "cckpt_r2"),
        buckets=4,
    )
    q.awaitTermination(300)

    after = sorted((r.doc_id, r.chash) for r in spark.table(idx).collect())
    assert after == before  # idempotent append: index byte-identical

    # refinement: n_shared/shared_tokens only grow; is_dup never
    # true->false; among is_dup rows dup_of only decreases
    latest: dict[int, tuple] = {}
    for r in spark.read.parquet(assign_path).orderBy("epoch_id").collect():
        latest[r.doc_id] = (r.n_shared, r.shared_tokens, r.dup_of, r.is_dup)
    for doc, (ns0, st0, d0, dup0) in first.items():
        ns1, st1, d1, dup1 = latest[doc]
        assert ns1 >= ns0 and st1 >= st0
        if dup0:
            assert dup1 and d1 <= d0
