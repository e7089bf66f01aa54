"""Regression pins for the round-11 deep-review fixes: zero-norm /
non-finite vectors must never rank as nearest neighbors (NaN would sort
above every real cosine), quantize must survive NaN/Inf components under
Spark 4's default ANSI mode, StateStore must not lose concurrent
commits, and the CDC probe must stay type-generic over doc_id."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from data_ingestion_auto_spark.operators import cdc_index as CI
from data_ingestion_auto_spark.operators import ivf as V
from data_ingestion_auto_spark.state import StateStore


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_zero_norm_vector_never_ranks_first(spark):
    """A stored all-zero vector has no defined cosine: it must rank LAST
    (NULL cosine), not first (the NaN-sorts-high trap)."""
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0, 0.0, 0.0]),   # query
            (1, [0.9, 0.1, 0.0, 0.0]),   # true near neighbor
            (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal
            (3, [0.0, 0.0, 0.0, 0.0]),   # degenerate zero vector
            (4, [0.5, 0.5, 0.0, 0.0]),
            (5, [-1.0, 0.0, 0.0, 0.0]),
        ],
    )
    out = V.ivf_topk(emb, n_queries=1, k=2, iters=1, nprobe=2, topk=5).collect()
    ranks = {r.cand_id: (r.rank, r.cosine) for r in out if r.query_id == 0}
    assert ranks[1][0] == 1  # the true neighbor wins
    if 3 in ranks:  # the zero vector, when probed, sits at the bottom
        assert ranks[3][0] == max(r for r, _ in ranks.values())
        assert ranks[3][1] is None


def test_non_finite_components_quantize_to_null_not_crash(spark):
    """Spark 4 runs ANSI by default: CAST(NaN AS BIGINT) would throw.
    try_cast nulls the component instead; the poisoned vector ranks last
    rather than killing the job."""
    emb = _emb(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [0.8, 0.1]),
            (2, [float("nan"), 1.0]),
            (3, [float("inf"), 0.0]),
        ],
    )
    q = V.quantize(emb).collect()
    by_id = {r.vec_id: list(r.qvec) for r in q}
    assert by_id[0] == [10000, 0]
    assert by_id[2][0] is None and by_id[2][1] == 10000
    assert by_id[3][0] is None
    # and the full probe pipeline still runs (no ANSI crash), with the
    # poisoned vectors never outranking the real neighbor
    out = V.ivf_topk(emb, n_queries=1, k=2, iters=1, nprobe=2, topk=3).collect()
    mine = sorted((r.rank, r.cand_id) for r in out if r.query_id == 0)
    assert mine[0][1] == 1


def test_state_store_concurrent_commits_lose_nothing(tmp_path):
    """20 threads × 20 commits to distinct keys: every key survives —
    the unlocked read-modify-write would drop most of them."""
    store = StateStore(str(tmp_path / "state.json"))

    def worker(t):
        for i in range(20):
            store.commit(f"ds{t}", {f"k{i}": f"v{t}-{i}"})

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(20)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    for t in range(20):
        got = store.get_all(f"ds{t}")
        assert len(got) == 20, f"ds{t} lost {20 - len(got)} commits"


def test_cdc_probe_is_type_generic_over_string_ids(spark, tmp_path):
    """dup_of must preserve the corpus's id type (no bigint force-cast):
    a string-keyed corpus probes cleanly and owners resolve."""
    long_text = " ".join(f"w{i}" for i in range(60))
    corpus = spark.createDataFrame(
        [("doc-a", long_text)], "doc_id string, text string"
    )
    spark.sql("DROP TABLE IF EXISTS t_cdc_strid")
    CI.write_chunk_index(corpus, "t_cdc_strid", buckets=4, path=str(tmp_path / "ci"))
    batch = spark.createDataFrame(
        [("doc-b", "lead in words " + long_text), ("doc-c", "nothing shared here")],
        "doc_id string, text string",
    )
    rows = {r.doc_id: r for r in CI.probe_chunk_index(spark, batch, "t_cdc_strid").collect()}
    assert rows["doc-b"].is_dup and rows["doc-b"].dup_of == "doc-a"
    assert rows["doc-c"].dup_of == "doc-c"
