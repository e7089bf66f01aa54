"""LSH hot-bucket cap (VERDICT.md round-1 item #5): an adversarial
boilerplate corpus (every doc shares its shingle set) must produce bounded
bucket arrays and a bounded pair expansion; a normal corpus must be
unchanged by the cap."""

from __future__ import annotations

from data_ingestion_auto_spark.operators import dedup as D


def _sig(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return D.minhash_signature(D.shingles(df, k=3), num_perm=16)


def test_boilerplate_corpus_is_capped(spark):
    # 30 identical docs → every band bucket holds all 30 ids
    sig = _sig(spark, [(i, "the same boilerplate text everywhere") for i in range(30)])
    cap = 5
    pairs = D.lsh_candidates(sig, max_bucket=cap).collect()
    members = {r["a"] for r in pairs} | {r["b"] for r in pairs}
    # only the `cap` smallest ids survive per bucket → C(5,2)=10 pairs
    assert members == set(range(cap))
    assert len(pairs) == cap * (cap - 1) // 2

    stats = D.lsh_bucket_stats(sig, max_bucket=cap).collect()
    assert all(r["n_members"] == 30 and r["overflow"] for r in stats)


def test_normal_corpus_unchanged_by_cap(spark):
    docs = [(i, f"document number {i} talks about topic {i % 7} in detail") for i in range(40)]
    docs += [(100 + i, f"document number {i} talks about topic {i % 7} in detail!") for i in range(5)]
    sig = _sig(spark, docs)
    uncapped = {(r["a"], r["b"]) for r in D.lsh_candidates(sig, max_bucket=10**9).collect()}
    capped = {(r["a"], r["b"]) for r in D.lsh_candidates(sig, max_bucket=1000).collect()}
    assert capped == uncapped and len(capped) >= 5
    assert not any(r["overflow"] for r in D.lsh_bucket_stats(sig).collect())


def test_cap_is_deterministic_smallest_ids(spark):
    sig = _sig(spark, [(i * 11, "identical content for determinism") for i in range(8)])
    pairs = sorted(
        (r["a"], r["b"]) for r in D.lsh_candidates(sig, max_bucket=3).collect()
    )
    assert pairs == [(0, 11), (0, 22), (11, 22)]


def test_connected_components_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "a long, b long",
    )
    got = {
        r["node"]: r["component"]
        for r in D.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_vs_single_pass(spark):
    """The iterative operator must refine the one-round min-neighbour: in
    a chain 5-6, 6-7, single-pass leaves 7→6 while CC resolves 7→5."""
    pairs = spark.createDataFrame([(5, 6), (6, 7)], "a long, b long")
    cc = {r["node"]: r["component"] for r in D.connected_components(pairs).collect()}
    assert cc == {5: 5, 6: 5, 7: 5}


def test_connected_components_long_chain_converges(spark):
    """Round-2 advice: a 50-link chain (diameter 50) must converge — the
    pointer-jumping compression makes rounds O(log n), well inside the
    default max_iter=20 cap — and every node must land on the chain min."""
    pairs = spark.createDataFrame([(i, i + 1) for i in range(50)], "a long, b long")
    got = {r["node"]: r["component"] for r in D.connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(51)}


def test_connected_components_nonconvergence_raises(spark):
    """With an artificially tiny round cap the operator must refuse to
    return split components instead of silently emitting them."""
    import pytest

    pairs = spark.createDataFrame([(i, i + 1) for i in range(50)], "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(pairs, max_iter=2)


def test_connected_components_empty_graph(spark):
    """Round-4 parquet-state rework edge case: an empty pair set must
    yield an empty (node, component) result, not a schema-inference
    failure on an empty round-trip file."""
    from data_ingestion_auto_spark.operators import dedup as D

    pairs = spark.createDataFrame([], "a long, b long")
    out = D.connected_components(pairs)
    assert out.collect() == []
    assert set(out.columns) == {"node", "component"}


def test_connected_components_result_survives_temp_cleanup(spark):
    """The returned DataFrame is pinned before the temp checkpoint dir is
    deleted — collecting AFTER the call must still work."""
    from data_ingestion_auto_spark.operators import dedup as D

    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "a long, b long")
    out = D.connected_components(pairs)
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_uses_session_checkpoint_dir(spark, tmp_path, monkeypatch):
    """ADVICE r4: when the session has a checkpoint dir configured (on a
    real cluster that's a shared DFS path), per-round CC state must land
    in a unique subdir of it — not a driver-local tempdir executors can't
    reach — and be cleaned up afterwards. The tempdir fallback is poisoned
    so reaching it fails the test."""
    import os
    import tempfile

    from data_ingestion_auto_spark.operators import dedup as D

    def _no_tempdir(*_a, **_k):
        raise AssertionError("fell back to driver-local tempdir despite checkpoint dir")

    monkeypatch.setattr(tempfile, "mkdtemp", _no_tempdir)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    sc = spark.sparkContext
    had = sc._jsc.sc().getCheckpointDir()
    sc.setCheckpointDir(str(ckpt))
    try:
        pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "a long, b long")
        out = D.connected_components(pairs)
        got = {r["node"]: r["component"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
        # state dir was created under the checkpoint dir and cleaned up
        # (Spark nests a session-UUID dir under the configured path, so
        # walk recursively)
        leftovers = [
            d
            for root, dirs, _files in os.walk(ckpt)
            for d in dirs
            if d.startswith("spark_cc_state_")
        ]
        assert leftovers == []
    finally:
        if had.isDefined():
            sc.setCheckpointDir(had.get())
