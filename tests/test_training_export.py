"""Semantics tests for the training-export batch (decontamination,
sequence packing, training-order shuffle) beyond the oracle hash: the
invariants a training pipeline actually relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_auto_spark import plans


def test_decontamination_excludes_benchmark_and_bounds_overlap(spark, sf_dir):
    df = plans.REGISTRY["decontamination_ngram_overlap"].spark(spark, sf_dir)
    rows = df.collect()
    assert rows, "no training docs scored"
    for r in rows:
        assert r.doc_id % 97 != 0, "benchmark doc leaked into training scores"
        assert 0 <= r.n_overlap <= r.n_ngrams
        assert r.contaminated == (r.n_overlap > 0)
    # the synthetic corpus repeats trigrams: contamination must be a
    # nonempty, proper subset (all-clean or all-dirty would prove nothing)
    flags = {r.contaminated for r in rows}
    assert flags == {True, False}


def test_sequence_packing_fill_invariants(spark, sf_dir):
    df = plans.REGISTRY["sequence_packing_bins"].spark(spark, sf_dir)
    rows = df.collect()
    assert rows
    docs = (
        plans.REGISTRY["sequence_packing_bins"]
        .spark(spark, sf_dir)
        .agg(F.sum("n_docs"), F.sum("bin_tokens"))
        .collect()[0]
    )
    from data_ingestion_auto_spark.plans.helpers import T

    src = T(spark, sf_dir, "documents").select(
        F.count("*").alias("n"), F.sum(F.size(F.split("text", " "))).alias("tok")
    ).collect()[0]
    # every document lands in exactly one bin; every token is accounted for
    assert docs[0] == src.n
    assert docs[1] == src.tok
    # greedy start-bin assignment: a bin overflows by at most one document,
    # so bin_tokens < capacity + max doc length; bins are dense from 0
    max_doc = (
        T(spark, sf_dir, "documents")
        .agg(F.max(F.size(F.split("text", " "))))
        .collect()[0][0]
    )
    by_group: dict[tuple, list] = {}
    for r in rows:
        assert r.bin_tokens < 2048 + max_doc
        by_group.setdefault((r.lang, r.shard), []).append(r.bin_id)
    for bins in by_group.values():
        assert sorted(bins) == list(range(len(bins))), "bin ids not dense from 0"


def test_training_shuffle_is_deterministic_permutation(spark, sf_dir):
    a = plans.REGISTRY["training_order_shuffle"].spark(spark, sf_dir).collect()
    b = plans.REGISTRY["training_order_shuffle"].spark(spark, sf_dir).collect()
    assert a == b, "shuffle must be reproducible run-to-run"
    doc_ids = [r.doc_id for r in a]
    assert len(doc_ids) == len(set(doc_ids)), "not a permutation"
    # ranks are dense 1..n within each shard
    by_shard: dict[str, list] = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.shard_rank)
    for ranks in by_shard.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # and the order is actually shuffled, not doc_id order
    assert doc_ids != sorted(doc_ids)
