"""Regression tests for the size-1 guard on adjacent-pair explodes
(plans/collocations.py, plans/tokenizer.py).

Spark's sequence(0, -1) is the DESCENDING [0, -1] — not empty like
DuckDB's generate_series(1, 0) — so an unguarded
`transform(sequence(0, size(s) - 2), i -> s[i] ...)` evaluates s[-1] on
a single-element array: INVALID_ARRAY_INDEX under Spark 4's default
ANSI mode, silent null-padded pairs otherwise. Both pair explodes are
CASE-guarded to an empty array; these tests pin that a one-token input
yields zero pairs instead of an error (latent in the fixtures, where
documents always carry >= 10 words, but reachable the moment a BPE
vocab word merges down to a single symbol or a one-word document
appears).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _pairs(spark, pairs_expr: str, texts: list[str]) -> list[tuple]:
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return (
        df.select(F.split("text", " ").alias("s"))
        .select(F.expr(pairs_expr).alias("p"))
        .select("p.*")
        .collect()
    )


def test_collocation_pairs_single_token_is_empty(spark):
    from data_ingestion_auto_spark.plans.collocations import _PAIRS

    rows = _pairs(spark, _PAIRS, ["lone"])
    assert rows == []


def test_collocation_pairs_normal_unchanged(spark):
    from data_ingestion_auto_spark.plans.collocations import _PAIRS

    rows = _pairs(spark, _PAIRS, ["a b c", "x"])
    assert sorted((r.l, r.r) for r in rows) == [("a", "b"), ("b", "c")]


def test_bpe_pairs_single_symbol_is_empty(spark):
    from data_ingestion_auto_spark.plans.tokenizer import _PAIRS

    # A fully-merged vocab word ('a</w>') has one symbol — zero pairs,
    # no ANSI INVALID_ARRAY_INDEX.
    rows = _pairs(spark, _PAIRS, ["a</w>"])
    assert rows == []


def test_bpe_pairs_two_symbols(spark):
    from data_ingestion_auto_spark.plans.tokenizer import _PAIRS

    rows = _pairs(spark, _PAIRS, ["a b</w>"])
    assert [(r.ls, r.rs) for r in rows] == [("a", "b</w>")]
