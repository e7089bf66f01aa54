"""Corpus-level boilerplate blacklist (plans/boilerplate.py): crafted
hand-countable case + engine parity on it."""

from __future__ import annotations

import os
import tempfile

import duckdb

from data_ingestion_auto_spark import plans
from data_ingestion_auto_spark.plans.boilerplate import boilerplate_ngram_mass


def test_crafted_blacklist_and_mass(spark):
    """10 docs: six start with the same 4-word header "home about
    contact search" (3-grams "home about contact" and "about contact
    search", df = 6 = 60% >= 0.5%), then diverge into unique tails;
    three are fully unique; one has fewer than 3 words (0 grams).
    Every unique tail 3-gram has df = 1 < 2, so exactly the two header
    grams are blacklisted; each header doc has 2 boiler grams."""
    header = "home about contact search"
    docs = []
    for i in range(6):
        docs.append((i, f"{header} tail{i}a tail{i}b tail{i}c"))
    docs.append((6, "alpha beta gamma delta epsilon"))
    docs.append((7, "one two three four five six"))
    docs.append((8, "red green blue yellow purple"))
    docs.append((9, "hi there"))  # < 3 words
    d = tempfile.mkdtemp()
    spark.createDataFrame(
        [(i, t, "s") for i, t in docs], "doc_id long, text string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    got = {
        r.doc_id: (r.n_grams, r.n_boiler, r.boiler_ppm)
        for r in boilerplate_ngram_mass(spark, d).collect()
    }
    # header docs: 7 words -> 5 grams, 2 of them blacklisted
    for i in range(6):
        assert got[i] == (5, 2, 400000), got[i]
    assert got[6] == (3, 0, 0)
    assert got[7] == (4, 0, 0)
    assert got[8] == (3, 0, 0)
    assert got[9] == (0, 0, 0)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(plans.REGISTRY["boilerplate_ngram_mass"].oracle).fetchall()
    }
    assert got == want


def test_fixture_axioms(spark, sf_dir):
    rows = boilerplate_ngram_mass(spark, sf_dir).collect()
    assert len(rows) > 0
    assert any(r.n_boiler > 0 for r in rows)  # dup families make boilerplate
    for r in rows:
        assert 0 <= r.n_boiler <= r.n_grams
        assert 0 <= r.boiler_ppm <= 1000000
