"""Content-defined chunking (plans/cdc_chunks.py): the property that
justifies the tier — boundaries are CONTENT-defined, so a shared passage
chunks identically regardless of what precedes it (fixed-size blocks
would misalign under any offset shift)."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest

from data_ingestion_auto_spark.plans import cdc_chunks as C


@pytest.fixture(scope="module")
def crafted(spark):
    shared = " ".join(f"s{i}" for i in range(80))  # ~10 expected chunks
    docs = [
        (0, " ".join(f"a{i}" for i in range(23)) + " " + shared, "src0"),
        (1, " ".join(f"b{i}" for i in range(37)) + " " + shared, "src1"),
        (2, " ".join(f"z{i}" for i in range(60)), "src0"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", docs)
    d = tempfile.mkdtemp()
    spark.createDataFrame(docs, "doc_id long, text string, source string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return con, d


def test_shared_passage_survives_offset_shift(spark, crafted):
    """Docs 0 and 1 carry the same 80-token passage behind DIFFERENT
    prefix lengths (23 vs 37 tokens — no fixed block size aligns both).
    CDC must still surface shared chunks, and doc 2 must share none."""
    con, d = crafted
    from data_ingestion_auto_spark import plans

    rows = con.execute(plans.REGISTRY["cdc_chunk_dedup"].oracle).fetchall()
    assert len(rows) >= 1
    # every shared chunk involves exactly docs {0, 1}: keep_doc == 0 and
    # n_docs == 2 for all rows (doc 2 is disjoint content)
    for chunk_hash, n_docs, n_occ, n_tok, keep in rows:
        assert n_docs == 2 and keep == 0, rows
    # the shared chunks cover a meaningful interior of the passage
    assert sum(r[3] for r in rows) >= 40

    # Spark == oracle on the crafted corpus
    got = [
        (r.chunk_hash, r.n_docs, r.n_occurrences, r.chunk_tokens, r.keep_doc)
        for r in C.cdc_chunk_dedup(spark, d).collect()
    ]
    assert got == [tuple(r) for r in rows]


def test_doc_dup_ratio_orders_and_bounds(spark, crafted):
    con, d = crafted
    from data_ingestion_auto_spark import plans

    want = con.execute(plans.REGISTRY["cdc_doc_dup_ratio"].oracle).fetchall()
    got = [
        (r.doc_id, r.n_chunks, r.n_dup_chunks, r.dup_ratio)
        for r in C.cdc_doc_dup_ratio(spark, d).collect()
    ]
    assert got == [tuple(r) for r in want]
    by_doc = {r[0]: r for r in got}
    # the disjoint doc has zero duplicated content
    assert by_doc[2][2] == 0 and by_doc[2][3] == 0.0
    # both sharing docs have strictly positive, < 1 ratios (their
    # prefixes are unique content)
    for doc in (0, 1):
        assert 0.0 < by_doc[doc][3] < 1.0
    # ratio is exactly n_dup/n_chunks
    for _, n, nd, r in got:
        assert r == nd / n


def _py_cdc(text: str, w: int = 4, d: int = 8):
    """Pure-Python reference of the CDC rule: boundary after token i
    (1-based) iff the first-8-hex-digit integer of md5 of the W-token
    window ending at i is divisible by D; chunks partition the token
    list. Returns the list of (chunk_text, n_tokens)."""
    import hashlib

    toks = text.split(" ")
    n = len(toks)
    bps = []
    if n >= w:
        for i in range(w, n + 1):
            window = " ".join(toks[i - w : i])
            h = int(hashlib.md5(window.encode()).hexdigest()[:8], 16)
            if h % d == 0:
                bps.append(i)
    starts = [1] + [b + 1 for b in bps]
    ends = bps + [n]
    out = []
    for s, e in zip(starts, ends):
        if s <= e:
            out.append((" ".join(toks[s - 1 : e]), e - s + 1))
    return out


def test_fuzz_chunks_match_python_reference_and_partition(spark):
    """Random docs over a 3-token alphabet (maximal hash collisions and
    boundary density): the engine's per-doc chunk multiset equals the
    pure-Python reference's, and the reference's chunks PARTITION the
    document (concatenation restores it) — so equality transfers the
    partition property to the engine."""
    import collections
    import hashlib
    import random

    rng = random.Random(20260815)
    docs = [
        (i, " ".join(rng.choice(["a", "b", "c"]) for _ in range(rng.randint(1, 40))),
         f"s{i % 3}")
        for i in range(150)
    ]
    import os
    import tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame(docs, "doc_id long, text string, source string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = collections.defaultdict(collections.Counter)
    for r in C._chunk_rows(spark, d).collect():
        got[r.doc_id][(r.chash, r.n_tokens)] += 1
    for doc_id, text, _ in docs:
        ref = collections.Counter()
        joined = []
        for chunk_text, ln in _py_cdc(text):
            ref[(hashlib.md5(chunk_text.encode()).hexdigest(), ln)] += 1
            joined.append(chunk_text)
        assert " ".join(joined) == text, doc_id  # partition property
        assert got[doc_id] == ref, (doc_id, text)
