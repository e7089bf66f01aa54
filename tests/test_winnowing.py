"""Winnowing fingerprint properties (Schleimer et al., SIGMOD 2003).

The registered query's correctness vs DuckDB is the oracle's job; these
tests pin the two properties the oracle can't see:

- the selection matches an independent pure-Python winnowing reference
  (rightmost-argmin per window) on the real fixture AND on crafted
  short/periodic documents where the tiebreak and boundary rules bite;
- the winnowing GUARANTEE: every window of w consecutive k-gram positions
  contains at least one selected position.
"""

from __future__ import annotations

import hashlib

import pytest

from data_ingestion_auto_spark.plans.retrieval import _WIN_K, _WIN_W


def _py_winnow(text: str):
    """Reference winnowing: k-gram md5 hashes (hex strings — the same
    comparable the plan uses), rightmost minimum per window of w, short
    docs get the single whole-array window. Returns (n_grams, selected
    positions 1-based, sorted distinct 16-hex fingerprints)."""
    w = text.split(" ")
    k, win = _WIN_K, _WIN_W
    grams = [
        hashlib.md5(" ".join(w[i : i + k]).encode()).hexdigest()
        for i in range(len(w) - k + 1)
    ]
    n = len(grams)
    sel = set()
    if n:
        for e in range(min(win, n), n + 1):  # 1-based window ends
            lo = max(1, e - win + 1)
            window = grams[lo - 1 : e]
            m = min(window)
            # rightmost argmin
            j = len(window) - 1 - window[::-1].index(m)
            sel.add(lo + j)
    fps = sorted({grams[p - 1][:16] for p in sel})
    return n, sel, fps


def _spark_rows(spark, docs_df):
    from data_ingestion_auto_spark.plans.retrieval import (
        _win_spark_cols,
    )
    from pyspark.sql import functions as F

    cols = _win_spark_cols()
    g = docs_df.select("doc_id", F.split("text", " ").alias("w")).select(
        "doc_id", F.expr(cols["grams"]).alias("h")
    )
    s = g.select("doc_id", "h", F.expr(cols["sel"]).alias("sel"))
    return {
        r["doc_id"]: (r["n_grams"], sorted(set(r["sel"])), sorted(set(r["fps"])))
        for r in s.select(
            "doc_id",
            F.size("h").cast("bigint").alias("n_grams"),
            "sel",
            F.expr(cols["fps"]).alias("fps"),
        ).collect()
    }


CRAFTED = [
    (0, ""),  # 1 empty token -> 0 grams
    (1, "a b c"),  # < k tokens -> 0 grams
    (2, "a b c d"),  # exactly one gram -> one fingerprint
    (3, "a b c d e f g"),  # n_grams = 4 < w -> single whole-array window
    (4, "x y x y x y x y x y x y"),  # all grams identical: rightmost tiebreak
    (5, "x y x y x y z x y x y x y"),  # periodic with one breaker
    (6, " ".join(f"t{i}" for i in range(40))),  # all grams distinct
]


def test_matches_python_reference_on_crafted_docs(spark):
    df = spark.createDataFrame(CRAFTED, "doc_id long, text string")
    got = _spark_rows(spark, df)
    for doc_id, text in CRAFTED:
        n, sel, fps = _py_winnow(text)
        gn, gsel, gfps = got[doc_id]
        assert gn == n, (doc_id, gn, n)
        assert gsel == sorted(sel), (doc_id, gsel, sorted(sel))
        assert gfps == fps, (doc_id, gfps, fps)


def test_matches_python_reference_on_fixture(spark, sf_dir):
    from data_ingestion_auto_spark.plans.helpers import T

    docs = T(spark, sf_dir, "documents").limit(64)
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    got = _spark_rows(spark, docs)
    assert len(got) == len(texts)
    for doc_id, text in texts.items():
        n, sel, fps = _py_winnow(text)
        assert got[doc_id] == (n, sorted(sel), fps), doc_id


@pytest.mark.parametrize("doc", [t for _, t in CRAFTED if len(t.split(" ")) >= _WIN_K])
def test_guarantee_every_window_contains_a_selection(doc):
    n, sel, _ = _py_winnow(doc)
    for e in range(min(_WIN_W, n), n + 1):
        lo = max(1, e - _WIN_W + 1)
        assert any(lo <= p <= e for p in sel), (doc, e)


def test_density_near_two_over_w_plus_one(spark, sf_dir):
    """On the fixture's ~60-token docs the expected density of winnowing
    with random distinct hashes is 2/(w+1) (paper §3); md5 over the real
    vocabulary should land near it — a loose sanity band, not a proof."""
    from data_ingestion_auto_spark import plans

    rows = (
        plans.REGISTRY["winnowing_fingerprints"]
        .spark(spark, sf_dir)
        .filter("n_grams >= 20")
        .selectExpr("avg(density) AS d")
        .collect()
    )
    d = rows[0]["d"]
    assert 0.15 <= d <= 0.55, d


def test_match_pairs_guarantee_detects_shared_run(spark):
    """Two docs sharing a k+w-1 = 8-token run MUST surface as a match
    pair (the winnowing guarantee applied cross-doc); two docs with no
    shared 4-gram must not."""
    from data_ingestion_auto_spark.plans import retrieval as R
    import duckdb

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = [
        (0, f"one two three {shared} four five six seven eight nine"),
        (1, f"ten eleven twelve thirteen {shared} fourteen fifteen sixteen"),
        (2, "totally different words with no overlap at all whatsoever here"),
        (3, "another unrelated document about nothing shared with the rest"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    # drive the ORACLE on the crafted corpus (engine parity for the query
    # itself is the registered oracle's job at 3 SFs) — here we check the
    # SEMANTIC guarantee on the shared definition
    rows = con.execute(R._match_oracle()).fetchall()
    pairs = {(r[0], r[1]): r[2] for r in rows}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert all(a == 0 and b == 1 for (a, b) in pairs)
    # the pure-Python reference agrees the shared fingerprint exists
    fps = {i: set(_py_winnow(t)[2]) for i, t in docs}
    assert fps[0] & fps[1] and not (fps[2] & fps[3])


def test_fuzz_matches_python_reference_tiny_alphabet(spark):
    """Hypothesis-style fuzz (fixed seed, deterministic corpus): random
    docs over a 3-token alphabet maximize repeated k-grams — the
    adversarial regime for the rightmost-argmin tiebreak and the short-
    doc boundary window. One Spark pass over 200 docs vs the pure-Python
    reference."""
    import random

    rng = random.Random(20260815)
    docs = [
        (i, " ".join(rng.choice("a b c".split()) for _ in range(rng.randint(0, 30))))
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = _spark_rows(spark, df)
    for doc_id, text in docs:
        n, sel, fps = _py_winnow(text)
        assert got[doc_id] == (n, sorted(sel), fps), (doc_id, text)


def test_match_spans_recover_planted_run_within_slack(spark):
    """Round-9 verdict #5 acceptance: plant a known shared token run and
    assert `winnowing_match_spans` reports, on EACH side, a span that
    lies inside the true run and covers it within k+w-1 token slack
    (winnowing selects at least one gram per window but not necessarily
    the run's first/last gram, so up to w-1 grams at each edge — plus
    the k-1 gram-to-token widening — may be missed)."""
    from data_ingestion_auto_spark.plans import retrieval as R
    import duckdb

    k, w = R._WIN_K, R._WIN_W
    slack = k + w - 1
    shared_tokens = [f"s{i}" for i in range(16)]  # 16-token planted run
    pre_a, post_a = ["a%d" % i for i in range(7)], ["x%d" % i for i in range(6)]
    pre_b, post_b = ["b%d" % i for i in range(11)], ["y%d" % i for i in range(4)]
    docs = [
        (0, " ".join(pre_a + shared_tokens + post_a)),
        (1, " ".join(pre_b + shared_tokens + post_b)),
        (2, "totally different words with no overlap at all whatsoever here"),
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    rows = con.execute(R._spans_oracle()).fetchall()
    by_side = {}
    for a, b, side, st, en, nf in rows:
        assert (a, b) == (0, 1)
        by_side.setdefault(side, []).append((st, en, nf))
    # true run in 1-based token coords per side
    true_a = (len(pre_a) + 1, len(pre_a) + len(shared_tokens))
    true_b = (len(pre_b) + 1, len(pre_b) + len(shared_tokens))
    for side, true in (("a", true_a), ("b", true_b)):
        spans = by_side[side]
        # exactly one merged run per side for a single planted region
        assert len(spans) == 1, spans
        st, en, nf = spans[0]
        lo, hi = true
        assert lo <= st <= lo + slack, (side, spans, true)
        assert hi - slack <= en <= hi, (side, spans, true)
        assert nf >= 1

    # the Spark side agrees with the oracle on the crafted corpus
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.createOrReplaceTempView("documents_crafted")
    import tempfile, os
    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = [
        (r.a, r.b, r.side, r.start_token, r.end_token, r.n_fps)
        for r in R.winnowing_match_spans(spark, d).collect()
    ]
    assert got == [tuple(r) for r in rows]
