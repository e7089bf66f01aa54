"""BM25 integer-formula properties.

The oracle proves Spark and DuckDB compute the same numbers; these
pure-Python checks prove the integer-rationalized formula still IS
BM25 — the ranking-relevant analytic properties survive the k1/b
folding (a sign slip in the rationalization would keep parity green
while inverting the ranking)."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, strategies as st


def _contrib(tf: int, dl: int, df: int, n: int, s: int) -> Fraction:
    """Exact-rational mirror of plans/retrieval.py::_CONTRIB."""
    tf_part = Fraction(22 * tf * s, 10 * tf * s + 3 * s + 9 * dl * n)
    idf = Fraction(2 * n - 2 * df + 1, 2 * df + 1)
    return tf_part * idf


def _classic(tf: int, dl: int, df: int, n: int, s: int) -> Fraction:
    """Textbook BM25 term with k1=6/5, b=3/4 and the same rational idf."""
    k1, b = Fraction(6, 5), Fraction(3, 4)
    avgdl = Fraction(s, n)
    tf_part = Fraction(tf) * (k1 + 1) / (tf + k1 * (1 - b + b * Fraction(dl) / avgdl))
    idf = Fraction(n - df + Fraction(1, 2), df + Fraction(1, 2))
    return tf_part * idf


corpus = st.tuples(
    st.integers(1, 50),          # tf
    st.integers(10, 5000),       # dl
    st.integers(1, 999),         # df
    st.integers(1000, 100000),   # n docs
    st.integers(10000, 10**9),   # s total tokens
)


@given(corpus)
def test_rationalization_equals_textbook_bm25(args):
    tf, dl, df, n, s = args
    assert _contrib(tf, dl, df, n, s) == _classic(tf, dl, df, n, s)


@given(corpus)
def test_monotone_increasing_in_tf(args):
    tf, dl, df, n, s = args
    assert _contrib(tf + 1, dl, df, n, s) > _contrib(tf, dl, df, n, s)


@given(corpus)
def test_monotone_decreasing_in_doc_length(args):
    tf, dl, df, n, s = args
    assert _contrib(tf, dl + 1, df, n, s) < _contrib(tf, dl, df, n, s)


@given(corpus)
def test_rarer_terms_score_higher(args):
    tf, dl, df, n, s = args
    if df + 1 <= n:
        assert _contrib(tf, dl, df, n, s) > _contrib(tf, dl, df + 1, n, s)


@given(corpus)
def test_tf_saturates_below_k1_plus_1_ceiling(args):
    tf, dl, df, n, s = args
    idf = Fraction(2 * n - 2 * df + 1, 2 * df + 1)
    assert _contrib(tf, dl, df, n, s) < Fraction(11, 5) * idf
