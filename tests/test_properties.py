"""Property-based tests (SURVEY §5 item 4): timestamp-regex extraction
over arbitrary paths (P8), pentad successor total ordering (F5), and the
retention comparator's escape handling."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

TS_RE = r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})"


@settings(max_examples=200, deadline=None)
@given(
    prefix=st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30),
    y=st.integers(1900, 2100),
    mo=st.integers(1, 12),
    d=st.integers(1, 28),
    h=st.integers(0, 23),
    suffix=st.text(alphabet="abcdefghij_/.-", max_size=20),
)
def test_timestamp_regex_roundtrip(prefix, y, mo, d, h, suffix):
    """P8: a path with an embedded ISO stamp always yields that stamp back
    — regardless of surrounding junk (reference utils.py:141-149 contract).
    Pure-Python twin of the Spark regexp_extract in
    `regex_timestamp_extract` (same pattern string)."""
    ts = f"{y:04d}-{mo:02d}-{d:02d}T{h:02d}:00:00"
    # avoid the prefix accidentally ending with digits that extend the match
    path = f"{prefix.rstrip('0123456789')}ns_{ts}.000Z{suffix}.tif"
    m = re.search(TS_RE, path)
    assert m and m.group(1) == ts


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdefghijklmnop_/.-0123456789", max_size=40))
def test_timestamp_regex_no_false_full_match(path):
    """A match, when present, is always a syntactically valid stamp shape."""
    m = re.search(TS_RE, path)
    if m:
        s = m.group(1)
        assert len(s) == 19 and s[4] == "-" and s[10] == "T" and s[13] == ":"


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 31), st.integers(1, 31))
def test_pentad_ordering_python_twin(d1, d2):
    """F5: pentad_of_day is monotone — day order implies pentad order
    (python twin of the Column chain; the Spark version is covered in
    test_functions.py)."""

    def pentad(d):
        return min((d - 1) // 5 + 1, 6)

    if d1 <= d2:
        assert pentad(d1) <= pentad(d2)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(2000, 2030), st.integers(1, 12), st.integers(1, 28)),
        min_size=1,
        max_size=8,
    )
)
def test_retention_comparator_with_escaping(dates):
    """K8: the Hive-escaped form of an ISO timestamp partition value must
    compare identically to the raw form after unquoting (the sinks.py
    contract; the raw %3A form does NOT — that was a real bug)."""
    from urllib.parse import quote, unquote

    stamps = [f"{y:04d}-{m:02d}-{d:02d}T00:00:00" for (y, m, d) in dates]
    for s in stamps:
        esc = quote(s, safe="")
        assert unquote(esc) == s
    raw_sorted = sorted(stamps)
    unq_sorted = sorted(stamps, key=lambda s: unquote(quote(s, safe="")))
    assert raw_sorted == unq_sorted


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein (full DP) for the banding property."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=150, deadline=None)
@given(
    a=st.text(alphabet="abcde ", max_size=60),
    b=st.text(alphabet="abcde ", max_size=60),
)
def test_banded_levenshtein_verdict_invariant(a, b):
    """Round-6 banding rule for `neardup_levenshtein_confirm`: with
    threshold T = 0.4 × prefix_len ≥ 0.4 × max(len), declaring
    unconfirmed whenever lev > T NEVER flips a confirmed verdict —
    because confirmed ⇔ lev ≤ 0.4·max_len ≤ T. Property-checked against
    a full-DP reference over arbitrary strings (the engine-side
    equivalent is hash-verified at sf0.01; this pins the MATH the
    banding relies on, independent of either engine)."""
    max_len = max(len(a), len(b))
    if max_len == 0:
        return
    T = 24  # 0.4 × the 60-char cap of this property's strings
    lev = _lev(a, b)
    banded = lev if lev <= T else None  # what the 3-arg levenshtein reports
    confirmed_full = lev <= 0.4 * max_len
    confirmed_banded = banded is not None and banded <= 0.4 * max_len
    assert confirmed_full == confirmed_banded
    # and the band can never hide a pair the length gap alone admits:
    if abs(len(a) - len(b)) > T:
        assert banded is None
