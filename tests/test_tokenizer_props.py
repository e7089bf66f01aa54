"""Property tests for the BPE merge rewrite used by `bpe_merge_steps`
(plans/tokenizer.py) — no Spark needed.

The query merges a pair (l, r) inside a space-separated symbol string
with the space-doubling replace trick; both engines' `replace` scan
left-to-right over non-overlapping occurrences, which is exactly the
reference BPE merge semantics (Sennrich et al. 2016's implementation
walks the symbol list left to right). This file proves the trick
equivalent to a direct list-based reference merge on arbitrary symbol
sequences, including the overlap cases ("a a a" + (a,a) -> "aa a") that
make naive substring replacement wrong.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _merge_reference(syms: list[str], l: str, r: str) -> list[str]:
    """Left-to-right non-overlapping merge of adjacent (l, r) — the
    reference BPE semantics."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _merge_trick(sym: str, l: str, r: str) -> str:
    """The exact string pipeline the Spark plan and the DuckDB oracle
    run: double separators, replace ' l  r ' with ' lr ', collapse,
    trim. Python str.replace has the same left-to-right non-overlapping
    contract as both engines' replace()."""
    doubled = " " + sym.replace(" ", "  ") + " "
    merged = doubled.replace(f" {l}  {r} ", f" {l}{r} ")
    return merged.replace("  ", " ").strip()


_SYM = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N", "P", "S"), blacklist_characters=" "),
    min_size=1,
    max_size=4,
)


@settings(max_examples=400, deadline=None)
@given(st.lists(_SYM, min_size=1, max_size=12), st.data())
def test_trick_equals_reference_merge(syms, data):
    # Pick the pair from the sequence's actual adjacencies when any
    # exist (the interesting case), else an arbitrary symbol pair.
    if len(syms) >= 2:
        i = data.draw(st.integers(0, len(syms) - 2))
        l, r = syms[i], syms[i + 1]
    else:
        l = data.draw(_SYM)
        r = data.draw(_SYM)
    assert _merge_trick(" ".join(syms), l, r) == " ".join(_merge_reference(syms, l, r))


@settings(max_examples=200, deadline=None)
@given(st.lists(_SYM, min_size=1, max_size=12), st.data())
def test_trick_noop_when_pair_absent(syms, data):
    l = data.draw(_SYM)
    r = data.draw(_SYM)
    adjacent = any(a == l and b == r for a, b in zip(syms, syms[1:]))
    if not adjacent:
        assert _merge_trick(" ".join(syms), l, r) == " ".join(syms)


def test_overlap_cases():
    assert _merge_trick("a a a", "a", "a") == "aa a"
    assert _merge_trick("a a a a", "a", "a") == "aa aa"
    # A symbol that is a suffix of its neighbour must not false-match:
    # pair (b, c) is not adjacent in "x ab c" (the adjacency is (ab, c)).
    assert _merge_trick("x ab c", "b", "c") == "x ab c"
    assert _merge_trick("x ab c", "ab", "c") == "x abc"
