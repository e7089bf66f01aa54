"""SimHash block-decomposition neighbor join: the COMPLETENESS contract.

The oracle proves Spark/DuckDB agree; these tests prove both agree with
ground truth — a brute-force all-pairs Hamming scan over the fixture's
representative fingerprints in plain Python. Manku 2007's block trick is
only correct if candidate generation is COMPLETE: every pair within
Hamming distance 3 must agree on at least one of the 4 blocks
(pigeonhole — 3 differing bits touch at most 3 blocks). A wrong block
width, off-by-one substring index, or a cap that binds on the fixture
would lose pairs silently, which the engine-vs-engine hash can't catch.
"""

from __future__ import annotations

import hashlib
import itertools
import random


def _shingles(text: str) -> set[str]:
    # mirror operators/dedup.py shingles: DISTINCT char 5-grams at
    # 1-based positions 1..max(len-4, 1)
    n = max(len(text) - 4, 1)
    return {text[i : i + 5] for i in range(n)}


def _simhash64(shingles: set[str]) -> str:
    # bit j = sign of sum over shingles of +/-1 by bit (3 - j%4) of
    # md5 nibble (j//4) — mirrors plans/dedup.py::_simhash_bits_sql64
    digs = [hashlib.md5(s.encode()).hexdigest() for s in shingles]
    bits = []
    for j in range(64):
        nib, bitpos = j // 4, 3 - (j % 4)
        tot = sum(
            1 if (int(d[nib], 16) >> bitpos) & 1 else -1 for d in digs
        )
        bits.append("1" if tot > 0 else "0")
    return "".join(bits)


def _hamming(a: str, b: str) -> int:
    return sum(1 for x, y in zip(a, b) if x != y)


def test_matches_bruteforce_ground_truth(spark, sf_dir):
    from data_ingestion_auto_spark import plans
    from data_ingestion_auto_spark.plans.helpers import T

    rows = T(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sig_of = {r["doc_id"]: _simhash64(_shingles(r["text"])) for r in rows}

    # representatives: one per distinct signature (min doc id)
    reps: dict[str, list[int]] = {}
    for doc_id, sig in sorted(sig_of.items()):
        reps.setdefault(sig, []).append(doc_id)

    truth = {}
    for sa, sb in itertools.combinations(sorted(reps), 2):
        h = _hamming(sa, sb)
        if h <= 3:
            truth[(sa, sb)] = (h, min(reps[sa]), len(reps[sa]), min(reps[sb]), len(reps[sb]))

    got = {
        (r["sig_a"], r["sig_b"]): (
            r["hamming"],
            r["exemplar_a"],
            r["docs_a"],
            r["exemplar_b"],
            r["docs_b"],
        )
        for r in plans.REGISTRY["simhash_hamming_neighbors"]
        .spark(spark, sf_dir)
        .collect()
    }
    # the fixture has fewer reps than the 1000/bucket cap, so the block
    # join must be COMPLETE here: exact equality, both directions
    assert got == truth
    assert len(got) > 0  # the fixture does contain near-dup families


def test_pigeonhole_block_agreement():
    """Any pair of 64-bit strings within Hamming 3 shares at least one
    16-bit block intact — the property the equi-join relies on."""
    rng = random.Random(42)
    for _ in range(500):
        a = [rng.choice("01") for _ in range(64)]
        b = list(a)
        for pos in rng.sample(range(64), rng.randint(0, 3)):
            b[pos] = "1" if b[pos] == "0" else "0"
        sa, sb = "".join(a), "".join(b)
        assert any(sa[k * 16 : k * 16 + 16] == sb[k * 16 : k * 16 + 16] for k in range(4))


def test_hamming_4_pair_can_evade_all_blocks():
    """The threshold is tight: 4 flipped bits, one per block, shares NO
    block — documents why the query claims <=3 and not <=4."""
    a = "0" * 64
    b = "".join(
        "1" if i in (0, 16, 32, 48) else "0" for i in range(64)
    )
    assert _hamming(a, b) == 4
    assert all(a[k * 16 : k * 16 + 16] != b[k * 16 : k * 16 + 16] for k in range(4))
