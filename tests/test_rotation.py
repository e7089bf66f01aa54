"""Gate-rotation policy tests (round-2 advice HIGH): the ordering must
put failed checks first, then never-checked, then changed-since-green,
then least-recently-checked — and must never treat a no_oracle row as
hash-verified or permanently demote anything."""

from __future__ import annotations

from data_ingestion_auto_spark.plans import REGISTRY, rotation


def _order(names, ledger, fps):
    return sorted(names, key=lambda n: rotation.sort_key(n, ledger, fps))


def test_bucket_priorities():
    fps = {"a": "f1", "b": "f2", "c": "f3", "d": "f4", "e": "f5"}
    ledger = {
        "a": {"fingerprint": "f1", "round": 1, "mode": "hash"},       # checked r1
        "b": {"fingerprint": "OLD", "round": 2, "mode": "hash"},      # changed
        "c": {"fingerprint": "f3", "round": 2, "mode": "rows_only"},  # checked r2
        "d": {"fingerprint": "f4", "round": 2, "mode": "failed"},     # failed
        # e: never checked
    }
    assert _order(list(fps), ledger, fps) == ["d", "e", "b", "a", "c"]


def test_least_recently_checked_ascends():
    fps = {n: "f" for n in ("p", "q", "r")}
    ledger = {
        "p": {"fingerprint": "f", "round": 3, "mode": "hash"},
        "q": {"fingerprint": "f", "round": 1, "mode": "hash"},
        "r": {"fingerprint": "f", "round": 2, "mode": "rows_only"},
    }
    assert _order(["p", "q", "r"], ledger, fps) == ["q", "r", "p"]


def test_rows_only_never_recorded_as_hash():
    """build_ledger maps no_oracle rows to the weaker rows_only mode."""
    rows = rotation._correctness_rows()
    # every registered rows-only query that has been driver-checked must
    # carry rows_only (or failed), never hash
    for name, q in REGISTRY.items():
        if q.oracle is None and name in rows:
            assert rows[name]["mode"] != "hash", name


def test_nothing_permanently_demoted():
    """With N queries and cap C, the last-checked rounds in the applied
    REGISTRY order must be non-decreasing within the 'checked' bucket —
    i.e. the stalest checked queries surface first, so every query
    recycles within ceil(N/C) rounds."""
    ledger = rotation.load_ledger()
    fps = rotation.current_fingerprints()
    order = sorted(REGISTRY, key=lambda n: rotation.sort_key(n, ledger, fps))
    checked_rounds = [
        ledger[n]["round"]
        for n in order
        if rotation.sort_key(n, ledger, fps)[0] == 3
    ]
    assert checked_rounds == sorted(checked_rounds)


def test_registry_order_matches_policy():
    """plans/__init__ applied the rotation at import: the live REGISTRY
    iteration order equals the documented sort."""
    ledger = rotation.load_ledger()
    fps = rotation.current_fingerprints()
    expect = sorted(REGISTRY, key=lambda n: rotation.sort_key(n, ledger, fps))
    assert list(REGISTRY) == expect
