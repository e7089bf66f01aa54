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


def test_autostamp_fires_only_when_safe(monkeypatch, tmp_path):
    """Round-end automation (r4 verdict #6): the auto-stamp writes the
    ledger exactly when (newer gate round) AND (clean package tree) AND
    (no package commits after the gate commit); every other state is a
    no-op."""
    ledger_path = tmp_path / "VERIFIED.json"
    monkeypatch.setattr(rotation, "LEDGER_PATH", str(ledger_path))
    monkeypatch.setattr(
        rotation, "_correctness_rows", lambda: {"q": {"round": 9, "mode": "hash"}}
    )
    monkeypatch.setattr(rotation, "build_ledger", lambda: {"q": {"round": 9}})

    calls = {}

    def fake_git(*args):
        calls[args[0]] = calls.get(args[0], 0) + 1
        if args[0] == "status":
            return calls.get("dirty_response", "") if "dirty" not in calls else " M x.py\n"
        if args[0] == "log" and args[1] == "-1":
            return "abc123\n"
        return ""  # no commits since

    monkeypatch.setattr(rotation, "_git", fake_git)

    # all conditions hold -> stamps
    assert rotation.maybe_autostamp() is True
    assert ledger_path.exists()

    # already stamped for round 9 -> no-op (ledger round == newest)
    import json as _json

    ledger_path.write_text(_json.dumps({"q": {"round": 9}}))
    assert rotation.maybe_autostamp() is False

    # newer gate round but dirty tree -> no-op
    ledger_path.write_text(_json.dumps({"q": {"round": 8}}))
    calls["dirty"] = True
    assert rotation.maybe_autostamp() is False

    # git unavailable -> no-op
    monkeypatch.setattr(rotation, "_git", lambda *a: None)
    assert rotation.maybe_autostamp() is False


def test_autostamp_refuses_when_package_edited_after_gate(monkeypatch, tmp_path):
    ledger_path = tmp_path / "VERIFIED.json"
    monkeypatch.setattr(rotation, "LEDGER_PATH", str(ledger_path))
    monkeypatch.setattr(
        rotation, "_correctness_rows", lambda: {"q": {"round": 9, "mode": "hash"}}
    )

    def fake_git(*args):
        if args[0] == "status":
            return ""
        if args[0] == "log" and args[1] == "-1":
            return "abc123\n"
        return "deadbee edited the package\n"  # commits touched the package

    monkeypatch.setattr(rotation, "_git", fake_git)
    assert rotation.maybe_autostamp() is False
    assert not ledger_path.exists()


def test_autostamp_refuses_when_gate_commit_touches_package(monkeypatch, tmp_path):
    """ADVICE r5: condition 3's corr_commit..HEAD range excludes
    corr_commit itself — a single commit that both edits package code and
    adds the CORRECTNESS file must NOT stamp (the gate never ran that
    code)."""
    ledger_path = tmp_path / "VERIFIED.json"
    monkeypatch.setattr(rotation, "LEDGER_PATH", str(ledger_path))
    monkeypatch.setattr(
        rotation, "_correctness_rows", lambda: {"q": {"round": 9, "mode": "hash"}}
    )

    def fake_git(*args):
        if args[0] == "status":
            return ""
        if args[0] == "log" and args[1] == "-1":
            return "abc123\n"
        if args[0] == "log":
            return ""  # nothing AFTER the gate commit
        if args[0] == "diff-tree":
            return "data_ingestion_auto_spark/plans/core.py\n"  # but IN it
        return ""

    monkeypatch.setattr(rotation, "_git", fake_git)
    assert rotation.maybe_autostamp() is False
    assert not ledger_path.exists()


def test_fingerprint_closure_reaches_transitive_helpers():
    """Round 6 (ADVICE r4 limit (a)): the dependency digest must cover the
    TRANSITIVE import closure, not just direct imports — sources/tables.py
    (reached only via plans.helpers.T) is the load-bearing case: an edit
    to load_table changes every query's scan and must re-queue them all."""
    closure = rotation._import_closure("data_ingestion_auto_spark.plans.core")
    assert "data_ingestion_auto_spark.plans.helpers" in closure  # depth 1
    assert "data_ingestion_auto_spark.sources.tables" in closure  # depth 2
    # every registered query's defining module must reach sources.tables
    # (all queries scan fixture tables through helpers.T / load_table)
    defining = {q.spark.__module__ for q in REGISTRY.values()}
    for mod in defining:
        assert "data_ingestion_auto_spark.sources.tables" in rotation._import_closure(
            mod
        ), mod


def test_ledger_carries_old_fingerprints_for_stale_rounds(monkeypatch):
    """Round-9 (ADVICE r8, medium): build_ledger must stamp CURRENT
    fingerprints only for rows of the NEWEST gate round (the one whose
    snapshot equals the tree). A query last checked in an older round
    keeps the fingerprint its own stamp recorded — so a helper-touched
    query survives an autostamp still classified "changed" and the next
    gate samples it before merely-stale green queries."""
    monkeypatch.setattr(
        rotation,
        "_correctness_rows",
        lambda: {
            "fresh": {"round": 9, "mode": "hash"},
            "stale_edited": {"round": 7, "mode": "hash"},
            "stale_unstamped": {"round": 6, "mode": "hash"},
        },
    )
    fps = {"fresh": "fA", "stale_edited": "fB_new", "stale_unstamped": "fC"}
    monkeypatch.setattr(rotation, "current_fingerprints", lambda: fps)
    monkeypatch.setattr(
        rotation,
        "load_ledger",
        lambda: {
            "fresh": {"fingerprint": "fA_old", "round": 8, "mode": "hash"},
            "stale_edited": {"fingerprint": "fB_r7", "round": 7, "mode": "hash"},
            # stale_unstamped: no prior ledger row at all
        },
    )
    ledger = rotation.build_ledger()
    # newest-round row: stamped with the CURRENT fingerprint
    assert ledger["fresh"]["fingerprint"] == "fA"
    # older round, edited since its stamp: keeps the round-7 fingerprint,
    # NOT today's — it must stay visibly "changed"
    assert ledger["stale_edited"]["fingerprint"] == "fB_r7"
    # older round, never stamped: None, never equal to any current fp
    assert ledger["stale_unstamped"]["fingerprint"] is None
    # rotation consequence: both stale rows outrank the fresh green row
    order = sorted(fps, key=lambda n: rotation.sort_key(n, ledger, fps))
    assert order == ["stale_unstamped", "stale_edited", "fresh"]
