"""Job registry / interval scheduler semantics (W1/W2/W5)."""

from __future__ import annotations

import pytest

from data_ingestion_auto_spark.jobs import Job, JobRegistry


def test_interval_gating():
    calls = []
    r = JobRegistry()
    r.register(Job("a", lambda: calls.append("a") or {"status": "ok"}, interval_seconds=100))
    assert "a" in r.run_due(now=1000.0)
    assert r.run_due(now=1050.0) == {}  # not due yet
    assert "a" in r.run_due(now=1100.0)
    assert calls == ["a", "a"]


def test_failure_retries_next_tick():
    """W5: a failing job records an error and stays due (schedule does not
    advance) — next tick retries."""
    state = {"fail": True}

    def flaky():
        if state["fail"]:
            raise RuntimeError("404 not yet available")
        return {"status": "ok"}

    r = JobRegistry()
    r.register(Job("f", flaky, interval_seconds=100))
    out = r.run_due(now=0.0)
    assert out["f"]["status"] == "error" and "404" in out["f"]["error"]
    state["fail"] = False
    out2 = r.run_due(now=1.0)  # immediately due again — schedule not advanced
    assert out2["f"]["status"] == "ok"
    assert r.run_due(now=50.0) == {}  # now gated by interval


def test_dev_allowlist_and_disabled():
    """TASKS_DEV-style selective start (main.py:26-28) + enabled flag
    (jobs.py registry entries)."""
    ran = []
    r = JobRegistry(allowlist=["x"])
    r.register(Job("x", lambda: ran.append("x") or {"status": "ok"}))
    r.register(Job("y", lambda: ran.append("y") or {"status": "ok"}))
    r.register(Job("z", lambda: ran.append("z") or {"status": "ok"}, enabled=False))
    r.run_due(now=0.0)
    assert ran == ["x"]


def test_duplicate_id_rejected():
    r = JobRegistry()
    r.register(Job("a", lambda: {}))
    with pytest.raises(ValueError):
        r.register(Job("a", lambda: {}))
