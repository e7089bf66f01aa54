"""Fair re-verification rotation for the external correctness gate.

The driver's gate verifies roughly the first 50 registry entries per round
(registry-insertion order). Round 2 shipped an importtime reorder that
permanently demoted every query with a prior green row below the cap — the
round-2 advisor correctly flagged that as gaming the harness: a query whose
implementation changed after its green round would never be re-checked, and
``err == "no_oracle"`` rows were treated as verified forever.

This module replaces that with a documented, non-gaming policy. Every query
keeps cycling through the gate; nothing is permanently demoted; a changed
query loses its "verified" standing immediately.

Ordering (first = checked this round):

1. **failed**  — the most recent driver check did not pass. Must re-run.
2. **never**   — no row in any ``CORRECTNESS_r*.json`` yet.
3. **changed** — the query's fingerprint (md5 of its Spark callable's
   source + its oracle SQL text) differs from the fingerprint recorded in
   ``VERIFIED.json`` at its last driver check, ordered stalest-first.
4. **checked** — everything else, least-recently-checked round first.

Ties break on name, so the order is fully deterministic. With N queries and
a per-round cap C, every query is re-checked at least every ``ceil(N/C)``
rounds even if nothing changes; an edited query re-enters the next round's
batch. ``no_oracle`` rows are recorded as the weaker ``rows_only`` mode —
they count as *checked* (they rotate like the rest) but are never reported
as hash-verified.

Ledger maintenance: run ``python -m tools.fingerprints`` at round start,
BEFORE editing any query, so the stamped fingerprint matches the code the
gate actually ran (the end-of-round snapshot). The ledger is committed.

The fingerprint covers the decorated function's own source, the oracle
string (which inlines helper-generated SQL at decoration time), the full
source of the module DEFINING the query, and the source of every package
module that defining module directly imports (round-3 advice: a
helper-only edit — e.g. ``multiprobe_topk`` or an ``operators/*`` change —
must re-queue the queries that delegate to it). Known remaining limits
(ADVICE r4): (a) helpers reached only at depth ≥ 2 (a module imported by
an imported module) don't change the fingerprint; (b) dependency detection
walks module attributes for modules and objects carrying ``__module__``,
so ``from x import SOME_CONSTANT`` of a plain int/str/dict is invisible —
a constant-only edit in a helper module won't re-queue dependents (prefer
module-level imports, ``from .. import helpers`` + ``helpers.CONSTANT``,
for cross-module constants the rotation should see). Both gaps are still
caught by the full sf0.001 differential suite in
``tests/test_oracle_parity.py`` and by the ≤ceil(N/C)-round recycle.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys
import textwrap
from types import ModuleType

from .registry import REGISTRY, Query

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
LEDGER_PATH = os.path.join(_REPO, "VERIFIED.json")

_PKG = "data_ingestion_auto_spark"
_module_digest_cache: dict[str, str] = {}


def _module_source(mod: ModuleType | None) -> str:
    try:
        return inspect.getsource(mod) if mod is not None else ""
    except (OSError, TypeError):
        return ""


def _direct_deps(modname: str) -> set[str]:
    """In-package modules this module directly references (imported
    modules, and functions/classes whose ``__module__`` is in-package)."""
    mod = sys.modules.get(modname)
    deps: set[str] = set()
    if mod is not None:
        for v in vars(mod).values():
            if isinstance(v, ModuleType) and v.__name__.startswith(_PKG):
                deps.add(v.__name__)
            else:
                owner = getattr(v, "__module__", None)
                if isinstance(owner, str) and owner.startswith(_PKG) and owner != modname:
                    deps.add(owner)
    return deps


def _deps_digest(modname: str) -> str:
    """md5 over the module's own source plus the sources of every package
    module in its TRANSITIVE import closure (round 6, closing ADVICE r4
    limit (a): ``helpers.T`` delegates to ``sources.tables.load_table``,
    which made ``sources/tables.py`` a depth-2 dependency of nearly every
    defining module — under the old direct-only digest an edit there
    re-queued nothing). Function-local imports remain invisible
    (``tests/test_rotation.py`` pins the closure so a helper that matters
    can't silently fall out); the full sf0.001 differential suite is the
    backstop for those."""
    if modname in _module_digest_cache:
        return _module_digest_cache[modname]
    closure = _import_closure(modname)
    parts = [_module_source(sys.modules.get(m)) for m in sorted(closure)]
    digest = hashlib.md5("\0".join(parts).encode()).hexdigest()
    _module_digest_cache[modname] = digest
    return digest


def _import_closure(modname: str) -> set[str]:
    closure: set[str] = set()
    frontier = [modname]
    while frontier:
        m = frontier.pop()
        if m in closure:
            continue
        closure.add(m)
        frontier.extend(_direct_deps(m) - closure)
    return closure


def fingerprint(q: Query) -> str:
    """md5 over the Spark callable's dedented source + the oracle text +
    the defining module's dependency digest (see module docstring)."""
    try:
        src = textwrap.dedent(inspect.getsource(q.spark))
    except (OSError, TypeError):  # builtins/lambdas without source
        src = repr(q.spark)
    modname = getattr(q.spark, "__module__", "") or ""
    dep = _deps_digest(modname) if modname.startswith(_PKG) else ""
    return hashlib.md5((src + "\0" + (q.oracle or "") + "\0" + dep).encode()).hexdigest()


def current_fingerprints() -> dict[str, str]:
    return {name: fingerprint(q) for name, q in REGISTRY.items()}


def _correctness_rows() -> dict[str, dict]:
    """name -> {round, mode} from the LATEST round that checked each query.

    mode: 'hash' (hash_match true), 'rows_only' (no_oracle row executed),
    'failed' (anything else — mismatch or error).
    """
    out: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if row.get("hash_match"):
                mode = "hash"
            elif row.get("err") == "no_oracle":
                mode = "rows_only"
            else:
                mode = "failed"
            prev = out.get(name)
            if prev is None or rnd >= prev["round"]:
                out[name] = {"round": rnd, "mode": mode}
    return out


def build_ledger() -> dict[str, dict]:
    """Stamp driver-checked queries with the fingerprint of the code
    their gate actually ran.

    The working tree equals the snapshot of the NEWEST gate round only
    (that is the precondition both writers enforce), so CURRENT
    fingerprints are stamped for that round's rows alone. A row whose
    last check is an OLDER round keeps the fingerprint its own stamp
    recorded back then (carried forward from the committed ledger):
    stamping it with today's fingerprint would claim the old gate
    verified code it never ran, and would erase rotation's "changed"
    signal for queries edited since (round-8 ADVICE, medium — the r8
    autostamp did exactly that and the gate then sampled the 50 stalest
    queries instead of the 27 helper-touched ones). An older row with
    no previously stamped fingerprint gets ``None`` — never equal to a
    current fingerprint, so it stays in the "changed" rotation class
    until a gate re-checks it.
    """
    fps = current_fingerprints()
    prev = load_ledger()
    rows = _correctness_rows()
    newest = max((r["round"] for r in rows.values()), default=0)
    ledger = {}
    for name, row in rows.items():
        if name not in fps:  # query was renamed/removed since that round
            continue
        if row["round"] == newest:
            fp = fps[name]
        else:
            old = prev.get(name)
            fp = old.get("fingerprint") if isinstance(old, dict) else None
        ledger[name] = {"fingerprint": fp, "round": row["round"], "mode": row["mode"]}
    return ledger


def load_ledger() -> dict[str, dict]:
    try:
        with open(LEDGER_PATH) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def sort_key(name: str, ledger: dict[str, dict], fps: dict[str, str]):
    rec = ledger.get(name)
    if rec is None:
        # Never checked by any driver round — but distinguish true-new from
        # failed below via the correctness rows already folded into ledger.
        return (1, 0, name)
    if rec.get("mode") == "failed":
        return (0, rec.get("round", 0), name)
    if rec.get("fingerprint") != fps.get(name):
        return (2, rec.get("round", 0), name)
    return (3, rec.get("round", 0), name)


def _git(*args: str) -> str | None:
    import subprocess

    try:
        r = subprocess.run(
            ["git", *args], cwd=_REPO, capture_output=True, text=True, timeout=30
        )
    except (OSError, subprocess.SubprocessError):
        return None
    return r.stdout if r.returncode == 0 else None


def maybe_autostamp() -> bool:
    """Round-end ledger automation (round-4 verdict #6): stamp the ledger
    at the first ``plans`` import after a new driver gate pass, so a round
    can never OPEN with a stale ledger and NOTES never has to say
    "round-N+1 first action: run tools/fingerprints" again.

    Stamping records CURRENT fingerprints as "the code the gate verified",
    which is only true while the working tree still equals the gate's
    snapshot. So the auto-stamp fires only when ALL of:

    1. the newest ``CORRECTNESS_r{N}.json`` round exceeds every round in
       the committed ledger (i.e. a gate pass hasn't been stamped yet);
    2. the package tree has no uncommitted changes; and
    3. no commit has touched ``data_ingestion_auto_spark/`` after the
       commit that introduced that newest CORRECTNESS file (i.e. nothing
       was edited-and-committed between the gate pass and now); and
    4. the CORRECTNESS commit itself touched nothing under the package —
       condition 3's ``corr_commit..HEAD`` range excludes ``corr_commit``,
       so without this a single commit that both edits package code and
       adds the gate file would stamp fingerprints the gate never ran
       (round-5 advice).

    Any other state (mid-round, dirty tree, git unavailable) is a silent
    no-op; ``python -m tools.fingerprints`` remains the manual/forced
    path. Returns True iff the ledger was written."""
    rows = _correctness_rows()
    if not rows:
        return False
    newest = max(r["round"] for r in rows.values())
    ledger = load_ledger()
    stamped = max((rec.get("round", 0) for rec in ledger.values()), default=0)
    if newest <= stamped:
        return False
    dirty = _git("status", "--porcelain", "--", "data_ingestion_auto_spark")
    if dirty is None or dirty.strip():
        return False
    corr_commit = _git(
        "log", "-1", "--format=%H", "--", f"CORRECTNESS_r{newest:02d}.json"
    )
    if corr_commit is None or not corr_commit.strip():
        return False
    edits_since = _git(
        "log", "--oneline", f"{corr_commit.strip()}..HEAD", "--", "data_ingestion_auto_spark"
    )
    if edits_since is None or edits_since.strip():
        return False
    in_commit = _git(
        "diff-tree", "--no-commit-id", "--name-only", "-r",
        corr_commit.strip(), "--", "data_ingestion_auto_spark",
    )
    if in_commit is None or in_commit.strip():
        return False
    try:
        with open(LEDGER_PATH, "w") as f:
            json.dump(build_ledger(), f, indent=1, sort_keys=True)
    except OSError:
        return False
    print(
        f"[rotation] auto-stamped VERIFIED.json for round {newest} "
        f"({len(rows)} driver-checked queries)",
        file=sys.stderr,
    )
    return True


def apply_rotation() -> None:
    """Reorder REGISTRY in place per the documented policy (idempotent)."""
    maybe_autostamp()
    ledger = load_ledger()
    fps = current_fingerprints()
    ordered = sorted(REGISTRY, key=lambda n: sort_key(n, ledger, fps))
    snapshot = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(snapshot)
