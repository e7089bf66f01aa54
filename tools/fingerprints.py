"""Regenerate VERIFIED.json — the driver-check ledger the rotation uses.

Usage: ``python -m tools.fingerprints`` from the repo root, at ROUND START
and before editing any query, so the stamped fingerprints match the code
the previous round's gate actually ran (the end-of-round snapshot commit).

``python -m tools.fingerprints --preview`` shows the rotation order under
the COMMITTED ledger without rewriting it — safe mid-round (a mid-round
re-stamp would wipe the changed-since-green detection for queries edited
this round).

Prints the resulting rotation order preview (first 50 = what the next
driver round will verify) plus bucket counts.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _REPO)


def _dirty_package_files() -> list[str]:
    """Uncommitted changes under the package dir — stamping against a tree
    that differs from the gate's snapshot records wrong fingerprints
    (round-3 advice: the stamp-before-editing workflow is now enforced,
    not just documented). Override with --force if you know better."""
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain", "--", "data_ingestion_auto_spark"],
            cwd=_REPO,
            capture_output=True,
            text=True,
            timeout=30,
        ).stdout
    except (OSError, subprocess.SubprocessError):
        return []
    return [ln for ln in out.splitlines() if ln.strip()]


def main() -> None:
    from data_ingestion_auto_spark.plans import REGISTRY, rotation

    if "--preview" in sys.argv:
        ledger = rotation.load_ledger()
    else:
        dirty = _dirty_package_files()
        if dirty and "--force" not in sys.argv:
            print("REFUSING to stamp: package tree is dirty (stamp must run")
            print("against the snapshot the gate verified). Dirty files:")
            for ln in dirty:
                print(f"  {ln}")
            print("Commit/stash first, or pass --force.")
            sys.exit(1)
        ledger = rotation.build_ledger()
        with open(rotation.LEDGER_PATH, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
    fps = rotation.current_fingerprints()
    order = sorted(REGISTRY, key=lambda n: rotation.sort_key(n, ledger, fps))
    buckets = {0: "failed", 1: "never-checked", 2: "changed", 3: "checked"}
    counts: dict[str, int] = {}
    for n in order:
        counts.setdefault(buckets[rotation.sort_key(n, ledger, fps)[0]], 0)
        counts[buckets[rotation.sort_key(n, ledger, fps)[0]]] += 1
    mode = "preview (committed ledger)" if "--preview" in sys.argv else f"wrote {rotation.LEDGER_PATH}"
    print(f"ledger: {len(ledger)} entries — {mode}")
    print(f"buckets: {counts}")
    print("first 50 (next driver batch):")
    for n in order[:50]:
        k = rotation.sort_key(n, ledger, fps)
        print(f"  {buckets[k[0]]:>13} r{k[1]} {n}")


if __name__ == "__main__":
    main()
