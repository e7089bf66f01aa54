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
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))


def main() -> None:
    from data_ingestion_auto_spark.plans import REGISTRY, rotation

    if "--preview" in sys.argv:
        ledger = rotation.load_ledger()
    else:
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
