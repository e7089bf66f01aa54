"""Watermark / state store for incremental pipelines.

Replicates the reference's per-dataset state semantics (SURVEY W3/W5/K6/K7;
reference ingest/utils.py:94-118 JSON store, ingest/__init__.py:38-47
accessors): the engine's commit log + watermark store.

Semantics replicated (and bugs deliberately fixed, SURVEY §5/§7.4):
- skip-when-equal: a pipeline compares the source's latest partition to its
  watermark and skips the batch if unchanged (ecmwf `:219-221`)
- no-commit-on-failure: state only advances after every sink commits — the
  reference's partial-commit holes (surface watermark overwritten by
  pressure-level result, ecmwf `:188-191`; state advanced inside a param
  loop, tamsat `:120-123`) are structurally impossible here because commit
  is a single atomic upsert at pipeline end
- per-substream keys: `monthly` / `pentadal` / `monthly_normals.<MM>`
  advance independently (chirps `:137,225,272-273`)

Durability: write-temp + fsync + os.replace — the reference's atomic state
write (utils.py:38-65). The store is tiny (one row per (dataset, key)) and
driver-side by design — exactly like Structured Streaming's checkpoint
metadata; the data plane never touches it.
"""

from __future__ import annotations

import json
import os
import tempfile


class StateStore:
    """Atomic KV store: dataset_id → {key: value} (values are strings:
    ISO dates or paths), JSON-file-backed like the reference's state.json.
    """

    def __init__(self, path: str) -> None:
        self.path = path

    def _read_all(self) -> dict[str, dict[str, str]]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _write_atomic(self, state: dict[str, dict[str, str]]) -> None:
        d = os.path.dirname(os.path.abspath(self.path)) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f, indent=1, sort_keys=True)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def get(self, dataset_id: str, key: str = "last_update") -> str | None:
        return self._read_all().get(dataset_id, {}).get(key)

    def get_all(self, dataset_id: str) -> dict[str, str]:
        return dict(self._read_all().get(dataset_id, {}))

    def commit(self, dataset_id: str, updates: dict[str, str]) -> None:
        """Atomic merge-upsert of one dataset's keys — the ONLY way state
        advances; called once, after all sinks commit."""
        state = self._read_all()
        state.setdefault(dataset_id, {}).update({k: str(v) for k, v in updates.items()})
        self._write_atomic(state)

    def should_skip(self, dataset_id: str, latest: str, key: str = "last_update") -> bool:
        """Skip-when-equal (W3): True if `latest` is already committed."""
        return self.get(dataset_id, key) == str(latest)

    def delete(self, dataset_id: str, key: str | None = None) -> None:
        state = self._read_all()
        if dataset_id not in state:
            return
        if key is None:
            del state[dataset_id]
        else:
            state[dataset_id].pop(key, None)
        self._write_atomic(state)
