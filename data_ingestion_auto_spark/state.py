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

Durability: write-temp + fsync + os.replace + DIRECTORY fsync — the
reference's atomic state write (utils.py:38-65) plus the rename-durability
step it lacks (review r11: without fsyncing the containing directory, a
power loss after commit() returns can revert the rename and regress the
watermark). The store is tiny (one row per (dataset, key)) and
driver-side by design — exactly like Structured Streaming's checkpoint
metadata; the data plane never touches it.

Isolation (review r11): every mutation runs under BOTH a process-level
lock and an fcntl file lock on a `.lock` sidecar, so concurrent
committers — multiple Structured Streaming queries' foreachBatch threads,
or two driver processes sharing one state file — serialize their
read-modify-write instead of silently losing each other's keys.
"""

from __future__ import annotations

import fcntl
import json
import os
import tempfile
import threading


class StateStore:
    """Atomic KV store: dataset_id → {key: value} (values are strings:
    ISO dates or paths), JSON-file-backed like the reference's state.json.
    """

    def __init__(self, path: str) -> None:
        self.path = path
        self._mutex = threading.Lock()  # same-process committers

    class _FileLock:
        """fcntl advisory lock on `{path}.lock` — cross-process committers."""

        def __init__(self, path: str):
            self._path = path + ".lock"

        def __enter__(self):
            d = os.path.dirname(os.path.abspath(self._path)) or "."
            os.makedirs(d, exist_ok=True)
            self._fd = os.open(self._path, os.O_CREAT | os.O_RDWR)
            fcntl.flock(self._fd, fcntl.LOCK_EX)
            return self

        def __exit__(self, *exc):
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            return False

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
            # make the RENAME durable too: fsync the directory entry, or a
            # power loss after commit() returns can resurrect the old file
            dfd = os.open(d, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def get(self, dataset_id: str, key: str = "last_update") -> str | None:
        return self._read_all().get(dataset_id, {}).get(key)

    def get_all(self, dataset_id: str) -> dict[str, str]:
        return dict(self._read_all().get(dataset_id, {}))

    def commit(self, dataset_id: str, updates: dict[str, str]) -> None:
        """Atomic merge-upsert of one dataset's keys — the ONLY way state
        advances; called once, after all sinks commit. Serialized against
        concurrent committers (thread + file lock) so parallel streaming
        queries sharing one state file never lose each other's keys."""
        with self._mutex, self._FileLock(self.path):
            state = self._read_all()
            state.setdefault(dataset_id, {}).update(
                {k: str(v) for k, v in updates.items()}
            )
            self._write_atomic(state)

    def should_skip(self, dataset_id: str, latest: str, key: str = "last_update") -> bool:
        """Skip-when-equal (W3): True if `latest` is already committed."""
        return self.get(dataset_id, key) == str(latest)

    def delete(self, dataset_id: str, key: str | None = None) -> None:
        with self._mutex, self._FileLock(self.path):
            state = self._read_all()
            if dataset_id not in state:
                return
            if key is None:
                del state[dataset_id]
            else:
                state[dataset_id].pop(key, None)
            self._write_atomic(state)
