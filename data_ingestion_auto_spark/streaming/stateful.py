"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.10 + W-ops: the engine's extension point for operators neither
built-in aggregates nor session windows express).

Two reference-shaped operators:

- `dedup_stream`: exactly-once-per-key emission — the streaming form of
  the reference's state-based skip (P11/W3: "have I already ingested this
  (dataset, date)?"). State = the set of seen keys per group.
- `running_anomaly_stream`: per-key running mean + anomaly of each new
  value against it — the streaming form of the climatology/anomaly pair
  (A1+J1) where the "normal" accumulates incrementally instead of being
  recomputed (the reference recomputes normals from 31 files then caches;
  here state IS the cache, updated per batch).

Scale: state lives in the state store keyed by the groupBy key —
partitioned across executors, checkpointed, evicted by timeout. The
pandas function sees one key's rows per call (Arrow-batched).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = "user_id bigint, event_id bigint, first_seen boolean"
DEDUP_STATE_SCHEMA = "floor bigint, seen array<bigint>"


def dedup_stream(
    events: DataFrame, retention_ids: int = 100_000, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Stateful exactly-once-per-key marker: first_seen=False for event ids
    already processed in ANY earlier micro-batch (P11's incremental skip,
    as per-record state).

    BOUNDED state (the round-1 advisor's unbounded-growth fix): per key the
    state is (floor, seen) where ``seen`` holds at most ``retention_ids``
    of the LARGEST ids observed and ``floor`` is the largest id ever
    evicted — any id ≤ floor is treated as already-seen. That is exactly
    watermark semantics (a replay older than the retention window counts
    as a duplicate, the same verdict a watermark-dropping aggregate would
    give it), keeps each micro-batch's state rewrite O(retention) instead
    of O(history) for hot keys, and makes total state ∝ keys × retention,
    not stream length. ``idle_timeout_ms`` additionally drops state for
    keys silent that long (their next id — in a monotonic-id stream —
    will be fresh anyway)."""

    def _dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=["user_id", "event_id", "first_seen"])
            return
        floor, seen = (int(state.get[0]), set(state.get[1])) if state.exists else (-1, set())
        out = []
        for pdf in pdfs:
            for eid in pdf["event_id"]:
                eid = int(eid)
                out.append((key[0], eid, eid > floor and eid not in seen))
                if eid > floor:
                    seen.add(eid)
        if len(seen) > retention_ids:
            ordered = sorted(seen)
            floor = max(floor, ordered[-retention_ids - 1])
            seen = set(ordered[-retention_ids:])
        state.update((floor, sorted(seen)))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(out, columns=["user_id", "event_id", "first_seen"])

    return events.groupBy("user_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


ANOM_OUTPUT_SCHEMA = "user_id bigint, event_id bigint, value double, running_mean double, anomaly double"
ANOM_STATE_SCHEMA = "n bigint, total double"


def _anomaly_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = (state.get if state.exists else (0, 0.0))
    rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values("event_id")
        for eid, v in zip(pdf["event_id"], pdf["value"]):
            mean = total / n if n else None
            rows.append(
                (
                    key[0],
                    int(eid),
                    float(v),
                    round(mean, 6) if mean is not None else None,
                    round(float(v) - mean, 6) if mean is not None else None,
                )
            )
            n += 1
            total += float(v)
    state.update((n, total))
    yield pd.DataFrame(
        rows, columns=["user_id", "event_id", "value", "running_mean", "anomaly"]
    )


def running_anomaly_stream(events: DataFrame) -> DataFrame:
    """Incremental climatology: each value scored against the running mean
    of everything before it (A1+J1 with state as the materialized normal,
    W7). Deterministic within a batch via event_id ordering."""
    return events.groupBy("user_id").applyInPandasWithState(
        _anomaly_fn,
        outputStructType=ANOM_OUTPUT_SCHEMA,
        stateStructType=ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
