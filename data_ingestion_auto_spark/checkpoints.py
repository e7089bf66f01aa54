"""Durable lineage cuts for DATA-SIZED iterative state (VERDICT r7 #3).

``localCheckpoint()`` truncates lineage by caching the partitions on the
executors that computed them — fast, but NON-fault-tolerant: on a real
cluster a lost executor loses the only copy of its partitions and the
job dies (the lineage that would recompute them was just cut). That is
an acceptable trade for bounded-small state (seam rows, per-partition
offsets, k centroids — driver-scale, recomputable in ms) but not for
data-sized state inside an iterative algorithm, where the cut is load-
bearing precisely because recomputation is what we can't afford.

``ckpt`` therefore routes data-sized cuts through the session's RELIABLE
checkpoint directory (DFS-backed, survives executor loss) whenever one
is configured — production sessions call
``spark.sparkContext.setCheckpointDir`` with cluster storage. A session
without one (e.g. the driver-contract vanilla local session) falls back
to ``localCheckpoint``, where single-JVM local mode makes executor loss
a process death anyway, so nothing is lost by the fallback there.

The third lineage-cut pattern in this engine — explicit parquet round-
trips in the connected-components loop (operators/dedup.py) — stays as
is: it was chosen over checkpointing for the measured stats-compounding
reason documented there, and parquet on cluster storage is already
fault-tolerant.

Checkpoint-file RETENTION (round-9 ADVICE): Spark never deletes
reliable checkpoint files unless
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` — the default
is false, so the iterative plans that cut once per round (k-means
updates, BPE merge rounds, the suffix-array prefix-doubling ladder)
accumulate one checkpoint directory per round, unbounded over a
long-lived production session. Production sessions that call
``setCheckpointDir`` MUST either set that conf (checkpoints are then
GC'd when their DataFrame is unreachable) or point the dir at storage
with a lifecycle/TTL rule and clear it between jobs. Local/test
sessions are unaffected (``localCheckpoint`` blocks are owned by the
executor store and die with the JVM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ckpt(df: DataFrame) -> DataFrame:
    """Cut lineage on DATA-SIZED state: reliable ``checkpoint()`` when
    the session has a checkpoint dir, else ``localCheckpoint()`` (local
    mode / driver-contract sessions). Eager either way — callers rely
    on the cut happening before they mutate loop state."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


def ckpt_local(df: DataFrame) -> DataFrame:
    """HOT-PATH lineage cut for BATCH-SIZED, recomputable state: always
    ``localCheckpoint``, never durable — the per-epoch probe/append
    frames inside the indefinitely-running foreachBatch ingest loops
    must not leave one reliable-checkpoint directory per micro-batch on
    cluster storage (review r11; Spark never deletes those by default,
    see the retention note above). Use ``ckpt`` for loop state that is
    corpus-sized or must survive executor loss; use this for small
    frames whose loss merely recomputes one micro-batch."""
    return df.localCheckpoint()
