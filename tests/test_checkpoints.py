"""checkpoints.ckpt contract (round-9, VERDICT r7 #3): data-sized
lineage cuts must be RELIABLE (survive executor loss) whenever the
session has a checkpoint dir, and fall back to localCheckpoint — not
fail — on the driver-contract vanilla session that has none."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from data_ingestion_auto_spark.checkpoints import ckpt


def test_ckpt_uses_reliable_dir_when_configured(spark, tmp_path):
    sc = spark.sparkContext
    prev = sc.getCheckpointDir()
    ckdir = str(tmp_path / "ck")
    sc.setCheckpointDir(ckdir)
    try:
        df = ckpt(spark.range(100).withColumn("x", F.col("id") * 2))
        assert df.count() == 100
        # a reliable checkpoint writes RDD blocks under the configured dir
        assert glob.glob(os.path.join(ckdir, "**", "rdd-*"), recursive=True)
        assert df.filter("x >= 0").count() == 100  # readable downstream
    finally:
        # pyspark has no unset; point subsequent tests at a throwaway dir
        # only if one existed before (the shared session normally has none)
        if prev is not None:
            sc.setCheckpointDir(prev)
        else:
            reset = getattr(sc._jsc.sc(), "checkpointDir_$eq")
            reset(spark._jvm.scala.Option.apply(None))


def test_ckpt_falls_back_to_local_without_dir(spark):
    assert spark.sparkContext.getCheckpointDir() is None
    df = ckpt(spark.range(50).withColumn("x", F.col("id") + 1))
    assert df.count() == 50
    # localCheckpoint truncates lineage: the executed plan scans an
    # ExistingRDD, not a re-derivation of range()
    assert "ExistingRDD" in df._jdf.queryExecution().executedPlan().toString()
