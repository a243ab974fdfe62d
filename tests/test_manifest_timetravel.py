"""Iceberg-style snapshot history + time travel on the manifest:
each committed stage attempt is a snapshot; older snapshots stay
readable by fingerprint or timestamp."""

import tempfile
import time

from gdal_spark.plans.manifest import Manifest


def test_time_travel_reads_prior_snapshot(spark):
    root = tempfile.mkdtemp(prefix="gdal_spark_tt_")
    m = Manifest(root)

    r1 = m.run_stage(
        spark, "docs", ["v1"], lambda: spark.range(10).withColumnRenamed("id", "x")
    )
    t_between = time.time()
    time.sleep(0.01)
    r2 = m.run_stage(
        spark, "docs", ["v2"], lambda: spark.range(25).withColumnRenamed("id", "x")
    )
    assert r1.fp != r2.fp
    assert len(m.snapshots("docs")) == 2

    # current = latest commit
    assert m.read_as_of(spark, "docs").count() == 25
    # VERSION AS OF
    assert m.read_as_of(spark, "docs", snapshot_fp=r1.fp).count() == 10
    # TIMESTAMP AS OF
    assert m.read_as_of(spark, "docs", ts=t_between).count() == 10

    # identical inputs resume (no third snapshot) and still time-travel
    r3 = m.run_stage(
        spark, "docs", ["v1"], lambda: spark.range(999).withColumnRenamed("id", "x")
    )
    assert r3.resumed and r3.fp == r1.fp
    assert len(m.snapshots("docs")) == 2
