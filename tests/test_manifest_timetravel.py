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


def test_append_commits_and_incremental_read(spark, tmp_path):
    from gdal_spark.plans.manifest import Manifest

    m = Manifest(str(tmp_path / "mani"))
    b1 = spark.range(0, 10).selectExpr("id", "id * 2 AS v")
    b2 = spark.range(10, 25).selectExpr("id", "id * 2 AS v")
    b3 = spark.range(25, 27).selectExpr("id", "id * 2 AS v")
    r1 = m.append_stage(spark, "feed", b1)
    r2 = m.append_stage(spark, "feed", b2)
    r3 = m.append_stage(spark, "feed", b3)
    assert (r1.rows, r2.rows, r3.rows) == (10, 25, 27)  # cumulative

    # full read at each snapshot fingerprint (time travel still works)
    assert m.read_as_of(spark, "feed", snapshot_fp=r1.fp).count() == 10
    assert m.read_as_of(spark, "feed", snapshot_fp=r2.fp).count() == 25

    # incremental read = exactly the appended batch
    inc = m.read_changes(spark, "feed", from_fp=r1.fp, to_fp=r2.fp)
    got = sorted(row["id"] for row in inc.collect())
    assert got == list(range(10, 25))
    inc2 = m.read_changes(spark, "feed", from_fp=r2.fp)  # to current
    assert sorted(r["id"] for r in inc2.collect()) == [25, 26]
    # from the beginning
    assert m.read_changes(spark, "feed", to_fp=r1.fp).count() == 10
    # no-op diff is empty with the right schema
    assert m.read_changes(spark, "feed", from_fp=r3.fp, to_fp=r3.fp).count() == 0
