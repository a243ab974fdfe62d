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


def test_compaction_replaces_files_and_guards_incremental(spark, tmp_path):
    import pytest

    from gdal_spark.plans.manifest import Manifest

    m = Manifest(str(tmp_path / "mani2"))
    r1 = m.append_stage(spark, "feed", spark.range(0, 10))
    r2 = m.append_stage(spark, "feed", spark.range(10, 30))
    rc = m.compact_stage(spark, "feed", target_files=1)
    assert rc.n_files == 1 and rc.rows == 30
    # compacted snapshot reads the full table from one file
    assert m.read_as_of(spark, "feed", snapshot_fp=rc.fp).count() == 30
    # older snapshots stay time-travel-readable (replaced files on disk)
    assert m.read_as_of(spark, "feed", snapshot_fp=r1.fp).count() == 10
    # appends continue on top of the compacted list without double count
    r3 = m.append_stage(spark, "feed", spark.range(30, 35))
    assert r3.rows == 35
    assert m.read_as_of(spark, "feed", snapshot_fp=r3.fp).count() == 35
    # incremental after the compaction works...
    assert m.read_changes(spark, "feed", from_fp=rc.fp, to_fp=r3.fp).count() == 5
    # ...but across the boundary it must refuse, not silently overcount
    with pytest.raises(LookupError):
        m.read_changes(spark, "feed", from_fp=r2.fp, to_fp=r3.fp)
