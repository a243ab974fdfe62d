"""Spatial clustering pays off at the storage layer: a Z-order-sorted
write produces files whose morton min/max ranges are narrow, so a bbox
query can prune most files by footer statistics — the distributable
replacement for the reference's Hilbert sort + packed R-tree
(apps/gdalalg_vector_sort.cpp:302-389, flatgeobuf/packedrtree.h)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.sort import morton_expr, spatial_sort
from gdal_spark.sources.pages import geocode_encode, synth_pages

N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cluster")
    pts = geocode_encode(synth_pages(spark, 40_000, partitions=8)).select(
        "page_id", "lon", "lat"
    )
    clustered = str(root / "clustered")
    unclustered = str(root / "unclustered")
    spatial_sort(pts, res=10, partitions=N_FILES).write.parquet(clustered)
    # same data, same file count, hash-scattered layout
    pts.withColumn("morton", morton_expr("lon", "lat", 10)).repartition(
        N_FILES
    ).write.parquet(unclustered)
    return clustered, unclustered


def files_matching(path: str, lo: int, hi: int) -> tuple[int, int]:
    """(files whose morton min/max range intersects [lo, hi], total)."""
    hit, total = 0, 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = list(md.schema.to_arrow_schema().names).index("morton")
        fmin = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        fmax = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        total += 1
        if fmin <= hi and fmax >= lo:
            hit += 1
    return hit, total


def test_zorder_layout_prunes_files(layouts):
    clustered, unclustered = layouts
    # a metro-sized bbox → a narrow morton range band (probe NYC area)
    lo, hi = 0, (1 << 20) // 8  # lowest 1/8th of the curve
    c_hit, c_total = files_matching(clustered, lo, hi)
    u_hit, u_total = files_matching(unclustered, lo, hi)
    assert c_total == u_total > 0
    # clustered: only the files owning that curve band match
    assert c_hit <= c_total // 4, (c_hit, c_total)
    # hash layout: every file spans the whole curve — nothing prunes
    assert u_hit == u_total, (u_hit, u_total)


def test_zorder_files_are_disjoint_ranges(layouts):
    clustered, _ = layouts
    ranges = []
    for f in glob.glob(f"{clustered}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = md.schema.to_arrow_schema().names
        idx = names.index("morton")
        fmin = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        fmax = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        ranges.append((fmin, fmax))
    ranges.sort()
    # range-partitioned files tile the curve with no overlaps
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        assert a1 <= b0, (ranges,)
