"""Auto-tuned per-cell salting: the sampled histogram splits only the
hot cell, and the salted shuffle join returns exactly the broadcast
join's rows."""

from __future__ import annotations

import numpy as np

from gdal_spark.kernels import wkb as W
from gdal_spark.operators.spatial_join import (
    auto_salt_map,
    spatial_join_points_in_polygons,
    with_cell,
)


def rect_wkb(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)
    return W.polygon_wkb([ring])


def _points(spark, n=20000):
    # 90% of points pile into a ~0.1° metro blob; the rest spread wide.
    df = spark.range(n)
    hot = df.filter("id % 10 < 9").selectExpr(
        "id",
        "10.0 + (id % 97) * 0.001 as lon",
        "50.0 + (id % 89) * 0.001 as lat",
    )
    cold = df.filter("id % 10 = 9").selectExpr(
        "id",
        "-170.0 + (id % 331) * 1.0 as lon",
        "-80.0 + (id % 157) * 1.0 as lat",
    )
    return hot.unionByName(cold)


POLYS = [
    (1, rect_wkb(9.5, 49.5, 11.5, 51.5)),    # covers the metro blob
    (2, rect_wkb(-60.0, -40.0, 20.0, 30.0)),  # big cold-region zone
]


def test_auto_salt_map_targets_hot_cell(spark):
    pts = with_cell(_points(spark), res=7)
    from gdal_spark.operators.spatial_join import polygon_cover

    cover_cells = {c for c, _, _ in polygon_cover(POLYS, res=7)}
    kmap = auto_salt_map(
        pts, cover_cells, sample_fraction=0.5, target_rows_per_key=1000
    )
    assert kmap, "hot cell must be detected"
    assert max(kmap.values()) > 1
    # only a few cells split — the cover is NOT exploded wholesale
    assert len(kmap) <= 5


def test_auto_salted_join_matches_broadcast(spark):
    pts = _points(spark)
    ref = {
        (r["id"], r["poly_id"])
        for r in spatial_join_points_in_polygons(
            pts, POLYS, broadcast_cover=True
        ).collect()
    }
    got = {
        (r["id"], r["poly_id"])
        for r in spatial_join_points_in_polygons(
            pts,
            POLYS,
            broadcast_cover=False,
            salt_factor="auto",
            salt_sample_fraction=0.5,
            salt_target_rows_per_key=1000,
        ).collect()
    }
    assert got == ref and len(ref) > 0


def test_auto_salt_no_hot_cells_degrades_to_plain(spark):
    pts = _points(spark).filter("id % 10 = 9")  # cold points only
    ref = {
        (r["id"], r["poly_id"])
        for r in spatial_join_points_in_polygons(
            pts, POLYS, broadcast_cover=True
        ).collect()
    }
    got = {
        (r["id"], r["poly_id"])
        for r in spatial_join_points_in_polygons(
            pts,
            POLYS,
            broadcast_cover=False,
            salt_factor="auto",
            salt_sample_fraction=0.5,
            salt_target_rows_per_key=10_000_000,
        ).collect()
    }
    assert got == ref
