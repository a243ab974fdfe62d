"""Filled contour polygons: nesting depth 2 (island inside a hole)."""

import numpy as np

from gdal_spark.kernels import wkb as W
from gdal_spark.operators.contour import contour_polygons
from gdal_spark.operators.rasterize import rasterize_wkb_grid

IDENTITY_GT = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def rect_wkb(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)
    return W.polygon_wkb([ring])


def test_island_in_hole(spark):
    feats = spark.createDataFrame(
        [
            (2.0, rect_wkb(10, 10, 40, 40)),   # plateau above level
            (0.0, rect_wkb(15, 15, 35, 35)),   # hole dips below
            (2.0, rect_wkb(20, 20, 30, 30)),   # island rises again
        ],
        "burn double, geom binary",
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 64, 64, tile_size=32)
    rows = {
        (r["sx"], r["sy"]): r
        for r in contour_polygons(tiles, 1.0, 32, 64, 64).collect()
    }
    assert len(rows) == 2
    big = rows[(19, 20)]       # exterior ring starts at (9.5, 10)
    island = rows[(39, 40)]    # island ring starts at (19.5, 20)
    assert big["n_rings"] == 2
    assert big["parea"] == (30 * 30 - 0.5) - (20 * 20 - 0.5)
    assert island["n_rings"] == 1
    assert island["parea"] == 10 * 10 - 0.5
    # WKB carries exterior + hole
    assert len(W.polygon_rings(bytes(big["wkb"]))[0]) == 2


def test_border_clipped_region_closes_along_hull(spark):
    """Rect touching the left raster edge: the open iso-line closes
    straight along x=0 — area 4.5×4 minus the two cut right corners."""
    feats = spark.createDataFrame(
        [(2.0, rect_wkb(0, 10, 5, 14))], "burn double, geom binary"
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 64, 64, tile_size=32)
    rows = contour_polygons(tiles, 1.0, 32, 64, 64).collect()
    assert len(rows) == 1
    assert rows[0]["n_rings"] == 1
    assert rows[0]["parea"] == 4.5 * 4 - 2 * 0.125


def test_corner_region_inserts_hull_corner(spark):
    """Rect at the raster origin: the closure path must thread the
    (0,0) hull corner — area 4.5² minus one cut corner."""
    feats = spark.createDataFrame(
        [(2.0, rect_wkb(0, 0, 5, 5))], "burn double, geom binary"
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 64, 64, tile_size=32)
    rows = contour_polygons(tiles, 1.0, 32, 64, 64).collect()
    assert len(rows) == 1
    assert rows[0]["parea"] == 4.5 * 4.5 - 0.125
    ring = W.polygon_rings(bytes(rows[0]["wkb"]))[0][0]
    assert [0.0, 0.0] in ring.tolist()
