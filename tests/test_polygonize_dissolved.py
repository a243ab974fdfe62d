"""Cross-tile dissolved polygonize: hole handling and multi-tile
stitching beyond what the rect oracle (q52) covers."""

from __future__ import annotations

import numpy as np

from gdal_spark.kernels import wkb as W
from gdal_spark.operators.polygonize import polygonize_dissolved
from gdal_spark.operators.rasterize import rasterize_wkb_grid

IDENTITY_GT = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def rect_wkb(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)
    return W.polygon_wkb([ring])


def test_donut_region_across_tiles(spark):
    """A 50×50 region spanning 2×2 tiles with a 12×12 hole (a second
    region burned inside it): the dissolve must emit an exterior +
    hole ring pair and the exact areas/perimeters."""
    feats = spark.createDataFrame(
        [(1.0, rect_wkb(10, 10, 60, 60)), (2.0, rect_wkb(30, 30, 42, 42))],
        "burn double, geom binary",
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    out = {
        int(r["dn"]): r
        for r in polygonize_dissolved(tiles, nodata=0.0, tile_size=32).collect()
    }
    donut, inner = out[1], out[2]
    assert donut["n_rings"] == 2
    assert donut["parea"] == 50 * 50 - 12 * 12
    assert donut["perim"] == 4 * 50  # exterior ring only
    assert inner["n_rings"] == 1
    assert inner["parea"] == 12 * 12
    assert inner["perim"] == 4 * 12
    # the WKB round-trips with both rings
    polys = W.polygon_rings(bytes(donut["wkb"]))
    assert len(polys[0]) == 2


def test_l_shape_across_four_tiles(spark):
    """An L-shaped region (two overlapping rects, same DN) spanning
    4 tiles dissolves to one 6-corner ring."""
    feats = spark.createDataFrame(
        [(7.0, rect_wkb(20, 20, 70, 40)), (7.0, rect_wkb(20, 20, 40, 70))],
        "burn double, geom binary",
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    rows = polygonize_dissolved(tiles, nodata=0.0, tile_size=32).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_rings"] == 1
    assert r["parea"] == 50 * 20 + 50 * 20 - 20 * 20
    ring = W.polygon_rings(bytes(r["wkb"]))[0][0]
    assert ring.shape[0] == 7  # 6 corners + closure
