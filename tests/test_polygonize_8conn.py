"""8-connected CROSS-TILE polygonize merge (reference
connectedness==8, alg/gdalrasterpolygonenumerator.cpp:75-167):
diagonal adjacency across shared tile edges and across tile corners.

Fixtures are staircases of corner-touching 2×2 squares: 4-connected
labeling sees 18 separate squares, 8-connected sees one region — and
the staircase is placed so the corner-touch falls exactly on a tile
corner (the hardest merge case) or on a mid-edge diagonal offset.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.kernels import wkb as W
from gdal_spark.operators.polygonize import polygonize_dissolved, polygonize_tiles
from gdal_spark.operators.rasterize import rasterize_wkb_grid

IDENTITY_GT = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def rect_wkb(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)
    return W.polygon_wkb([ring])


def staircase(x0, y0, k=18, dn=1.0):
    """k corner-touching 2×2 squares along the main diagonal."""
    return [
        (dn, rect_wkb(x0 + 2 * j, y0 + 2 * j, x0 + 2 * j + 2, y0 + 2 * j + 2))
        for j in range(k)
    ]


def test_staircase_across_tile_corner(spark):
    """Chain from (4,4): squares j=13 (pixels 30-31) and j=14 (32-33)
    touch ONLY at the shared tile corner (32,32) — the diagonal
    (tx,ty)↔(tx+1,ty+1) merge case."""
    feats = spark.createDataFrame(staircase(4, 4), "burn double, geom binary")
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    four = polygonize_tiles(tiles, nodata=0.0, connect8=False, tile_size=32).collect()
    assert len(four) == 18 and all(r["pixel_count"] == 4 for r in four)
    eight = polygonize_tiles(tiles, nodata=0.0, connect8=True, tile_size=32).collect()
    assert len(eight) == 1
    assert eight[0]["pixel_count"] == 72
    assert eight[0]["n_tiles"] == 2  # (0,0) and (1,1) only — pure corner hop


def test_staircase_mid_edge_diagonal(spark):
    """Chain from (4,10): crosses y=32 at a ±1-offset S|N run pair
    (j=10→11) and x=32 at a ±1-offset E|W run pair (j=13→14) — the
    relaxed-overlap merge cases, no tile-corner involvement."""
    feats = spark.createDataFrame(staircase(4, 10), "burn double, geom binary")
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    four = polygonize_tiles(tiles, nodata=0.0, connect8=False, tile_size=32).collect()
    assert len(four) == 18
    eight = polygonize_tiles(tiles, nodata=0.0, connect8=True, tile_size=32).collect()
    assert len(eight) == 1
    assert eight[0]["pixel_count"] == 72
    assert eight[0]["n_tiles"] == 3  # (0,0), (0,1), (1,1)


def test_anti_diagonal_corner(spark):
    """Two squares touching at (32,32) from the NE and SW quadrants —
    the (tx,ty)↔(tx-1,ty+1) anti-diagonal corner join."""
    feats = spark.createDataFrame(
        [(5.0, rect_wkb(32, 30, 34, 32)), (5.0, rect_wkb(30, 32, 32, 34))],
        "burn double, geom binary",
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    four = polygonize_tiles(tiles, nodata=0.0, connect8=False, tile_size=32).collect()
    assert len(four) == 2
    eight = polygonize_tiles(tiles, nodata=0.0, connect8=True, tile_size=32).collect()
    assert len(eight) == 1
    assert eight[0]["pixel_count"] == 8
    assert eight[0]["n_tiles"] == 2  # tiles (1,0) and (0,1)


def test_4conn_corner_runs_do_not_merge(spark):
    """Regression guard: two squares meeting at a tile corner whose
    border runs share an endpoint must NOT merge under 4-connectivity
    (the strict-overlap interval test)."""
    feats = spark.createDataFrame(
        [(9.0, rect_wkb(30, 30, 32, 32)), (9.0, rect_wkb(32, 32, 34, 34))],
        "burn double, geom binary",
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    four = polygonize_tiles(tiles, nodata=0.0, connect8=False, tile_size=32).collect()
    assert len(four) == 2


def test_dissolved_geometry_8conn(spark):
    """Dissolved geometry under 8-connectivity: one region whose
    exterior−holes area equals the pixel count exactly (the staircase
    pinches thread through the shared corners)."""
    feats = spark.createDataFrame(staircase(4, 4, k=18, dn=3.0), "burn double, geom binary")
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 128, 128, tile_size=32)
    rows = polygonize_dissolved(tiles, nodata=0.0, connect8=True, tile_size=32).collect()
    assert len(rows) == 1
    assert rows[0]["parea"] == 72.0
    assert rows[0]["dn"] == 3.0
