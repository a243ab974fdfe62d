"""Ordered contour linestring export: exact vertex sequences for a
closed ring (interior rect) and an open polyline (rect clipped at the
raster border), against hand-derived marching-squares geometry."""

from __future__ import annotations

import numpy as np

from gdal_spark.kernels import wkb as W
from gdal_spark.operators.contour import contour_linestrings
from gdal_spark.operators.rasterize import rasterize_wkb_grid

IDENTITY_GT = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def rect_wkb(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)
    return W.polygon_wkb([ring])


def _lines(spark, rects):
    feats = spark.createDataFrame(rects, "burn double, geom binary")
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 64, 64, tile_size=32)
    return contour_linestrings(tiles, 1.0, 32, 64, 64).collect()


def test_closed_ring_exact_sequence(spark):
    """Rect [10,16)×[10,14) burned 2.0, level 1.0: ring crosses all
    pixel edges at t=0.5.  Walk: start (9.5,10) (lexicographic min),
    down the left side, bottom L→R, up the right, top R→L, close."""
    rows = _lines(spark, [(2.0, rect_wkb(10, 10, 16, 14))])
    assert len(rows) == 1
    r = rows[0]
    assert r["closed"] is True
    assert r["n_pts"] == 20  # 2w + 2h = 12 + 8
    assert r["length_u"] == 16 * 1000000 + 4 * 707107
    expected = (
        [(9.5, float(y)) for y in (10, 11, 12, 13)]
        + [(float(x), 13.5) for x in range(10, 16)]
        + [(15.5, float(y)) for y in (13, 12, 11, 10)]
        + [(float(x), 9.5) for x in range(15, 9, -1)]
    )
    pts = W.parse_wkb(bytes(r["wkb"]))[1]
    assert pts.shape[0] == 21  # closed: start repeated
    assert [tuple(p) for p in pts[:-1]] == expected
    assert tuple(pts[-1]) == expected[0]
    assert r["sx"] == 19 and r["sy"] == 20
    assert r["vsum_x"] == sum((i + 1) * int(2 * p[0]) for i, p in enumerate(expected))
    assert r["vsum_y"] == sum((i + 1) * int(2 * p[1]) for i, p in enumerate(expected))


def test_open_polyline_at_border(spark):
    """Rect [0,5)×[10,14): the iso-line is clipped by the raster edge —
    an open polyline from (0,9.5) around the rect to (0,13.5)."""
    rows = _lines(spark, [(2.0, rect_wkb(0, 10, 5, 14))])
    assert len(rows) == 1
    r = rows[0]
    assert r["closed"] is False
    assert r["n_pts"] == 14
    assert r["length_u"] == 11 * 1000000 + 2 * 707107
    pts = W.parse_wkb(bytes(r["wkb"]))[1]
    expected = (
        [(float(x), 9.5) for x in range(0, 5)]
        + [(4.5, float(y)) for y in (10, 11, 12, 13)]
        + [(float(x), 13.5) for x in range(4, -1, -1)]
    )
    assert [tuple(p) for p in pts] == expected


def test_two_components(spark):
    """Two disjoint rects → two rings, identified by start point."""
    rows = _lines(
        spark, [(2.0, rect_wkb(4, 4, 8, 8)), (2.0, rect_wkb(40, 40, 50, 45))]
    )
    by_start = {(r["sx"], r["sy"]): r for r in rows}
    assert len(by_start) == 2
    small = by_start[(7, 8)]     # (3.5, 4)
    big = by_start[(79, 80)]     # (39.5, 40)
    assert small["n_pts"] == 16 and small["closed"]
    assert big["n_pts"] == 30 and big["closed"]
