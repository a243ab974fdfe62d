"""Rasterize kernel vs ported golden fixtures (FIXTURES.md §4,
reference autotest/alg/rasterize.py:26-80): burn a polygon + line into
a 100×100 uint8 grid, assert checksum 6452 and the dtype clamps."""

import numpy as np

from gdal_spark.kernels.burn import (
    burn_line,
    burn_points,
    burn_polygon,
    copy_word,
    world_to_pixel,
)
from gdal_spark.kernels.checksum import checksum_image
from gdal_spark.kernels.wkb import parse_wkb, wkt_to_wkb

GT = (1000.0, 1.0, 0.0, 1100.0, 0.0, -1.0)
POLY_WKT = "POLYGON((1020 1030,1020 1045,1050 1045,1050 1030,1020 1030))"
LINE_WKT = "LINESTRING(1000 1000, 1100 1050)"


def _burn_band(value: float) -> np.ndarray:
    arr = np.zeros((100, 100), dtype=np.uint8)
    _, rings = parse_wkb(wkt_to_wkb(POLY_WKT))
    parts = []
    for ring in rings:
        px, py = world_to_pixel(ring[:, 0], ring[:, 1], GT)
        parts.append(np.column_stack([px, py]))
    burn_polygon(arr, parts, value)
    _, coords = parse_wkb(wkt_to_wkb(LINE_WKT))
    lx, ly = world_to_pixel(coords[:, 0], coords[:, 1], GT)
    burn_line(arr, lx, ly, value)
    return arr


def test_rasterize_1_checksum_6452():
    band2 = _burn_band(220.0)
    assert checksum_image(band2) == 6452


def test_rasterize_1_clamps():
    band3 = _burn_band(256.0)
    assert band3.max() == 255  # rasterize.py:79 (burn 256 clamps)
    band1 = _burn_band(-1.0)
    assert band1.min() == 0 and band1.max() == 0  # -1 clamps to 0 on uint8


def test_copy_word_rounding():
    v = np.array([-1.0, 0.4, 0.5, 254.5, 256.0, 219.7])
    assert copy_word(v, np.uint8).tolist() == [0, 0, 1, 255, 255, 220]


def test_merge_add_polygon_overlap():
    # Two overlapping squares, ADD mode: overlap = 2×value.
    arr = np.zeros((20, 20), dtype=np.int32)
    sq1 = [np.array([[2.0, 2.0], [10.0, 2.0], [10.0, 10.0], [2.0, 10.0], [2.0, 2.0]])]
    sq2 = [np.array([[6.0, 6.0], [14.0, 6.0], [14.0, 14.0], [6.0, 14.0], [6.0, 6.0]])]
    burn_polygon(arr, sq1, 5, merge_add=True)
    burn_polygon(arr, sq2, 5, merge_add=True)
    assert arr[8, 8] == 10  # overlap
    assert arr[3, 3] == 5 and arr[12, 12] == 5
    assert arr[0, 0] == 0


def test_point_burn_bounds_and_add():
    arr = np.zeros((4, 4), dtype=np.uint8)
    xs = np.array([0.5, 0.9, 3.99, 4.0, -0.1])
    ys = np.array([0.5, 0.2, 3.0, 1.0, 1.0])
    burn_points(arr, xs, ys, 7, merge_add=True)
    assert arr[0, 0] == 14  # two points in pixel (0,0)
    assert arr[3, 3] == 7
    assert arr.sum() == 21  # out-of-bounds ignored
