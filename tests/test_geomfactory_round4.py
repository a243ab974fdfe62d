"""Round-4 geometry-factory surfaces: organizePolygons nesting,
WRAPDATELINE piece structure, line-vs-polygon predicates — unit-level
edge cases beyond the q175/q176/q186 fixture classes."""

import numpy as np
import pandas as pd

from gdal_spark.kernels.geomops import organize_rings
from gdal_spark.kernels import wkb as W


def _rect(x0, y0, w, h):
    return np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
        dtype=np.float64,
    )


def test_organize_five_level_nesting():
    rings = [
        _rect(0, 0, 100, 100),   # depth 0 shell
        _rect(10, 10, 80, 80),   # depth 1 hole
        _rect(20, 20, 60, 60),   # depth 2 shell (island)
        _rect(30, 30, 40, 40),   # depth 3 hole (parent = island)
        _rect(40, 40, 20, 20),   # depth 4 shell
    ]
    out = organize_rings(rings)
    assert out == [
        (0, -1, "shell"), (1, 0, "hole"), (2, -1, "shell"),
        (3, 2, "hole"), (4, -1, "shell"),
    ]


def test_organize_hole_picks_smallest_shell():
    rings = [
        _rect(0, 0, 100, 100),   # big shell
        _rect(10, 10, 30, 30),   # small shell INSIDE the big one? no —
    ]
    # two disjoint shells, hole inside the smaller one: parent must be
    # the SMALLEST even-depth container, not just any
    rings = [
        _rect(0, 0, 100, 100),
        _rect(200, 0, 50, 50),
        _rect(210, 10, 10, 10),  # hole in the 50x50 shell
    ]
    out = organize_rings(rings)
    assert out[2] == (2, 1, "hole")


def test_wrapdateline_non_crossing_single_piece(spark):
    from gdal_spark.functions.st import st_wrapdateline

    ring = _rect(170, 0, 5, 5)  # entirely west of 180
    out = st_wrapdateline.func(pd.Series([W.polygon_wkb([ring])]))
    gtype, parts = W.parse_wkb(bytes(out[0]))
    assert gtype == W.MULTIPOLYGON and len(parts) == 1


def test_wrapdateline_touching_meridian_single_piece(spark):
    from gdal_spark.functions.st import st_wrapdateline

    ring = _rect(175, 0, 5, 5)  # right edge exactly ON 180
    out = st_wrapdateline.func(pd.Series([W.polygon_wkb([ring])]))
    gtype, parts = W.parse_wkb(bytes(out[0]))
    assert gtype == W.MULTIPOLYGON and len(parts) == 1


def test_line_relation_diagonal_corner_touch():
    from gdal_spark.functions.st import st_line_relation

    poly = W.polygon_wkb([_rect(0, 0, 10, 8)])
    # touches exactly at the (10, 8) corner from outside
    line = W.linestring_wkb(np.array([[10.0, 8.0], [14.0, 12.0]]))
    out = st_line_relation.func(pd.Series([line]), pd.Series([poly]))
    assert out[0] == "touches"
    # passes through two corners diagonally — interior part exists
    line2 = W.linestring_wkb(np.array([[-2.0, -2.0], [12.0, 12.0]]))
    out2 = st_line_relation.func(pd.Series([line2]), pd.Series([poly]))
    assert out2[0] == "crosses"
