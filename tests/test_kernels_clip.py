"""Sutherland–Hodgman clip kernel edge cases."""

import numpy as np

from gdal_spark.kernels.clip import clip_convex, polygon_area, ring_area


def rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)


def test_partial_overlap():
    out = clip_convex(rect(0, 0, 10, 10), rect(5, 5, 15, 15))
    assert abs(abs(ring_area(out)) - 25.0) < 1e-12


def test_containment_both_ways():
    inner, outer = rect(2, 2, 4, 4), rect(0, 0, 10, 10)
    assert abs(abs(ring_area(clip_convex(inner, outer))) - 4.0) < 1e-12
    assert abs(abs(ring_area(clip_convex(outer, inner))) - 4.0) < 1e-12


def test_disjoint_is_empty():
    out = clip_convex(rect(0, 0, 1, 1), rect(5, 5, 6, 6))
    assert abs(ring_area(out)) == 0.0


def test_shared_edge_zero_area():
    out = clip_convex(rect(0, 0, 5, 5), rect(5, 0, 10, 5))
    assert abs(ring_area(out)) == 0.0


def test_triangle_vs_rect():
    tri = np.array([[0, 0], [10, 0], [0, 10], [0, 0]], dtype=float)
    out = clip_convex(tri, rect(0, 0, 5, 5))
    # triangle ∩ 5×5 square = square minus the cut corner triangle (2.5·2.5·... )
    # x+y<=10 cuts nothing inside the 5×5 square -> area 25? No: the
    # hypotenuse x+y=10 passes through (5,5) corner; square entirely inside.
    assert abs(abs(ring_area(out)) - 25.0) < 1e-9


def test_polygon_area_with_hole():
    outer = rect(0, 0, 10, 10)
    hole = rect(2, 2, 4, 4)
    assert abs(polygon_area([outer, hole]) - 96.0) < 1e-12
