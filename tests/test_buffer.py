"""ST_Buffer (convex Minkowski sum): round-style area equals the
closed form A + P·d + area(4q-gon), converging to A + P·d + πd²."""

import numpy as np

from gdal_spark.kernels.geomops import buffer_structuring, minkowski_sum_convex


def _area(ring):
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    return 0.5 * float(np.sum(x0 * y1 - x1 * y0))


def test_round_buffer_area_closed_form():
    rect = np.array([[0, 0], [10, 0], [10, 4], [0, 4], [0, 0]], dtype=float)
    d, A, P = 2.0, 40.0, 28.0
    for q in (2, 4, 8, 32):
        k = 4 * q
        ring = minkowski_sum_convex(rect, buffer_structuring(d, "round", q))
        expect = A + P * d + 0.5 * k * d * d * np.sin(2 * np.pi / k)
        assert abs(_area(ring) - expect) < 1e-9
        assert ring.shape[0] == 4 + k + 1  # rect corners fan out into arcs
    # quadsegs -> inf converges to the true Euclidean buffer area
    ring = minkowski_sum_convex(rect, buffer_structuring(d, "round", 256))
    assert abs(_area(ring) - (A + P * d + np.pi * d * d)) < 1e-3


def test_point_buffer_is_structuring_element():
    from gdal_spark.kernels import wkb as W
    from gdal_spark.kernels.geomops import convex_hull

    pt = np.array([[5.0, 7.0]])
    hull = convex_hull(np.vstack([pt, pt]))  # degenerate: single point
    assert hull.shape[0] >= 1


def test_diamond_octagon_vertices():
    rect = np.array([[0, 0], [6, 0], [6, 6], [0, 6], [0, 0]], dtype=float)
    ring = minkowski_sum_convex(rect, buffer_structuring(3.0, "diamond"))
    assert ring.shape[0] == 9
    assert _area(ring) == 36.0 + 24.0 * 3.0 + 2.0 * 9.0
