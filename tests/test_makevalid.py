"""make_valid_ring: pinch decomposition of self-crossing rings."""

import numpy as np

from gdal_spark.kernels.geomops import make_valid_ring


def _area(r):
    return 0.5 * abs(float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])))


def test_bowtie_two_lobes():
    ring = np.array([[0, 0], [4, 4], [4, 0], [0, 4], [0, 0]], dtype=float)
    lobes = make_valid_ring(ring)
    assert len(lobes) == 2
    assert sorted(round(_area(r), 9) for r in lobes) == [4.0, 4.0]
    for r in lobes:  # simple + closed
        assert np.array_equal(r[0], r[-1])


def test_simple_ring_passthrough():
    ring = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)
    lobes = make_valid_ring(ring)
    assert len(lobes) == 1
    assert _area(lobes[0]) == 4.0


def test_asymmetric_bowtie():
    w, h = 10.0, 6.0
    ring = np.array([[0, 0], [w, h], [w, 0], [0, h], [0, 0]], dtype=float)
    lobes = make_valid_ring(ring)
    assert len(lobes) == 2
    assert abs(sum(_area(r) for r in lobes) - w * h / 2.0) < 1e-12


def test_double_bowtie_chain():
    """Two DISJOINT crossings along the walk (a twisted ribbon): the
    pinch pops a lobe at each crossing, remainder closes the third —
    the in-contract nested/disjoint pattern."""
    # ribbon 0..8 twisting at x=2 and x=6 (crossings at (2,1), (6,1))
    ring = np.array(
        [[0, 0], [4, 2], [8, 0], [8, 2], [4, 0], [0, 2], [0, 0]], dtype=float
    )
    lobes = make_valid_ring(ring)
    assert len(lobes) == 3
    total = sum(_area(r) for r in lobes)
    # each crossing at x=2/x=6, lobes: two side triangles (area 2) +
    # middle bowtie... verify via the exact even-odd area by pixel grid
    xs, ys = np.meshgrid(np.linspace(0.01, 7.99, 800), np.linspace(0.01, 1.99, 200))
    from gdal_spark.kernels.pip import points_in_polygon

    inside = points_in_polygon(xs.ravel(), ys.ravel(), [ring], include_boundary=False)
    approx = inside.mean() * 8.0 * 2.0
    assert abs(total - approx) < 0.1
