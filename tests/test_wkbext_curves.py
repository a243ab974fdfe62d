"""Curve/Z/M WKB extension (kernels/wkbext.py): parse, linearize
convergence, compound curves."""

import math

import numpy as np

from gdal_spark.kernels import wkb as W
from gdal_spark.kernels import wkbext as X


def _area(ring):
    return 0.5 * abs(
        float(np.sum(ring[:-1, 0] * ring[1:, 1] - ring[1:, 0] * ring[:-1, 1]))
    )


def test_zm_parse_all_flavors():
    coords = np.array([[0, 0, 5], [10, 0, 7]], float)
    n, zs, ms = X.zm_stats(X.linestring_zm_wkb(coords, flavor=1))
    assert (n, zs, ms) == (2, 12.0, None)
    n, zs, ms = X.zm_stats(X.linestring_zm_wkb(coords, flavor=2))
    assert (n, zs, ms) == (2, None, 12.0)
    c4 = np.array([[0, 0, 5, 100], [10, 0, 7, 200]], float)
    n, zs, ms = X.zm_stats(X.linestring_zm_wkb(c4, flavor=3))
    assert (n, zs, ms) == (2, 12.0, 300.0)


def test_circle_linearize_converges_to_pi_r2():
    R = 3.0
    cs = X.circularstring_wkb(
        np.array([[R, 0], [0, R], [-R, 0], [0, -R], [R, 0]], float)
    )
    poly = X.curvepolygon_wkb([cs])
    prev = 0.0
    for ang in (90.0, 30.0, 5.0, 1.0):
        ring = W.parse_wkb(X.linearize_wkb(poly, ang))[1][0]
        a = _area(ring)
        assert a > prev  # inscribed polygon area is increasing
        prev = a
    assert abs(prev - math.pi * R * R) < 5e-3


def test_defining_points_kept_verbatim():
    cs = X.circularstring_wkb(
        np.array([[13, 20], [10, 23], [7, 20]], float)  # half arc
    )
    pts = W.parse_wkb(X.linearize_wkb(cs, 90.0))[1]
    assert pts.tolist() == [[13, 20], [10, 23], [7, 20]]


def test_compound_curve():
    """CompoundCurve = straight segment + half arc, chained without
    duplicate joints."""
    seg = W.linestring_wkb(np.array([[0.0, 0.0], [13.0, 20.0]]))
    # strip header reuse: build compound manually
    import struct

    arc = X.circularstring_wkb(np.array([[13, 20], [10, 23], [7, 20]], float))
    cc = struct.pack("<BII", 1, X.COMPOUNDCURVE, 2) + seg + arc
    pts = W.parse_wkb(X.linearize_wkb(cc, 90.0))[1]
    assert pts.tolist() == [[0, 0], [13, 20], [10, 23], [7, 20]]


def test_collinear_arc_degrades_to_segments():
    cs = X.circularstring_wkb(np.array([[0, 0], [5, 5], [10, 10]], float))
    pts = W.parse_wkb(X.linearize_wkb(cs, 10.0))[1]
    assert pts.tolist() == [[0, 0], [5, 5], [10, 10]]
