"""Independent absolute anchors for the geodesic kernels
(kernels/geodesy.py — Vincenty inverse + authalic-sphere excess, the
PROJ-free re-statement of get_GeodesicLength/get_GeodesicArea,
ogr/ogrlinestring.cpp:3224-3260).

The q161/q162 oracles are kernel replays (DuckDB has no geodesic
machinery); THESE anchors are the independent checks:
  - equator arcs are exactly a·Δλ (the equator is a geodesic of a
    circle of radius a);
  - meridian arcs against Gauss-Legendre quadrature of the meridian
    curvature integral (no Vincenty code shared);
  - densified lat-lon boxes against the CLOSED-FORM ellipsoidal band
    area from the authalic q-function.
"""

import numpy as np

from gdal_spark.kernels import geodesy as GD

A, F = GD.WGS84_A, GD.WGS84_F
E2 = F * (2 - F)


def _meridian_quadrature(phi_deg: float) -> float:
    x, w = np.polynomial.legendre.leggauss(200)
    half = np.radians(phi_deg) / 2
    phi = (x + 1) * half
    return float(np.sum(w * A * (1 - E2) / (1 - E2 * np.sin(phi) ** 2) ** 1.5) * half)


def _band_area_closed(p1, p2, l1, l2) -> float:
    e = np.sqrt(E2)

    def q(phi):
        s = np.sin(np.radians(phi))
        return (1 - E2) * (s / (1 - E2 * s * s) + np.arctanh(e * s) / e)

    return float(A * A / 2 * abs(q(p2) - q(p1)) * np.radians(l2 - l1))


def test_equator_arc_exact():
    d = float(GD.vincenty_inverse(0.0, 0.0, 0.0, 10.0))
    assert d == A * np.radians(10.0)


def test_meridian_arcs_vs_quadrature():
    for phi in (45.0, 90.0, 37.0):
        d = float(GD.vincenty_inverse(0.0, 12.0, phi, 12.0))
        assert abs(d - _meridian_quadrature(phi)) < 1e-5  # meters


def test_oblique_symmetry_and_triangle():
    d12 = float(GD.vincenty_inverse(10.0, 20.0, 45.0, 60.0))
    d21 = float(GD.vincenty_inverse(45.0, 60.0, 10.0, 20.0))
    assert abs(d12 - d21) < 1e-8
    # triangle inequality through a waypoint
    dm1 = float(GD.vincenty_inverse(10.0, 20.0, 30.0, 40.0))
    dm2 = float(GD.vincenty_inverse(30.0, 40.0, 45.0, 60.0))
    assert d12 <= dm1 + dm2 + 1e-6


def test_densified_box_area_vs_closed_form():
    for (p1, p2, l1, l2) in [(10.0, 20.0, 30.0, 40.0), (-35.0, -30.0, 100.0, 103.0)]:
        n = 400
        lats = np.concatenate([
            np.full(n, p1), np.linspace(p1, p2, n),
            np.full(n, p2), np.linspace(p2, p1, n),
        ])
        lons = np.concatenate([
            np.linspace(l1, l2, n), np.full(n, l2),
            np.linspace(l2, l1, n), np.full(n, l1),
        ])
        a_kernel = GD.geodesic_ring_area(lats, lons)
        a_closed = _band_area_closed(p1, p2, l1, l2)
        assert abs(a_kernel - a_closed) / a_closed < 1e-7


def test_authalic_radius_surface_area():
    # total ellipsoid surface = 4π·R_authalic² must equal the closed
    # form 2πa²(1 + (1−e²)/e · atanh(e))
    e = np.sqrt(E2)
    total = 2 * np.pi * A * A * (1 + (1 - E2) / e * np.arctanh(e))
    r = GD.authalic_radius()
    assert abs(4 * np.pi * r * r - total) / total < 1e-14
