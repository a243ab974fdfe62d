"""Independent anchors for the Vincenty DIRECT solver (q420).

The direct problem is anchored three ways, none of which reuse the
direct code path itself: exact equator arcs, meridian arcs against
Gauss-Legendre quadrature of the meridian-arc integrand, and the
direct<->inverse round trip over an azimuth/distance grid (the
inverse is independently anchored in tests/test_geodesic.py)."""

import numpy as np

from gdal_spark.kernels import geodesy as GD

A = GD.WGS84_A
F = GD.WGS84_F
E2 = F * (2 - F)


def _meridian_quadrature(phi_deg: float) -> float:
    x, w = np.polynomial.legendre.leggauss(200)
    half = np.radians(phi_deg) / 2
    phi = (x + 1) * half
    return float(
        np.sum(w * A * (1 - E2) / (1 - E2 * np.sin(phi) ** 2) ** 1.5) * half
    )


def test_equator_due_east_exact():
    # the equator is a geodesic of radius a: arc s -> dlon = s / a
    for deg in (1.0, 10.0, 89.0):
        s = A * np.radians(deg)
        lat2, lon2, _ = GD.vincenty_direct(0.0, 5.0, 90.0, s)
        assert abs(float(lat2) - 0.0) < 1e-12
        assert abs(float(lon2) - (5.0 + deg)) < 1e-9


def test_meridian_due_north_vs_quadrature():
    for phi in (37.0, 45.0, 80.0):
        s = _meridian_quadrature(phi)
        lat2, lon2, _ = GD.vincenty_direct(0.0, 12.0, 0.0, s)
        assert abs(float(lat2) - phi) < 1e-9
        assert abs(float(lon2) - 12.0) < 1e-12


def test_direct_inverse_roundtrip_grid():
    worst = 0.0
    for k in range(120):
        lat1 = ((k * 83) % 140) - 70.0
        lon1 = ((k * 61) % 300) - 160.0
        azi = ((k * 137) % 360) - 180.0 + 0.25
        s = 1000.0 * (10 + (k * 397) % 17000)
        lat2, lon2, _ = GD.vincenty_direct(lat1, lon1, azi, s)
        s2 = float(GD.vincenty_inverse(lat1, lon1, float(lat2), float(lon2)))
        worst = max(worst, abs(s2 - s))
    assert worst < 1e-3  # sub-mm round trip everywhere on the grid


def test_direct_long_distance_no_fallback_needed():
    # distances approaching (but not crossing) antipodal: the direct
    # iteration is a contraction and must converge without a fallback.
    # The ROUND-TRIP check only holds outside the inverse's antipodal
    # band (the bisection fallback there has its own km-scale oblique
    # error, a documented inverse residual — NOT a direct-path bug);
    # inside the band the direct path is checked by geodesic-flow
    # COMPOSITION instead (two half-arcs land on the full-arc point).
    for sfrac in (0.45, 0.49):
        s = 2 * np.pi * A * sfrac
        lat2, lon2, _ = GD.vincenty_direct(10.0, 20.0, 30.0, s)
        s2 = float(GD.vincenty_inverse(10.0, 20.0, float(lat2), float(lon2)))
        assert abs(s2 - s) < 2e-3
    for sfrac in (0.499, 0.4999):
        s = 2 * np.pi * A * sfrac
        lat2, lon2, _ = GD.vincenty_direct(10.0, 20.0, 30.0, s)
        latm, lonm, azim = GD.vincenty_direct(10.0, 20.0, 30.0, s / 2)
        lat2b, lon2b, _ = GD.vincenty_direct(
            float(latm), float(lonm), float(azim), s / 2
        )
        assert abs(float(lat2b) - float(lat2)) < 1e-9
        assert abs(float(lon2b) - float(lon2)) < 1e-9


def test_azimuth_symmetry_reverse():
    # going forward then taking the reverse azimuth returns home
    lat1, lon1, azi, s = 35.0, -100.0, 70.0, 4_000_000.0
    lat2, lon2, azi2 = GD.vincenty_direct(lat1, lon1, azi, s)
    lat3, lon3, _ = GD.vincenty_direct(
        float(lat2), float(lon2), float(azi2) + 180.0, s
    )
    assert abs(float(lat3) - lat1) < 1e-9
    assert abs(float(lon3) - lon1) < 1e-9
