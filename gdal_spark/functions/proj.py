"""General coordinate transforms as pure Spark Column expressions —
no PROJ, no Python in the hot path.

Reference surface: OGRCoordinateTransformation (ogr/ogrct.cpp:665,850)
delegates to PROJ for arbitrary CRS; the overwhelming majority of real
requests are WGS84 ↔ UTM / Lambert conformal conic / WebMercator.
This module covers those with published closed-form series:

- Transverse Mercator (UTM): Karney 2011 ("Transverse Mercator with an
  accuracy of a few nanometers") Krüger series to n⁶ — sub-micrometer
  forward/inverse accuracy over every UTM zone.
- Lambert conformal conic (2SP): Snyder 1987 (USGS PP 1395) formulas
  with a fixed-point inverse latitude (unrolled — column expressions
  cannot loop; 8 steps reach double precision).

Everything is built from pyspark.sql.functions trig/hyperbolic
builtins, so the projection runs inside whole-stage codegen at
10^12-row scale — the same reason the text functions avoid UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_E2 = WGS84_F * (2.0 - WGS84_F)
_E = math.sqrt(_E2)
_N = WGS84_F / (2.0 - WGS84_F)

# Karney 2011 series coefficients (published), evaluated at WGS84 n.
_A_CAP = (
    WGS84_A / (1.0 + _N)
    * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)
)
_ALPHA = [
    _N / 2.0 - 2.0 / 3.0 * _N**2 + 5.0 / 16.0 * _N**3 + 41.0 / 180.0 * _N**4
    - 127.0 / 288.0 * _N**5 + 7891.0 / 37800.0 * _N**6,
    13.0 / 48.0 * _N**2 - 3.0 / 5.0 * _N**3 + 557.0 / 1440.0 * _N**4
    + 281.0 / 630.0 * _N**5 - 1983433.0 / 1935360.0 * _N**6,
    61.0 / 240.0 * _N**3 - 103.0 / 140.0 * _N**4 + 15061.0 / 26880.0 * _N**5
    + 167603.0 / 181440.0 * _N**6,
    49561.0 / 161280.0 * _N**4 - 179.0 / 168.0 * _N**5
    + 6601661.0 / 7257600.0 * _N**6,
    34729.0 / 80640.0 * _N**5 - 3418889.0 / 1995840.0 * _N**6,
    212378941.0 / 319334400.0 * _N**6,
]
_BETA = [
    _N / 2.0 - 2.0 / 3.0 * _N**2 + 37.0 / 96.0 * _N**3 - 1.0 / 360.0 * _N**4
    - 81.0 / 512.0 * _N**5 + 96199.0 / 604800.0 * _N**6,
    1.0 / 48.0 * _N**2 + 1.0 / 15.0 * _N**3 - 437.0 / 1440.0 * _N**4
    + 46.0 / 105.0 * _N**5 - 1118711.0 / 3870720.0 * _N**6,
    17.0 / 480.0 * _N**3 - 37.0 / 840.0 * _N**4 - 209.0 / 4480.0 * _N**5
    + 5569.0 / 90720.0 * _N**6,
    4397.0 / 161280.0 * _N**4 - 11.0 / 504.0 * _N**5
    - 830251.0 / 7257600.0 * _N**6,
    4583.0 / 161280.0 * _N**5 - 108847.0 / 3991680.0 * _N**6,
    20648693.0 / 638668800.0 * _N**6,
]

UTM_K0 = 0.9996
UTM_FE = 500000.0
UTM_FN_SOUTH = 10000000.0

_D2R = math.pi / 180.0


def utm_zone(lon: Column) -> Column:
    """Standard zone number 1..60 from longitude."""
    return (F.floor((lon + 180.0) / 6.0) % 60 + 1).cast("int")


def lonlat_to_utm(lon: Column, lat: Column, zone: Column | int):
    """→ (easting, northing) in the given UTM zone (northern-hemisphere
    false northing applies when lat < 0).  Karney forward series."""
    lon0 = (
        (F.lit(zone) if isinstance(zone, int) else zone.cast("double")) * 6.0
        - 183.0
    )
    phi = lat * _D2R
    dlam = (lon - lon0) * _D2R
    sphi = F.sin(phi)
    # conformal latitude: t = sinh(atanh(sin φ) − e·atanh(e·sin φ))
    t = F.sinh(F.atanh(sphi) - _E * F.atanh(F.lit(_E) * sphi))
    xi_p = F.atan2(t, F.cos(dlam))
    eta_p = F.asinh(F.sin(dlam) / F.sqrt(t * t + F.cos(dlam) * F.cos(dlam)))
    xi = xi_p
    eta = eta_p
    for j, a in enumerate(_ALPHA, start=1):
        xi = xi + a * F.sin(2.0 * j * xi_p) * F.cosh(2.0 * j * eta_p)
        eta = eta + a * F.cos(2.0 * j * xi_p) * F.sinh(2.0 * j * eta_p)
    easting = F.lit(UTM_FE) + UTM_K0 * _A_CAP * eta
    northing = UTM_K0 * _A_CAP * xi + F.when(
        lat < 0, F.lit(UTM_FN_SOUTH)
    ).otherwise(F.lit(0.0))
    return easting, northing


def utm_to_lonlat(e: Column, n: Column, zone: Column | int, south: Column):
    """Inverse Karney series → (lon, lat) degrees."""
    lon0 = (
        (F.lit(zone) if isinstance(zone, int) else zone.cast("double")) * 6.0
        - 183.0
    )
    n_adj = n - F.when(south, F.lit(UTM_FN_SOUTH)).otherwise(F.lit(0.0))
    xi = n_adj / (UTM_K0 * _A_CAP)
    eta = (e - UTM_FE) / (UTM_K0 * _A_CAP)
    xi_p = xi
    eta_p = eta
    for j, b in enumerate(_BETA, start=1):
        xi_p = xi_p - b * F.sin(2.0 * j * xi) * F.cosh(2.0 * j * eta)
        eta_p = eta_p - b * F.cos(2.0 * j * xi) * F.sinh(2.0 * j * eta)
    t = F.sin(xi_p) / F.sqrt(F.sinh(eta_p) * F.sinh(eta_p) + F.cos(xi_p) * F.cos(xi_p))
    dlam = F.atan2(F.sinh(eta_p), F.cos(xi_p))
    # inverse conformal latitude: s = tanh(asinh(t) + e·atanh(e·s)),
    # fixed point unrolled (column expressions cannot loop)
    psi = F.asinh(t)
    s = F.tanh(psi)
    for _ in range(8):
        s = F.tanh(psi + _E * F.atanh(F.lit(_E) * s))
    lat = F.asin(s) / _D2R
    lon = lon0 + dlam / _D2R
    return lon, lat


# --- Lambert conformal conic (2SP, Snyder 1987 eqs. 15-1..15-11) ----------


def _lcc_consts(phi1_deg: float, phi2_deg: float, phi0_deg: float, lam0_deg: float):
    def m(phi):
        return math.cos(phi) / math.sqrt(1.0 - _E2 * math.sin(phi) ** 2)

    def tfn(phi):
        return math.tan(math.pi / 4.0 - phi / 2.0) / (
            (1.0 - _E * math.sin(phi)) / (1.0 + _E * math.sin(phi))
        ) ** (_E / 2.0)

    p1, p2, p0 = (math.radians(v) for v in (phi1_deg, phi2_deg, phi0_deg))
    nL = (math.log(m(p1)) - math.log(m(p2))) / (
        math.log(tfn(p1)) - math.log(tfn(p2))
    )
    Fc = m(p1) / (nL * tfn(p1) ** nL)
    rho0 = WGS84_A * Fc * tfn(p0) ** nL
    return nL, Fc, rho0, math.radians(lam0_deg)


def lonlat_to_lcc(
    lon: Column, lat: Column,
    phi1: float, phi2: float, phi0: float, lam0: float,
):
    nL, Fc, rho0, l0 = _lcc_consts(phi1, phi2, phi0, lam0)
    phi = lat * _D2R
    sphi = F.sin(phi)
    t = F.tan(math.pi / 4.0 - phi / 2.0) / F.pow(
        (1.0 - _E * sphi) / (1.0 + _E * sphi), _E / 2.0
    )
    rho = WGS84_A * Fc * F.pow(t, F.lit(nL))
    theta = nL * (lon * _D2R - l0)
    return rho * F.sin(theta), rho0 - rho * F.cos(theta)


def lcc_to_lonlat(
    x: Column, y: Column,
    phi1: float, phi2: float, phi0: float, lam0: float,
):
    nL, Fc, rho0, l0 = _lcc_consts(phi1, phi2, phi0, lam0)
    sgn = 1.0 if nL >= 0 else -1.0
    rho = sgn * F.sqrt(x * x + (rho0 - y) * (rho0 - y))
    theta = F.atan2(sgn * x, sgn * (rho0 - y))
    t = F.pow(rho / (WGS84_A * Fc), F.lit(1.0 / nL))
    lon = (theta / nL + l0) / _D2R
    # φ = π/2 − 2·atan(t·((1−e·sinφ)/(1+e·sinφ))^(e/2)), unrolled
    phi = math.pi / 2.0 - 2.0 * F.atan(t)
    for _ in range(8):
        phi = math.pi / 2.0 - 2.0 * F.atan(
            t * F.pow((1.0 - _E * F.sin(phi)) / (1.0 + _E * F.sin(phi)), _E / 2.0)
        )
    return lon, phi / _D2R


# --- ECEF + 7-parameter Helmert datum shift ---------------------------------
# Reference surface: OGRCoordinateTransformation datum pipelines
# (ogr/ogrct.cpp:665 — PROJ handles Helmert via +towgs84 / EPSG 9606).
# The position-vector 7-parameter transform is closed-form, so unlike
# grid-shift pipelines it needs no PROJ: geodetic → ECEF → T+(1+s)RX →
# geodetic, every step a Column expression inside codegen.


def geodetic_to_ecef(lon: Column, lat: Column, h: Column,
                     a: float = WGS84_A, f: float = WGS84_F):
    """(deg, deg, m) → ECEF (X, Y, Z) on the given ellipsoid."""
    e2 = f * (2.0 - f)
    phi, lam = lat * _D2R, lon * _D2R
    sphi, cphi = F.sin(phi), F.cos(phi)
    N = a / F.sqrt(1.0 - e2 * sphi * sphi)
    X = (N + h) * cphi * F.cos(lam)
    Y = (N + h) * cphi * F.sin(lam)
    Z = (N * (1.0 - e2) + h) * sphi
    return X, Y, Z


def ecef_to_geodetic(X: Column, Y: Column, Z: Column,
                     a: float = WGS84_A, f: float = WGS84_F):
    """ECEF → (lon, lat, h): Bowring's one-shot latitude (1976) plus
    TWO fixed-point refinements.  Column trees cannot loop and naive
    unrolling embeds the whole previous tree ~5× per step (8 steps
    OOM'd Janino codegen) — Bowring starts ~1e-9 rad from the root, so
    two refinements reach < 1e-12 rad / sub-μm h with a tree of only
    ~25 Bowring-size nodes."""
    e2 = f * (2.0 - f)
    b = a * (1.0 - f)
    ep2 = (a * a - b * b) / (b * b)
    p = F.sqrt(X * X + Y * Y)
    lam = F.atan2(Y, X)
    theta = F.atan2(Z * a, p * b)
    st, ct = F.sin(theta), F.cos(theta)
    phi = F.atan2(Z + ep2 * b * st * st * st, p - e2 * a * ct * ct * ct)
    for _ in range(2):
        sphi = F.sin(phi)
        N = a / F.sqrt(1.0 - e2 * sphi * sphi)
        h = p / F.cos(phi) - N
        phi = F.atan2(Z, p * (1.0 - e2 * N / (N + h)))
    sphi = F.sin(phi)
    N = a / F.sqrt(1.0 - e2 * sphi * sphi)
    h = p / F.cos(phi) - N
    return lam / _D2R, phi / _D2R, h


def helmert7(X: Column, Y: Column, Z: Column, params: tuple[float, ...]):
    """Position-vector 7-parameter Helmert (EPSG 9606):
    X' = T + (1+s)·R·X with the small-angle rotation matrix
    [[1, −rz, ry], [rz, 1, −rx], [−ry, rx, 1]].
    ``params`` = (tx, ty, tz, rx, ry, rz, s) in meters / radians /
    unitless (callers convert arc-seconds and ppm)."""
    tx, ty, tz, rx, ry, rz, s = params
    m = 1.0 + s
    Xn = tx + m * (X - rz * Y + ry * Z)
    Yn = ty + m * (rz * X + Y - rx * Z)
    Zn = tz + m * (-ry * X + rx * Y + Z)
    return Xn, Yn, Zn


def helmert7_inverse(X: Column, Y: Column, Z: Column, params: tuple[float, ...]):
    """EXACT algebraic inverse of `helmert7` (not the negated-sign
    approximation): X = R⁻¹ (X'−T) / (1+s), with the closed-form
    inverse of the small-angle matrix (det = 1 + rx² + ry² + rz²,
    adjugate entries below) — the forward∘inverse round trip is
    machine-exact, so the q173 oracle can be the input formula."""
    tx, ty, tz, rx, ry, rz, s = params
    m = 1.0 + s
    dX, dY, dZ = (X - tx) / m, (Y - ty) / m, (Z - tz) / m
    det = 1.0 + rx * rx + ry * ry + rz * rz
    Xo = ((1.0 + rx * rx) * dX + (rz + rx * ry) * dY + (rx * rz - ry) * dZ) / det
    Yo = ((rx * ry - rz) * dX + (1.0 + ry * ry) * dY + (rx + ry * rz) * dZ) / det
    Zo = ((ry + rx * rz) * dX + (ry * rz - rx) * dY + (1.0 + rz * rz) * dZ) / det
    return Xo, Yo, Zo


# --- Albers equal-area conic (2SP) ------------------------------------------
# Snyder 1987 (USGS PP 1395) §14, ellipsoidal form — the equal-area
# sibling of the LCC above; the area-element Jacobian anchor lives in
# tests/test_proj_round4.py.


def _aea_consts(phi1_deg: float, phi2_deg: float, phi0_deg: float, lam0_deg: float):
    def m(phi):
        return math.cos(phi) / math.sqrt(1.0 - _E2 * math.sin(phi) ** 2)

    def q(phi):
        s = math.sin(phi)
        return (1.0 - _E2) * (
            s / (1.0 - _E2 * s * s)
            - (1.0 / (2.0 * _E)) * math.log((1.0 - _E * s) / (1.0 + _E * s))
        )

    p1, p2, p0 = (math.radians(v) for v in (phi1_deg, phi2_deg, phi0_deg))
    n = (m(p1) ** 2 - m(p2) ** 2) / (q(p2) - q(p1))
    C = m(p1) ** 2 + n * q(p1)
    rho0 = WGS84_A * math.sqrt(C - n * q(p0)) / n
    return n, C, rho0, math.radians(lam0_deg)


def _q_col(phi: Column) -> Column:
    s = F.sin(phi)
    return (1.0 - _E2) * (
        s / (1.0 - _E2 * s * s)
        - (1.0 / (2.0 * _E)) * F.log((1.0 - _E * s) / (1.0 + _E * s))
    )


def lonlat_to_aea(
    lon: Column, lat: Column,
    phi1: float, phi2: float, phi0: float, lam0: float,
):
    n, C, rho0, l0 = _aea_consts(phi1, phi2, phi0, lam0)
    qv = _q_col(lat * _D2R)
    rho = WGS84_A * F.sqrt(C - n * qv) / n
    theta = n * (lon * _D2R - l0)
    return rho * F.sin(theta), rho0 - rho * F.cos(theta)


def aea_to_lonlat(
    x: Column, y: Column,
    phi1: float, phi2: float, phi0: float, lam0: float,
):
    n, C, rho0, l0 = _aea_consts(phi1, phi2, phi0, lam0)
    rho = F.sqrt(x * x + (rho0 - y) * (rho0 - y))
    theta = F.atan2(x, rho0 - y)
    qv = (C - (rho * n / WGS84_A) * (rho * n / WGS84_A)) / n
    lon = (theta / n + l0) / _D2R
    # inverse authalic latitude by the CLOSED Snyder 3-18 series (no
    # unrolled iteration — tree stays linear; series truncation ~e⁸,
    # i.e. < 1e-11 rad) from β = asin(q/qp)
    qp = (1.0 - _E2) * (
        1.0 / (1.0 - _E2)
        - (1.0 / (2.0 * _E)) * math.log((1.0 - _E) / (1.0 + _E))
    )
    beta = F.asin(qv / qp)
    e4, e6 = _E2 * _E2, _E2 * _E2 * _E2
    phi = (
        beta
        + (_E2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0) * F.sin(2.0 * beta)
        + (23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0) * F.sin(4.0 * beta)
        + (761.0 * e6 / 45360.0) * F.sin(6.0 * beta)
    )
    # one Snyder 3-16 refinement: series truncation ~1e-8 deg → <1e-10
    s = F.sin(phi)
    one = 1.0 - _E2 * s * s
    phi = phi + (one * one) / (2.0 * F.cos(phi)) * (
        qv / (1.0 - _E2)
        - s / one
        + (1.0 / (2.0 * _E)) * F.log((1.0 - _E * s) / (1.0 + _E * s))
    )
    return lon, phi / _D2R


# --- Polar stereographic (EPSG 9829 variant B, north) -------------------------------


def _ps_consts(lat_ts_deg: float):
    """Python-computed constants for the north polar stereographic
    with standard parallel ``lat_ts_deg`` (EPSG method 9829; Snyder
    1987 eqs. 21-33/34, 15-9; re-derived, no reference code)."""
    e = _E
    phi_f = math.radians(lat_ts_deg)
    t_f = math.tan(math.pi / 4.0 - phi_f / 2.0) / (
        (1.0 - e * math.sin(phi_f)) / (1.0 + e * math.sin(phi_f))
    ) ** (e / 2.0)
    m_f = math.cos(phi_f) / math.sqrt(1.0 - _E2 * math.sin(phi_f) ** 2)
    rho_scale = WGS84_A * m_f / t_f
    e2 = _E2
    c2 = e2 / 2.0 + 5.0 * e2**2 / 24.0 + e2**3 / 12.0 + 13.0 * e2**4 / 360.0
    c4 = 7.0 * e2**2 / 48.0 + 29.0 * e2**3 / 240.0 + 811.0 * e2**4 / 11520.0
    c6 = 7.0 * e2**3 / 120.0 + 81.0 * e2**4 / 1120.0
    c8 = 4279.0 * e2**4 / 161280.0
    return rho_scale, m_f, t_f, c2, c4, c6, c8


def lonlat_to_ps(lon: Column, lat: Column, lat_ts_deg: float = 71.0,
                 lon0_deg: float = 0.0):
    """Forward north polar stereographic as Column expressions —
    whole-stage codegen, like the UTM/LCC/AEA families above."""
    rho_scale, _m, _t, *_ = _ps_consts(lat_ts_deg)
    phi = F.radians(lat)
    dlam = F.radians(lon - F.lit(lon0_deg))
    sinp = F.sin(phi)
    t = F.tan(F.lit(math.pi / 4.0) - phi / 2.0) / F.pow(
        (1.0 - _E * sinp) / (1.0 + _E * sinp), _E / 2.0)
    rho = F.lit(rho_scale) * t
    return rho * F.sin(dlam), -rho * F.cos(dlam)


def ps_to_lonlat(E: Column, N: Column, lat_ts_deg: float = 71.0,
                 lon0_deg: float = 0.0):
    """Inverse via the standard conformal-latitude series (exact to
    O(e^10) — sub-nanodegree on WGS84)."""
    rho_scale, _m, _t, c2, c4, c6, c8 = _ps_consts(lat_ts_deg)
    rho = F.sqrt(E * E + N * N)
    tp = rho / F.lit(rho_scale)
    chi = F.lit(math.pi / 2.0) - 2.0 * F.atan(tp)
    phi = (chi + F.lit(c2) * F.sin(2.0 * chi) + F.lit(c4) * F.sin(4.0 * chi)
           + F.lit(c6) * F.sin(6.0 * chi) + F.lit(c8) * F.sin(8.0 * chi))
    lam = F.atan2(E, -N)
    return F.degrees(lam) + F.lit(lon0_deg), F.degrees(phi)
