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
