"""Helmert 7-parameter datum shift + Albers equal-area anchors
(round-4): algebraic invariants, not replayed constants — translation
moves ECEF by exactly T, rotation/scale preserve norms ×(1+s), the
exact inverse round-trips at machine precision, and the Albers forward
map's Jacobian equals the ellipsoid area element (the DEFINITION of an
equal-area projection), checked by finite differences."""

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gdal_spark.functions import proj as P

ARCSEC = math.pi / 180.0 / 3600.0
ED50ISH = (-87.0, -96.0, -120.0, 1.0 * ARCSEC, 2.0 * ARCSEC, -3.0 * ARCSEC, 5e-6)


def _pts(spark, n=40):
    pdf = pd.DataFrame(
        {
            "lon": [(k * 67) % 360 - 180 + 0.31 for k in range(n)],
            "lat": [(k * 41) % 160 - 80 + 0.17 for k in range(n)],
            "h": [float((k * 13) % 500) for k in range(n)],
        }
    )
    return spark.createDataFrame(pdf)


def test_ecef_roundtrip(spark):
    df = _pts(spark)
    X, Y, Z = P.geodetic_to_ecef(F.col("lon"), F.col("lat"), F.col("h"))
    lon2, lat2, h2 = P.ecef_to_geodetic(X, Y, Z)
    r = df.select(
        (F.abs(lon2 - F.col("lon"))).alias("dl"),
        (F.abs(lat2 - F.col("lat"))).alias("dp"),
        (F.abs(h2 - F.col("h"))).alias("dh"),
    ).toPandas()
    assert r["dl"].max() < 1e-9 and r["dp"].max() < 1e-9 and r["dh"].max() < 1e-6


def test_helmert_translation_and_norm(spark):
    df = _pts(spark)
    X, Y, Z = P.geodetic_to_ecef(F.col("lon"), F.col("lat"), F.col("h"))
    # translation-only: exact shift by T
    tx, ty, tz = -87.0, -96.0, -120.0
    Xs, Ys, Zs = P.helmert7(X, Y, Z, (tx, ty, tz, 0.0, 0.0, 0.0, 0.0))
    r = df.select(
        F.max(F.abs(Xs - X - tx)).alias("ax"),
        F.max(F.abs(Ys - Y - ty)).alias("ay"),
        F.max(F.abs(Zs - Z - tz)).alias("az"),
    ).collect()[0]
    assert r["ax"] == 0.0 and r["ay"] == 0.0 and r["az"] == 0.0
    # rotation+scale only: |X'| == (1+s)·|R·X|, and R̃ = I + skew keeps
    # norm to first order — check the EXACT norm of the applied matrix
    rx, ry, rz, s = 3.0 * ARCSEC, -2.0 * ARCSEC, 1.5 * ARCSEC, 4e-6
    Xr, Yr, Zr = P.helmert7(X, Y, Z, (0.0, 0.0, 0.0, rx, ry, rz, s))
    got = df.select(
        ((Xr * Xr + Yr * Yr + Zr * Zr) / (X * X + Y * Y + Z * Z)).alias("ratio"),
        (X * Xr + Y * Yr + Z * Zr).alias("dot"),
        (X * X + Y * Y + Z * Z).alias("n2"),
        Xr.alias("xr"), Yr.alias("yr"), Zr.alias("zr"),
        X.alias("x"), Y.alias("y"), Z.alias("z"),
    ).toPandas()
    # exact: |X'|² = (1+s)²(|X|² + |r × X|²) since (I+skew)X = X + r×X ⊥ decomposition
    rvec = np.array([rx, ry, rz])
    Xm = got[["x", "y", "z"]].to_numpy()
    cross = np.cross(rvec, Xm)
    expect = (1.0 + s) ** 2 * ((Xm**2).sum(axis=1) + (cross**2).sum(axis=1))
    gotn = (got[["xr", "yr", "zr"]].to_numpy() ** 2).sum(axis=1)
    assert np.max(np.abs(gotn / expect - 1.0)) < 1e-14


def test_helmert_exact_inverse_roundtrip(spark):
    df = _pts(spark)
    X, Y, Z = P.geodetic_to_ecef(F.col("lon"), F.col("lat"), F.col("h"))
    Xs, Ys, Zs = P.helmert7(X, Y, Z, ED50ISH)
    Xb, Yb, Zb = P.helmert7_inverse(Xs, Ys, Zs, ED50ISH)
    r = df.select(
        F.max(F.abs(Xb - X)).alias("ax"),
        F.max(F.abs(Yb - Y)).alias("ay"),
        F.max(F.abs(Zb - Z)).alias("az"),
    ).collect()[0]
    assert r["ax"] < 1e-8 and r["ay"] < 1e-8 and r["az"] < 1e-8  # meters


def test_albers_equal_area_jacobian(spark):
    """The forward map's |∂(x,y)/∂(λ,φ)| must equal the ellipsoid area
    element a²(1−e²)·cosφ/(1−e²sin²φ)² — the defining property; finite
    differences at h=1e-6 rad give ~1e-7 relative truncation."""
    params = (29.5, 45.5, 23.0, -96.0)
    lats = [25.0, 31.7, 38.4, 44.1]
    lons = [-110.0, -96.5, -83.0, -70.0]
    pts = [(lo, la) for lo in lons for la in lats]
    hdeg = 1e-6 * 180.0 / math.pi
    rows = []
    for lo, la in pts:
        rows += [
            (lo + hdeg, la), (lo - hdeg, la), (lo, la + hdeg), (lo, la - hdeg)
        ]
    pdf = pd.DataFrame(rows, columns=["lon", "lat"])
    df = spark.createDataFrame(pdf)
    x, y = P.lonlat_to_aea(F.col("lon"), F.col("lat"), *params)
    got = df.select(x.alias("x"), y.alias("y")).toPandas().to_numpy()
    e2 = P._E2
    a = P.WGS84_A
    for i, (lo, la) in enumerate(pts):
        g = got[4 * i : 4 * i + 4]
        dx_dl = (g[0, 0] - g[1, 0]) / (2e-6)
        dy_dl = (g[0, 1] - g[1, 1]) / (2e-6)
        dx_dp = (g[2, 0] - g[3, 0]) / (2e-6)
        dy_dp = (g[2, 1] - g[3, 1]) / (2e-6)
        jac = abs(dx_dl * dy_dp - dx_dp * dy_dl)
        phi = math.radians(la)
        element = (
            a * a * (1.0 - e2) * math.cos(phi)
            / (1.0 - e2 * math.sin(phi) ** 2) ** 2
        )
        assert abs(jac / element - 1.0) < 1e-5, (lo, la, jac, element)


def test_albers_roundtrip(spark):
    df = _pts(spark).filter((F.col("lat") > -60) & (F.col("lat") < 75))
    params = (29.5, 45.5, 23.0, -96.0)
    x, y = P.lonlat_to_aea(F.col("lon"), F.col("lat"), *params)
    fwd = df.select("lon", "lat", x.alias("x"), y.alias("y"))
    lon2, lat2 = P.aea_to_lonlat(F.col("x"), F.col("y"), *params)
    r = fwd.select(
        F.max(F.abs(lon2 - F.col("lon"))).alias("dl"),
        F.max(F.abs(lat2 - F.col("lat"))).alias("dp"),
    ).collect()[0]
    assert r["dl"] < 1e-9 and r["dp"] < 1e-9
