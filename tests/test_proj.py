"""UTM / LCC transforms (functions/proj.py): round-trip accuracy and
absolute correctness against an INDEPENDENT meridian-arc integral
(the Karney series must reproduce 0.9996 x the numerically integrated
meridian distance on the central meridian)."""

import math

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.functions import proj as P

A, FLAT = 6378137.0, 1 / 298.257223563
E2 = FLAT * (2 - FLAT)


def _meridian_arc(lat_deg):
    phis = np.linspace(0, math.radians(lat_deg), 20001)
    M = A * (1 - E2) / np.power(1 - E2 * np.sin(phis) ** 2, 1.5)
    return float(np.trapz(M, phis))


def test_utm_central_meridian_absolute(spark):
    for lat in (10.0, 45.0, 70.0):
        e, n = (
            spark.range(1)
            .select(*P.lonlat_to_utm(F.lit(9.0), F.lit(lat), 32))
            .collect()[0]
        )
        assert abs(e - 500000.0) < 1e-6
        assert abs(n - 0.9996 * _meridian_arc(lat)) < 0.02  # integral tol


def test_utm_roundtrip_all_zones(spark):
    df = spark.range(400).select(
        ((F.col("id") * 77) % 360 - 180 + 0.31).alias("lon"),
        ((F.col("id") * 53) % 160 - 80 + 0.17).alias("lat"),
    )
    zone = P.utm_zone(F.col("lon"))
    e, n = P.lonlat_to_utm(F.col("lon"), F.col("lat"), zone)
    fwd = df.select(
        "lon", "lat", zone.alias("zone"), e.alias("e"), n.alias("n"),
        (F.col("lat") < 0).alias("south"),
    ).repartition(8)
    lon2, lat2 = P.utm_to_lonlat(F.col("e"), F.col("n"), F.col("zone"), F.col("south"))
    r = fwd.agg(
        F.max(F.abs(lon2 - F.col("lon"))).alias("dl"),
        F.max(F.abs(lat2 - F.col("lat"))).alias("db"),
    ).collect()[0]
    assert r["dl"] < 1e-9 and r["db"] < 1e-9


def test_lcc_roundtrip(spark):
    df = spark.range(200).select(
        ((F.col("id") * 77) % 360 - 180 + 0.31).alias("lon"),
        ((F.col("id") * 53) % 140 - 70 + 0.17).alias("lat"),
    )
    x, y = P.lonlat_to_lcc(F.col("lon"), F.col("lat"), 33.0, 45.0, 39.0, -96.0)
    fwd = df.select("lon", "lat", x.alias("x"), y.alias("y")).repartition(8)
    lon2, lat2 = P.lcc_to_lonlat(F.col("x"), F.col("y"), 33.0, 45.0, 39.0, -96.0)
    r = fwd.agg(
        F.max(F.abs(lon2 - F.col("lon"))).alias("dl"),
        F.max(F.abs(lat2 - F.col("lat"))).alias("db"),
    ).collect()[0]
    assert r["dl"] < 1e-9 and r["db"] < 1e-9


def test_lcc_standard_parallel_scale(spark):
    """On a standard parallel the LCC scale factor is exactly 1: a tiny
    east-west step of dλ maps to arc length ~ dλ·a·cosφ/sqrt(1-e²sin²φ)."""
    lat = 33.0
    dlam = 0.001
    rows = (
        spark.range(1)
        .select(
            *P.lonlat_to_lcc(F.lit(-96.0), F.lit(lat), 33.0, 45.0, 39.0, -96.0),
            *P.lonlat_to_lcc(F.lit(-96.0 + dlam), F.lit(lat), 33.0, 45.0, 39.0, -96.0),
        )
        .collect()[0]
    )
    x1, y1, x2, y2 = rows
    dist = math.hypot(x2 - x1, y2 - y1)
    phi = math.radians(lat)
    true = math.radians(dlam) * A * math.cos(phi) / math.sqrt(1 - E2 * math.sin(phi) ** 2)
    assert abs(dist / true - 1.0) < 1e-6
