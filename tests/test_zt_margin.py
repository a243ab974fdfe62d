"""Zevenbergen–Thorne aspect (q449) — rounding-margin contract.

q449's aspect column compares atan2-bearing values (JVM libm vs
DuckDB libm, 1-ulp apart on ~3% of arguments) after round(3) IN the
query.  Green is only honest if no fixture pixel sits near a rounding
boundary (the tests/test_hillshade_modes.py contract): pin that every
pixel's distance to the nearest half-integer of aspect*1000 exceeds
1e-4 — >= 10^8 ulps of margin, so last-ulp libm drift can never flip
a rounded value.  The slope column is arithmetic + one IEEE sqrt
(correctly rounded, bitwise both engines) and needs no margin; its
test instead pins the ZT kernel against a direct NumPy replay.
"""

import numpy as np
import pyspark.sql.functions as F

from gdal_spark.operators.focal import zt_pq_tiles
from gdal_spark.queries import (
    DEM_H,
    DEM_TILE,
    DEM_W,
    _aspect_sql,
    _dem_tiles,
)


def _margins(vals: np.ndarray) -> float:
    frac = np.mod(vals * 1000.0, 1.0)
    return float(np.abs(frac - 0.5).min())


def _dem_np() -> np.ndarray:
    gx = np.arange(DEM_W)
    gy = np.arange(DEM_H)
    GX, GY = np.meshgrid(gx, gy)
    return ((GX * 7 + GY * 13) % 97 + (GX * GX) % 23).astype(np.float64)


def test_zt_aspect_rounding_margin(spark):
    pq = zt_pq_tiles(_dem_tiles(spark), DEM_TILE, DEM_W, DEM_H)
    vals = np.array(
        [r[0] for r in pq.select(F.expr(_aspect_sql("p", "q", "2.0"))).collect()]
    )
    assert len(vals) == (DEM_W - 2) * (DEM_H - 2)
    assert np.isfinite(vals).all()
    assert _margins(vals) > 1e-4


def test_zt_pq_matches_numpy_central_differences(spark):
    z = _dem_np()
    pq = (
        zt_pq_tiles(_dem_tiles(spark), DEM_TILE, DEM_W, DEM_H)
        .orderBy("gy", "gx")
        .toPandas()
    )
    p_ref = (z[1:-1, 2:] - z[1:-1, :-2]) / 2.0
    q_ref = (z[2:, 1:-1] - z[:-2, 1:-1]) / 2.0
    assert np.array_equal(pq["p"].to_numpy().reshape(DEM_H - 2, DEM_W - 2), p_ref)
    assert np.array_equal(pq["q"].to_numpy().reshape(DEM_H - 2, DEM_W - 2), q_ref)
