"""gdalwarp order-statistic modes (q448) — kernel contract.

The oracle fixture is a clean 4x downsample (every footprint exactly
16 contributors); this test pins the UNEVEN case the oracle cannot
reach: a 3x downsample over a 43-pixel dst grid whose last column/row
footprints are clipped by the source raster bound (src_width=128), so
contributor counts vary 4/6/9 — and the reference's exact quantile
pick idx = ceil(quant*n - 1) over the SORTED footprint
(alg/gdalwarpkernel.cpp:8338) must hold at every count, not just 16.
Replayed cell-for-cell against a direct NumPy implementation of the
center-in-span rule.
"""

import math

import numpy as np

from gdal_spark.operators.rasterize import tiles_to_features
from gdal_spark.operators.warp import warp_resample
from gdal_spark.queries import DEM_H, DEM_TILE, DEM_W, IDENTITY_GT, _dem_tiles

GT_DST = (0.0, 3.0, 0.0, 0.0, 0.0, 3.0)
N_DST = 43


def _dem_np() -> np.ndarray:
    gx = np.arange(DEM_W)
    gy = np.arange(DEM_H)
    GX, GY = np.meshgrid(gx, gy)
    return ((GX * 7 + GY * 13) % 97 + (GX * GX) % 23).astype(np.float64)


def _ref(z: np.ndarray, method: str) -> np.ndarray:
    out = np.zeros((N_DST, N_DST))
    quant = {"med": 0.5, "q1": 0.25, "q3": 0.75}.get(method)
    for y in range(N_DST):
        ky = range(3 * y, min(3 * y + 3, DEM_H))
        for x in range(N_DST):
            kx = range(3 * x, min(3 * x + 3, DEM_W))
            vals = sorted(z[j, i] for j in ky for i in kx)
            n = len(vals)
            if method == "sum":
                out[y, x] = sum(vals)
            elif method == "min":
                out[y, x] = vals[0]
            elif method == "max":
                out[y, x] = vals[-1]
            else:
                out[y, x] = vals[max(math.ceil(quant * n - 1), 0)]
    return out


def test_order_stat_warp_uneven_footprints(spark):
    z = _dem_np()
    tiles = _dem_tiles(spark)
    for method in ("min", "max", "sum", "med", "q1", "q3"):
        got = warp_resample(
            tiles, IDENTITY_GT, GT_DST, N_DST, N_DST, tile_size=DEM_TILE,
            method=method, src_width=DEM_W, src_height=DEM_H,
        )
        pdf = (
            tiles_to_features(got, tile_size=DEM_TILE, nodata=None)
            .filter(f"gx < {N_DST} AND gy < {N_DST}")
            .orderBy("gy", "gx")
            .toPandas()
        )
        arr = pdf["v"].to_numpy().reshape(N_DST, N_DST)
        assert np.array_equal(arr, _ref(z, method)), method
