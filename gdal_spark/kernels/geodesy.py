"""Geotransform, WebMercator tile math, and Hilbert codes.

- Geotransform: 6-coefficient affine (col,row) → (X,Y), the reference's
  ``GDALGeoTransform`` (gcore/gdal_geotransform.h:27-63).
- WebMercatorQuad tiling: the z/x/y pyramid used by the reference's
  tile writer (apps/gdalalg_raster_tile.cpp:200-300 +
  gcore/tilematrixset.cpp): 256² tiles, zoom z has 2^z × 2^z tiles
  over ±20037508.342789244 m.
- Hilbert codes: the spatial sort key (reference
  apps/gdalalg_vector_sort.cpp:302-389 and FlatGeobuf's packed Hilbert
  R-tree, ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:78-107) used for
  ``repartitionByRange`` clustering.
"""

from __future__ import annotations

import numpy as np

WEBMERC_MAX = 20037508.342789244
TILE_SIZE = 256

__all__ = [
    "pixel_to_world",
    "world_to_pixel_gt",
    "lonlat_to_webmerc",
    "webmerc_to_lonlat",
    "tile_of_webmerc",
    "tile_geotransform",
    "hilbert_d2xy",
    "hilbert_xy2d",
]


def pixel_to_world(px, py, gt):
    x0, xs, xr, y0, yr, ys = gt
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    return x0 + px * xs + py * xr, y0 + px * yr + py * ys


def world_to_pixel_gt(xs, ys, gt):
    from gdal_spark.kernels.burn import world_to_pixel

    return world_to_pixel(xs, ys, gt)


def lonlat_to_webmerc(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = lon * WEBMERC_MAX / 180.0
    latc = np.clip(lat, -85.06, 85.06)
    y = np.log(np.tan((90.0 + latc) * np.pi / 360.0)) / np.pi * WEBMERC_MAX
    return x, y


def webmerc_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = x / WEBMERC_MAX * 180.0
    lat = np.degrees(2.0 * np.arctan(np.exp(y * np.pi / WEBMERC_MAX)) - np.pi / 2.0)
    return lon, lat


def tile_of_webmerc(x, y, z):
    """WebMercatorQuad tile containing a mercator point at zoom z."""
    n = 1 << z
    span = 2.0 * WEBMERC_MAX / n
    tx = np.floor((np.asarray(x, dtype=np.float64) + WEBMERC_MAX) / span).astype(
        np.int64
    )
    ty = np.floor((WEBMERC_MAX - np.asarray(y, dtype=np.float64)) / span).astype(
        np.int64
    )
    return np.clip(tx, 0, n - 1), np.clip(ty, 0, n - 1)


def tile_geotransform(z: int, tx: int, ty: int, tile_size: int = TILE_SIZE):
    """Geotransform of tile (z, tx, ty): origin top-left, north-up."""
    n = 1 << z
    span = 2.0 * WEBMERC_MAX / n
    res = span / tile_size
    x0 = -WEBMERC_MAX + tx * span
    y0 = WEBMERC_MAX - ty * span
    return (x0, res, 0.0, y0, 0.0, -res)


def hilbert_xy2d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized (x, y) → Hilbert distance at 2^order × 2^order."""
    x = np.asarray(x, dtype=np.uint64).copy()
    y = np.asarray(y, dtype=np.uint64).copy()
    d = np.zeros_like(x)
    one = np.uint64(1)
    s = np.uint64(1) << np.uint64(order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant: when ry == 0 (flip if rx == 1, then swap x/y)
        swap = ry == 0
        flip = swap & (rx == 1)
        x = np.where(flip, (s - one) - x, x)
        y = np.where(flip, (s - one) - y, y)
        x_new = np.where(swap, y, x)
        y_new = np.where(swap, x, y)
        x, y = x_new, y_new
        s >>= one
    return d.astype(np.int64)


def hilbert_d2xy(order: int, d: np.ndarray):
    """Inverse of hilbert_xy2d (scalar-loop free)."""
    d = np.asarray(d, dtype=np.uint64).copy()
    t = d.copy()
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    one = np.uint64(1)
    s = np.uint64(1)
    top = np.uint64(1) << np.uint64(order)
    while s < top:
        rx = one & (t // np.uint64(2))
        ry = one & (t ^ rx)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x.copy()
        x = np.where(flip, s - one - x, x)
        y = np.where(flip, s - one - y, y)
        x_new = np.where(swap, y, x)
        y_new = np.where(swap, x, y)
        x, y = x_new, y_new
        x += s * rx
        y += s * ry
        t //= np.uint64(4)
        s <<= one
    return x.astype(np.int64), y.astype(np.int64)
