"""Wedge-sharded viewshed (operators/viewshed.py): the sector shuffle
must be invisible in the result — any sector count, any observer
position (center, corner, edge) gives the same per-pixel booleans as a
reference single-array sweep computed locally in the test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators.viewshed import viewshed_tiles


def _dem(width, height):
    """Deterministic hilly DEM from integer arithmetic."""
    x = np.arange(width)
    y = np.arange(height)
    X, Y = np.meshgrid(x, y)
    return ((X * 37 + Y * 91) % 53 + ((X // 7) * (Y // 5)) % 29).astype(np.float64)


def _tiles_df(spark, z, ts):
    h, w = z.shape
    rows = []
    for ty in range((h + ts - 1) // ts):
        for tx in range((w + ts - 1) // ts):
            t = np.zeros((ts, ts))
            blk = z[ty * ts : (ty + 1) * ts, tx * ts : (tx + 1) * ts]
            t[: blk.shape[0], : blk.shape[1]] = blk
            rows.append((tx, ty, t.tobytes(), "float64"))
    return spark.createDataFrame(rows, "tx long, ty long, data binary, dtype string")


def _reference(z, ox, oy, eye=2.0):
    """Single-array sweep with the pinned LOS arithmetic."""
    h, w = z.shape
    zeye = float(z[oy, ox]) + eye
    X, Y = np.meshgrid(np.arange(w, dtype=np.int64), np.arange(h, dtype=np.int64))
    px, py = X.ravel(), Y.ravel()
    dx, dy = px - ox, py - oy
    n = np.maximum(np.abs(dx), np.abs(dy))
    m = np.full(px.size, -np.inf)
    for i in range(1, int(n.max())):
        act = i < n
        nn = n[act].astype(float)
        x = ox + i * dx[act] / nn
        y = oy + i * dy[act] / nn
        x0 = np.floor(x).astype(np.int64)
        y0 = np.floor(y).astype(np.int64)
        fx, fy = x - x0, y - y0
        x1 = np.minimum(x0 + 1, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        zi = (
            z[y0, x0] * (1 - fx) * (1 - fy)
            + z[y0, x1] * fx * (1 - fy)
            + z[y1, x0] * (1 - fx) * fy
            + z[y1, x1] * fx * fy
        )
        m[act] = np.maximum(m[act], (zi - zeye) * nn / i)
    vis = (z[py, px] - zeye) >= m
    vis[n == 0] = True
    return {(int(a), int(b)): bool(v) for a, b, v in zip(px, py, vis)}


@pytest.mark.parametrize("ox,oy,sectors", [(48, 48, 16), (0, 0, 8), (95, 40, 5)])
def test_wedge_matches_reference(spark, ox, oy, sectors):
    z = _dem(96, 96)
    tiles = _tiles_df(spark, z, 32)
    got = {
        (r["gx"], r["gy"]): r["visible"]
        for r in viewshed_tiles(
            tiles, 32, 96, 96, ox=ox, oy=oy, sectors=sectors
        ).collect()
    }
    want = _reference(z, ox, oy)
    assert len(got) == 96 * 96  # every pixel exactly once
    assert got == want
