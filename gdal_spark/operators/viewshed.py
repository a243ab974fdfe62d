"""Viewshed: line-of-sight visibility from one observer over the tile
table.

Reference: ``gdal_viewshed`` / GDALViewshedGenerate
(alg/viewshed/viewshed.cpp — Wang, Robinson & White plane-sweep with
interpolated auxiliary heights).  Pinned semantics here (deterministic
and oracle-checkable; the reference's interpolation scheme drops into
the same walk):

- observer at integer pixel (ox, oy), eye height z(ox, oy) + h_eye;
- for target p with (dx, dy) = p − o and n = max(|dx|, |dy|) steps,
  sample every dominant-axis crossing i = 1..n−1 at
  (ox + i·dx/n, oy + i·dy/n); the off-axis coordinate interpolates
  linearly between the two straddled pixel centers;
- slope of a sample = (z_i − z_eye) · n / i   (common 1/distance
  factor cancelled — comparisons are monotone in the tangent);
- p is visible iff (z_p − z_eye) · 1 ≥ max_i slope_i / n · ... i.e.
  (z_p − z_eye) ≥ max_i ((z_i − z_eye) · n_p / i) / n_p — implemented
  as (z_p − z_eye) * n ≥ max_i ((z_i − z_eye) * n / i) * ... all kept
  in the exact form  (z_i − z_eye) * n / i  vs  (z_p − z_eye) * n / n.

Distribution: a sight line from the observer keeps a CONSTANT angle,
so each target's line lives entirely in its own angular sector — the
raster shards into independent wedge tasks that each receive exactly
their own radial band (shuffle keyed by sector).  Here the DEM fits a
broadcast (the local[*] case); the wedge shuffle is the documented
scale path.  Per task the walk is vectorized over all targets step by
step — no per-pixel Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("gx", T.LongType()),
        T.StructField("gy", T.LongType()),
        T.StructField("visible", T.BooleanType()),
    ]
)


def viewshed_tiles(
    tiles: DataFrame,
    tile_size: int,
    width: int,
    height: int,
    ox: int,
    oy: int,
    eye_height: float = 2.0,
) -> DataFrame:
    """→ (gx, gy, visible) for every pixel of the raster."""
    # assemble the DEM once (small here; wedge-sharded at scale)
    rows = tiles.select("tx", "ty", "data", "dtype").collect()
    z = np.zeros((height, width), dtype=np.float64)
    ts = tile_size
    for r in rows:
        arr = np.frombuffer(r["data"], dtype=np.dtype(r["dtype"])).reshape(ts, ts)
        x0, y0 = int(r["tx"]) * ts, int(r["ty"]) * ts
        z[y0 : y0 + ts, x0 : x0 + ts] = arr[: height - y0, : width - x0]
    zeye = float(z[oy, ox]) + float(eye_height)
    spark = tiles.sparkSession
    ntx = (width + ts - 1) // ts
    nty = (height + ts - 1) // ts

    def per_tile(pdf_iter):
        for pdf in pdf_iter:
            frames = []
            for _, row in pdf.iterrows():
                t = int(row["id"])
                tx, ty = t % ntx, t // ntx
                gx = np.arange(tx * ts, min((tx + 1) * ts, width))
                gy = np.arange(ty * ts, min((ty + 1) * ts, height))
                GX, GY = np.meshgrid(gx, gy)
                px = GX.ravel().astype(np.int64)
                py = GY.ravel().astype(np.int64)
                dx = px - ox
                dy = py - oy
                n = np.maximum(np.abs(dx), np.abs(dy))
                m = np.full(px.size, -np.inf)
                nmax = int(n.max()) if n.size else 0
                for i in range(1, nmax):
                    act = i < n
                    if not act.any():
                        break
                    nn = n[act].astype(np.float64)
                    x = ox + i * dx[act] / nn
                    y = oy + i * dy[act] / nn
                    x0 = np.floor(x).astype(np.int64)
                    y0 = np.floor(y).astype(np.int64)
                    fx = x - x0
                    fy = y - y0
                    x1 = np.minimum(x0 + 1, width - 1)
                    y1 = np.minimum(y0 + 1, height - 1)
                    # dominant-axis crossings: one of fx, fy is exactly 0
                    z00 = z[y0, x0]
                    zi = (
                        z00 * (1.0 - fx) * (1.0 - fy)
                        + z[y0, x1] * fx * (1.0 - fy)
                        + z[y1, x0] * (1.0 - fx) * fy
                        + z[y1, x1] * fx * fy
                    )
                    slope = (zi - zeye) * nn / i
                    cur = m[act]
                    m[act] = np.maximum(cur, slope)
                zp = z[py, px]
                # the common 1/D factor cancels: p is visible iff
                # (z_p − z_eye) ≥ max_i (z_i − z_eye)·n/i
                vis = (zp - zeye) >= m
                vis[n == 0] = True
                frames.append(
                    pd.DataFrame({"gx": px, "gy": py, "visible": vis})
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"gx": [], "gy": [], "visible": []}
            )

    return (
        spark.range(ntx * nty)
        .repartition(max((ntx * nty) // 2, 1))
        .mapInPandas(per_tile, OUT_SCHEMA)
    )
