"""Viewshed: line-of-sight visibility from one observer over the tile
table — wedge-sharded, no driver-side DEM assembly.

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
- p is visible iff (z_p − z_eye) ≥ max_i (z_i − z_eye)·n/i  (the
  common 1/distance factor cancels — comparisons are monotone in the
  tangent).

Distribution — the wedge shuffle: a sight line from the observer keeps
a CONSTANT angle, so the ray to a target in angular sector s never
leaves s.  The raster shards into ``sectors`` independent wedge tasks:

  1. per tile (mapInPandas): each pixel computes its angle about the
     observer and is emitted — packed as one (xs, ys, zs) binary blob
     per (tile, sector) — to its own sector plus every sector whose
     wedge passes within 1.5 px of it (bilinear sampling touches pixel
     centers up to √2 off the ray; ``asin(1.5/r)`` bounds the angular
     margin, and pixels within r < 3 of the observer go to all
     sectors).  Shuffle volume: DEM × (1 + small margin overlap), one
     exchange, no driver involvement;
  2. per sector (applyInPandas): scatter the received pixels into a
     dense wedge-bbox array and run the SAME vectorized walk as a
     whole-DEM pass — per-target arithmetic is independent, so wedge
     results are bit-identical to the single-array implementation.

Per-task memory is O(DEM/sectors + margin), so ``sectors`` scales the
operator to rasters that no longer fit one executor.
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

_WEDGE_SCHEMA = T.StructType(
    [
        T.StructField("sector", T.IntegerType()),
        T.StructField("xs", T.BinaryType()),
        T.StructField("ys", T.BinaryType()),
        T.StructField("zs", T.BinaryType()),
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
    sectors: int = 16,
) -> DataFrame:
    """→ (gx, gy, visible) for every pixel of the raster."""
    ts = tile_size
    S = int(sectors)
    w_sec = 2.0 * np.pi / S

    def shard(pdf_iter):
        for pdf in pdf_iter:
            out = []
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
                    ts, ts
                )
                tx, ty = int(row["tx"]), int(row["ty"])
                x0, y0 = tx * ts, ty * ts
                w = min(ts, width - x0)
                h = min(ts, height - y0)
                if w <= 0 or h <= 0:
                    continue
                gx = np.arange(x0, x0 + w, dtype=np.int64)
                gy = np.arange(y0, y0 + h, dtype=np.int64)
                GX, GY = np.meshgrid(gx, gy)
                px = GX.ravel()
                py = GY.ravel()
                pz = arr[:h, :w].astype(np.float64).ravel()
                dx = (px - ox).astype(np.float64)
                dy = (py - oy).astype(np.float64)
                r = np.hypot(dx, dy)
                ang = np.arctan2(dy, dx)  # [-π, π]
                per_sector: dict[int, list] = {}
                near = r < 3.0
                if near.any():
                    for s in range(S):
                        per_sector.setdefault(s, []).append(near)
                far = ~near
                if far.any():
                    halfw = np.arcsin(np.clip(1.5 / np.maximum(r, 1.5), 0.0, 1.0))
                    lo = np.floor((ang - halfw + np.pi) / w_sec).astype(np.int64)
                    hi = np.floor((ang + halfw + np.pi) / w_sec).astype(np.int64)
                    span = int((hi - lo)[far].max()) if far.any() else 0
                    for k in range(span + 1):
                        sel = far & (lo + k <= hi)
                        if not sel.any():
                            continue
                        secs = (lo[sel] + k) % S
                        for s in np.unique(secs):
                            m = np.zeros(px.size, dtype=bool)
                            idx = np.flatnonzero(sel)
                            m[idx[secs == s]] = True
                            per_sector.setdefault(int(s), []).append(m)
                for s, masks in per_sector.items():
                    m = masks[0]
                    for mm in masks[1:]:
                        m = m | mm
                    out.append(
                        (
                            s,
                            px[m].tobytes(),
                            py[m].tobytes(),
                            pz[m].tobytes(),
                        )
                    )
            yield pd.DataFrame(out, columns=["sector", "xs", "ys", "zs"])

    wedges = tiles.select("tx", "ty", "data", "dtype").mapInPandas(
        shard, _WEDGE_SCHEMA
    )

    eh = float(eye_height)

    def sweep(key, pdf: pd.DataFrame) -> pd.DataFrame:
        s = int(key[0])
        px = np.concatenate([np.frombuffer(b, dtype=np.int64) for b in pdf["xs"]])
        py = np.concatenate([np.frombuffer(b, dtype=np.int64) for b in pdf["ys"]])
        pz = np.concatenate([np.frombuffer(b, dtype=np.float64) for b in pdf["zs"]])
        xmin, xmax = int(px.min()), int(px.max())
        ymin, ymax = int(py.min()), int(py.max())
        z = np.full((ymax - ymin + 1, xmax - xmin + 1), np.nan)
        z[py - ymin, px - xmin] = pz
        zeye = float(z[oy - ymin, ox - xmin]) + eh

        # strict target set: pixels whose own angle falls in sector s
        dxa = (px - ox).astype(np.float64)
        dya = (py - oy).astype(np.float64)
        ang = np.arctan2(dya, dxa)
        own = np.minimum(
            np.floor((ang + np.pi) / w_sec).astype(np.int64), S - 1
        )
        tgt = own == s
        px, py = px[tgt], py[tgt]
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
            lx0, ly0 = x0 - xmin, y0 - ymin
            lx1, ly1 = x1 - xmin, y1 - ymin
            z00 = z[ly0, lx0]
            zi = (
                z00 * (1.0 - fx) * (1.0 - fy)
                + z[ly0, lx1] * fx * (1.0 - fy)
                + z[ly1, lx0] * (1.0 - fx) * fy
                + z[ly1, lx1] * fx * fy
            )
            slope = (zi - zeye) * nn / i
            cur = m[act]
            m[act] = np.maximum(cur, slope)
        zp = z[py - ymin, px - xmin]
        # the common 1/D factor cancels: p is visible iff
        # (z_p − z_eye) ≥ max_i (z_i − z_eye)·n/i
        vis = (zp - zeye) >= m
        vis[n == 0] = True
        return pd.DataFrame({"gx": px, "gy": py, "visible": vis})

    # groupBy is the single wedge exchange (sector-keyed shuffle)
    return wedges.groupBy("sector").applyInPandas(sweep, OUT_SCHEMA)


def viewshed_wang_features(
    dems: DataFrame,
    ox: int,
    oy: int,
    width: int,
    height: int,
    obs_z: float = 0.0,
    target_h: float = 0.0,
    id_col: str = "fid",
    dem_col: str = "dem",
) -> DataFrame:
    """Wang-EXACT viewshed (the reference's default algorithm,
    alg/viewshed/viewshed_executor.cpp — see kernels/viewshed_wang.py
    for the pinned recurrence) over a table of per-feature DEM blobs:
    one observer per row, the realistic fleet shape (a deployment
    computes viewsheds for MANY observers; each DEM's two scan
    directions and left/right sweeps are the reference's own maximum
    intra-raster parallelism, so ACROSS-observer parallelism is where
    a cluster wins).  For one huge raster, `viewshed_tiles` (pinned
    LOS, wedge-sharded) remains the scale path.

    Output: one row per pixel (fid, gx, gy, vis) with vis 255/0."""
    out_schema = "fid long, gx int, gy int, vis double"

    def run(it):
        from gdal_spark.kernels.viewshed_wang import viewshed_wang

        for pdf in it:
            frames = []
            for r in pdf.itertuples(index=False):
                dem = np.frombuffer(
                    getattr(r, dem_col), dtype=np.float64
                ).reshape(height, width)
                v = viewshed_wang(dem, ox, oy, obs_z=obs_z, target_h=target_h)
                ys, xs = np.indices((height, width))
                frames.append(
                    pd.DataFrame(
                        {
                            "fid": int(getattr(r, id_col)),
                            "gx": xs.ravel().astype(np.int32),
                            "gy": ys.ravel().astype(np.int32),
                            "vis": v.ravel(),
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"fid": [], "gx": [], "gy": [], "vis": []}
            )

    return dems.select(id_col, dem_col).mapInPandas(run, out_schema)


def cumulative_viewshed_wang(
    dems: DataFrame,
    width: int,
    height: int,
    obs_z: float = 0.0,
    id_col: str = "obs_id",
    dem_col: str = "dem",
    ox_col: str = "ox",
    oy_col: str = "oy",
) -> DataFrame:
    """CUMULATIVE viewshed — the reference's observer-matrix mode
    (alg/viewshed/cumulative.cpp: run the Wang executor once per
    observer, SUM per-pixel visibility): rows carry (obs_id, dem,
    ox, oy); each observer's viewshed runs independently (the
    across-observer axis is the cluster parallelism, exactly the
    reference's thread pool), then one groupBy(gx, gy) aggregates the
    visible-observer count.

    Returns (gx, gy, n_visible) with n_visible = #observers seeing the
    pixel.

    Scale note: rows carry their own DEM blob so observers MAY scan
    different rasters; for one shared huge DEM, ship it once (a
    broadcast or a 1-row cross join) rather than per-row — or use the
    wedge-sharded `viewshed_tiles` path per observer."""
    out_schema = "gx int, gy int, vis double"

    def run(it):
        from gdal_spark.kernels.viewshed_wang import viewshed_wang

        for pdf in it:
            frames = []
            for r in pdf.itertuples(index=False):
                dem = np.frombuffer(
                    getattr(r, dem_col), dtype=np.float64
                ).reshape(height, width)
                v = viewshed_wang(
                    dem, int(getattr(r, ox_col)), int(getattr(r, oy_col)),
                    obs_z=obs_z,
                )
                ys, xs = np.indices((height, width))
                frames.append(
                    pd.DataFrame(
                        {
                            "gx": xs.ravel().astype(np.int32),
                            "gy": ys.ravel().astype(np.int32),
                            "vis": v.ravel(),
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"gx": [], "gy": [], "vis": []}
            )

    per_obs = dems.select(id_col, dem_col, ox_col, oy_col).mapInPandas(
        run, out_schema
    )
    return per_obs.groupBy("gx", "gy").agg(
        (F.sum("vis") / 255.0).cast("long").alias("n_visible")
    )
