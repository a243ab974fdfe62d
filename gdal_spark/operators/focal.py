"""Focal (neighborhood) raster operators over the distributed tile
table: halo exchange + per-tile NumPy kernels.

Reference surface re-created:
- ``gdal raster neighbors`` sliding-kernel stats
  (apps/gdalalg_raster_neighbors.cpp:87-185) → ``focal_sum_tiles``
- ``gdaldem slope`` Horn's formula over the 3×3 neighborhood
  (apps/gdaldem_lib.cpp) → ``horn_slope_tiles``
- ``GDALInterpolateAtPoint`` bilinear sampling
  (alg/gdal_interpolateatpoint.cpp) → ``interpolate_bilinear``

The distributed decomposition is the same for all three: a focal
kernel at a pixel needs a radius-r ring around it, so each tile task
needs an r-pixel halo owned by up to 8 neighbor tiles.  Halo exchange
= one narrow shuffle: every tile emits its own body plus 8 boundary
STRIPS (r columns/rows, not whole tiles) keyed by the neighbor that
needs them; ``groupBy(tile).applyInPandas`` assembles the padded
array.  Strips are an O(r/tile_size) fraction of the data — at 256²
tiles and r=1 the exchange moves <1% of the raster, which is why this
survives a 1000-executor 100 TB run while a "gather 9 tiles per task"
scheme would move 9×.

Empty neighbor tiles contribute zero halos, and a tile that receives
only strips (its own body empty) still computes — focal output can be
nonzero one ring outside the occupied tiles, matching a full-raster
run exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EXCHANGE_SCHEMA = T.StructType(
    [
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("ox", T.IntegerType()),   # offset of the SOURCE tile
        T.StructField("oy", T.IntegerType()),   # relative to the target
        T.StructField("data", T.BinaryType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
    ]
)


def _emit_strips(tiles: DataFrame, tile_size: int, radius: int, ntx: int, nty: int):
    """tile rows → (target tile, source offset, strip) rows."""
    ts, r = tile_size, radius

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
                    ts, ts
                ).astype(np.float64)
                tx, ty = int(row["tx"]), int(row["ty"])
                rows.append((tx, ty, 0, 0, arr.tobytes(), ts, ts))
                # strip slices of self that each neighbor needs
                for ox in (-1, 0, 1):
                    for oy in (-1, 0, 1):
                        if ox == 0 and oy == 0:
                            continue
                        txx, tyy = tx + ox, ty + oy
                        if not (0 <= txx < ntx and 0 <= tyy < nty):
                            continue
                        # the neighbor at +1 sees me at -1 and needs my
                        # far (high-index) edge; at -1 my near edge
                        xs = slice(ts - r, ts) if ox == 1 else (slice(0, r) if ox == -1 else slice(0, ts))
                        ys = slice(ts - r, ts) if oy == 1 else (slice(0, r) if oy == -1 else slice(0, ts))
                        strip = arr[ys, xs]
                        rows.append(
                            (txx, tyy, -ox, -oy, strip.tobytes(), strip.shape[0], strip.shape[1])
                        )
            yield pd.DataFrame(
                rows, columns=["tx", "ty", "ox", "oy", "data", "h", "w"]
            )

    return tiles.mapInPandas(gen, _EXCHANGE_SCHEMA)


def _assemble_padded(
    pdf: pd.DataFrame, tile_size: int, radius: int, fill: float = 0.0
) -> np.ndarray:
    """Strip rows of one target tile → (ts+2r)² padded float64 array.
    Halo cells with no source strip (outside the raster) take ``fill``
    — pass the nodata value when validity is inferred from != nodata."""
    ts, r = tile_size, radius
    padded = np.full((ts + 2 * r, ts + 2 * r), fill, dtype=np.float64)
    for _, row in pdf.iterrows():
        part = np.frombuffer(row["data"], dtype=np.float64).reshape(
            int(row["h"]), int(row["w"])
        )
        ox, oy = int(row["ox"]), int(row["oy"])
        # ox/oy locate the SOURCE relative to this tile
        y0 = r + oy * ts if oy != -1 else 0
        x0 = r + ox * ts if ox != -1 else 0
        if oy == 1:
            y0 = r + ts
        if ox == 1:
            x0 = r + ts
        if oy == 0:
            y0 = r
        if ox == 0:
            x0 = r
        padded[y0 : y0 + part.shape[0], x0 : x0 + part.shape[1]] = part
    return padded


def _apply_focal(
    tiles: DataFrame,
    tile_size: int,
    radius: int,
    ntx: int,
    nty: int,
    kernel,
    pad_fill: float = 0.0,
    keep=None,
):
    """Halo exchange then per-tile ``kernel(padded) -> (ts, ts) array``;
    returns per-pixel rows (gx, gy, v) for kept outputs (default:
    nonzero; pass ``keep=lambda res: res != nodata`` for rasters whose
    empty value isn't 0)."""
    strips = _emit_strips(tiles, tile_size, radius, ntx, nty)
    out_schema = T.StructType(
        [
            T.StructField("gx", T.LongType()),
            T.StructField("gy", T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    ts = tile_size

    def per_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        padded = _assemble_padded(pdf, ts, radius, fill=pad_fill)
        res = kernel(padded)
        m = (res != 0) if keep is None else keep(res)
        ys, xs = np.nonzero(m)
        return pd.DataFrame(
            {"gx": xs + tx * ts, "gy": ys + ty * ts, "v": res[ys, xs]}
        )

    return strips.groupBy("tx", "ty").applyInPandas(per_tile, out_schema)


def focal_sum_tiles(
    tiles: DataFrame, tile_size: int, width: int, height: int, radius: int = 1
) -> DataFrame:
    """3×3 (radius=1) moving-window SUM; zero-padded at raster edges.
    Returns (gx, gy, v) rows for pixels with nonzero focal sum."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    r = radius

    def kern(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 2 * r
        out = np.zeros((ts, ts), dtype=np.float64)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                out += padded[r + dy : r + dy + ts, r + dx : r + dx + ts]
        return out

    return _apply_focal(tiles, tile_size, r, ntx, nty, kern)


def horn_slope_tiles(
    tiles: DataFrame,
    tile_size: int,
    width: int,
    height: int,
    xres: float = 1.0,
    yres: float = 1.0,
) -> DataFrame:
    """Slope (percent) by Horn's formula over the 3×3 neighborhood —
    the reference's ``gdaldem slope`` kernel (apps/gdaldem_lib.cpp):
    p = ((z_ne+2z_e+z_se) - (z_nw+2z_w+z_sw)) / (8·xres), q likewise
    north-south, slope% = 100·sqrt(p²+q²).  Interior pixels only (the
    reference skips edges unless -compute_edges); raster-boundary rows
    are masked out after the halo pass."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size

    def kern(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 2
        z = padded
        c = slice(1, 1 + ts)
        lo = slice(0, ts)
        hi = slice(2, 2 + ts)
        p = (
            (z[lo, hi] + 2.0 * z[c, hi] + z[hi, hi])
            - (z[lo, lo] + 2.0 * z[c, lo] + z[hi, lo])
        ) / (8.0 * xres)
        q = (
            (z[hi, lo] + 2.0 * z[hi, c] + z[hi, hi])
            - (z[lo, lo] + 2.0 * z[lo, c] + z[lo, hi])
        ) / (8.0 * yres)
        return 100.0 * np.sqrt(p * p + q * q)

    out = _apply_focal(tiles, tile_size, 1, ntx, nty, kern)
    # interior only: the raster boundary ring has no full neighborhood
    return out.filter(
        (F.col("gx") > 0)
        & (F.col("gx") < width - 1)
        & (F.col("gy") > 0)
        & (F.col("gy") < height - 1)
    )


def proximity_tiles(
    tiles: DataFrame,
    tile_size: int,
    width: int,
    height: int,
    max_dist: int = 8,
) -> DataFrame:
    """Bounded Euclidean proximity — ``GDALComputeProximity`` with
    MAXDIST (alg/gdalproximity.cpp): per pixel, the distance to the
    nearest target (nonzero) pixel, reported only where it is
    ≤ ``max_dist``.

    The distribution insight: bounding the distance bounds the halo —
    a pixel's nearest target within r pixels lives in the r-padded
    tile, so ONE boundary exchange of r-pixel strips replaces the
    reference's whole-raster two-pass scan (which doesn't distribute).
    The unbounded transform would iterate this kernel (halo relaxation)
    until a fixpoint; bounded proximity is the common production form
    (the reference defaults MAXDIST to 64 for the same cost reason).

    Per-tile kernel: min over the ~π r² integer offsets of shifted
    target masks — vectorized, no Python per pixel.
    Returns (gx, gy, dist) rows with dist rounded to 6 dp.
    """
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    r = max_dist
    offsets = [
        (dx, dy, dx * dx + dy * dy)
        for dx in range(-r, r + 1)
        for dy in range(-r, r + 1)
        if dx * dx + dy * dy <= r * r
    ]

    def kern(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 2 * r
        target = padded != 0
        best = np.full((ts, ts), np.inf)
        for dx, dy, d2 in offsets:
            t = target[r + dy : r + dy + ts, r + dx : r + dx + ts]
            best = np.where(t, np.minimum(best, float(d2)), best)
        out = np.sqrt(best)
        out[~np.isfinite(out)] = 0.0
        # distance 0 (target pixels) must survive the nonzero filter of
        # _apply_focal: encode as -1 there, fix up after
        out[target[r : r + ts, r : r + ts]] = -1.0
        return out

    res = _apply_focal(tiles, tile_size, r, ntx, nty, kern)
    return res.select(
        "gx",
        "gy",
        F.round(
            F.when(F.col("v") < 0, F.lit(0.0)).otherwise(F.col("v")), 6
        ).alias("dist"),
    ).filter((F.col("gx") < width) & (F.col("gy") < height))


def interpolate_bilinear(
    tiles: DataFrame,
    points: DataFrame,
    tile_size: int,
    width: int,
    height: int,
    qx: str = "qx",
    qy: str = "qy",
    id_col: str = "qid",
) -> DataFrame:
    """Bilinear sample of the raster at fractional pixel coordinates —
    GDALInterpolateAtPoint(GRIORA_Bilinear) semantics
    (alg/gdal_interpolateatpoint.cpp): value surface anchored at pixel
    CENTERS, v(q) = Σ w_ij · z[gy0+j, gx0+i] with gx0 = floor(qx-0.5),
    wx = qx-0.5-gx0; pixels outside the raster read as 0 here (the
    sparse-tile convention).

    Physical plan: a point belongs to exactly ONE tile (the one
    containing (qx, qy)); with a radius-1 halo all 4 neighboring pixel
    centers are present in that tile's padded array, so the join is a
    cogroup on the tile key — no point ever needs two tiles.
    """
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    ts = tile_size
    strips = _emit_strips(tiles, ts, 1, ntx, nty)

    pts = points.withColumn(
        "tx", F.floor(F.col(qx) / ts).cast("long")
    ).withColumn("ty", F.floor(F.col(qy) / ts).cast("long"))

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("v", T.DoubleType()),
        ]
    )

    def cog(key, tile_pdf: pd.DataFrame, pts_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pts_pdf) == 0:
            return pd.DataFrame({id_col: [], "v": []})
        tx, ty = int(key[0]), int(key[1])
        padded = _assemble_padded(tile_pdf, ts, 1)
        x = pts_pdf[qx].to_numpy(np.float64) - tx * ts
        y = pts_pdf[qy].to_numpy(np.float64) - ty * ts
        gx0 = np.floor(x - 0.5).astype(np.int64)
        gy0 = np.floor(y - 0.5).astype(np.int64)
        wx = (x - 0.5) - gx0
        wy = (y - 0.5) - gy0
        # padded index = local index + 1
        ix = gx0 + 1
        iy = gy0 + 1
        v00 = padded[iy, ix]
        v10 = padded[iy, ix + 1]
        v01 = padded[iy + 1, ix]
        v11 = padded[iy + 1, ix + 1]
        v = (
            v00 * (1 - wx) * (1 - wy)
            + v10 * wx * (1 - wy)
            + v01 * (1 - wx) * wy
            + v11 * wx * wy
        )
        return pd.DataFrame({id_col: pts_pdf[id_col].to_numpy(), "v": v})

    return (
        strips.groupBy("tx", "ty")
        .cogroup(pts.groupBy("tx", "ty"))
        .applyInPandas(cog, out_schema)
    )


def _edt_1d_sq(f: np.ndarray) -> np.ndarray:
    """Exact 1-D squared Euclidean distance transform under sampled
    parabolas (Felzenszwalb & Huttenlocher 2004, public algorithm):
    D(q) = min_p (q-p)² + f(p).  Handles +inf entries (empty sites)."""
    n = f.shape[0]
    D = np.full(n, np.inf)
    v = np.zeros(n, dtype=np.int64)
    z = np.empty(n + 1)
    k = -1
    for q in range(n):
        if not np.isfinite(f[q]):
            continue
        if k < 0:
            k = 0
            v[0] = q
            z[0] = -np.inf
            z[1] = np.inf
            continue
        while True:
            p = v[k]
            s = ((f[q] + q * q) - (f[p] + p * p)) / (2.0 * q - 2.0 * p)
            if s <= z[k]:
                k -= 1
                if k < 0:
                    break
            else:
                break
        k += 1
        v[k] = q
        z[k] = s if k > 0 else -np.inf
        z[k + 1] = np.inf
    if k < 0:
        return D
    j = 0
    for q in range(n):
        while z[j + 1] < q:
            j += 1
        D[q] = (q - v[j]) ** 2 + f[v[j]]
    return D


def proximity_unbounded(
    tiles: DataFrame,
    tile_size: int,
    width: int,
    height: int,
    row_block: int = 64,
    col_block: int = 256,
) -> DataFrame:
    """UNBOUNDED exact Euclidean proximity — ``GDALComputeProximity``
    without MAXDIST (alg/gdalproximity.cpp runs two whole-raster scan
    passes, which don't distribute).

    Spark re-expression as the separable exact EDT — no iteration and
    no driver-side target list (dense masks scale the same as sparse):

      phase A (column pass): targets shuffle ONCE keyed by column
        block; per column the nearest-target |Δy| for every row comes
        from a searchsorted against that column's sorted target ys.
        Output is the g(x, y) field, packed as one blob per
        (row block × column block) cell;
      phase B (row pass): the g blobs shuffle keyed by row block and
        the exact transform composes per ROW,
        D(x,y)² = min_x' ( g(x',y)² + (x-x')² ) — the 1-D parabola
        envelope (Felzenszwalb–Huttenlocher) over the assembled row.

    Two O(pixels) exchanges total, each task O(row_block · width);
    the result is the EXACT Euclidean distance (brute-force oracle),
    not the chamfer approximation.
    """
    from gdal_spark.operators.rasterize import tiles_to_features

    nrb = (height + row_block - 1) // row_block
    out_schema = T.StructType(
        [
            T.StructField("gx", T.LongType()),
            T.StructField("gy", T.LongType()),
            T.StructField("dist", T.DoubleType()),
        ]
    )
    g_schema = T.StructType(
        [
            T.StructField("rb", T.LongType()),
            T.StructField("cb", T.LongType()),
            T.StructField("g", T.BinaryType()),
        ]
    )

    targets = (
        tiles_to_features(tiles, tile_size=tile_size, nodata=0.0)
        .select("gx", "gy")
        .withColumn("cbk", (F.col("gx") / col_block).cast("long"))
    )

    def col_pass(key, pdf: pd.DataFrame):
        cb = int(key[0])
        x0 = cb * col_block
        ncols = min(col_block, width - x0)
        gfield = np.full((height, ncols), np.inf)
        Y = np.arange(height, dtype=np.int64)
        lx = pdf["gx"].to_numpy(np.int64) - x0
        ly = pdf["gy"].to_numpy(np.int64)
        for x in np.unique(lx):
            ys = np.sort(ly[lx == x])
            idx = np.searchsorted(ys, Y)
            lo = ys[np.clip(idx - 1, 0, ys.size - 1)]
            hi = ys[np.clip(idx, 0, ys.size - 1)]
            gfield[:, x] = np.minimum(
                np.abs(Y - lo), np.abs(Y - hi)
            ).astype(np.float64)
        rows = []
        for rb in range(nrb):
            y0 = rb * row_block
            y1 = min(y0 + row_block, height)
            rows.append((rb, cb, gfield[y0:y1].tobytes()))
        return pd.DataFrame(rows, columns=["rb", "cb", "g"])

    gblobs = targets.groupBy("cbk").applyInPandas(col_pass, g_schema)

    def row_pass(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rb = int(key[0])
        y0 = rb * row_block
        nrows = min(row_block, height - y0)
        g = np.full((nrows, width), np.inf)
        for _, row in pdf.iterrows():
            cb = int(row["cb"])
            x0 = cb * col_block
            ncols = min(col_block, width - x0)
            g[:, x0 : x0 + ncols] = np.frombuffer(
                row["g"], dtype=np.float64
            ).reshape(nrows, ncols)
        frames = []
        for i in range(nrows):
            D2 = _edt_1d_sq(g[i] * g[i])
            fin = np.isfinite(D2)
            xs = np.nonzero(fin)[0]
            frames.append(
                pd.DataFrame(
                    {
                        "gx": xs,
                        "gy": np.full(xs.size, y0 + i, dtype=np.int64),
                        "dist": np.round(np.sqrt(D2[fin]), 6),
                    }
                )
            )
        return (
            pd.concat(frames)
            if frames
            else pd.DataFrame({"gx": [], "gy": [], "dist": []})
        )

    return gblobs.groupBy("rb").applyInPandas(row_pass, out_schema)


def dem_metric_tiles(
    tiles: DataFrame,
    metric: str,
    tile_size: int,
    width: int,
    height: int,
) -> DataFrame:
    """gdaldem terrain metrics over the 3×3 neighborhood
    (apps/gdaldem_lib.cpp kernels), same halo exchange as slope:

    - ``tri_riley``  — sqrt(Σ (z_i − z_c)²) over the 8 neighbors
      (Riley et al., the reference's default -alg)
    - ``tri_wilson`` — Σ |z_i − z_c| / 8 (the -alg Wilson variant)
    - ``tpi``        — z_c − mean(8 neighbors)
    - ``roughness``  — max(3×3) − min(3×3)

    All four are exact over integer DEMs (sums, /8, and max−min are
    exact doubles; sqrt is a single correctly-rounded op), which is
    what makes the DuckDB oracles bitwise-comparable.  Interior pixels
    only, as the reference without -compute_edges."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size

    def kern(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 2
        z = padded
        c = slice(1, 1 + ts)
        lo = slice(0, ts)
        hi = slice(2, 2 + ts)
        zc = z[c, c]
        nbrs = [
            z[lo, lo], z[lo, c], z[lo, hi],
            z[c, lo], z[c, hi],
            z[hi, lo], z[hi, c], z[hi, hi],
        ]
        if metric == "tri_riley":
            acc = np.zeros_like(zc)
            for n in nbrs:
                d = n - zc
                acc += d * d
            return np.sqrt(acc)
        if metric == "tri_wilson":
            acc = np.zeros_like(zc)
            for n in nbrs:
                acc += np.abs(n - zc)
            return acc / 8.0
        if metric == "tpi":
            acc = np.zeros_like(zc)
            for n in nbrs:
                acc += n
            return zc - acc / 8.0
        if metric == "roughness":
            mx = zc.copy()
            mn = zc.copy()
            for n in nbrs:
                np.maximum(mx, n, out=mx)
                np.minimum(mn, n, out=mn)
            return mx - mn
        raise ValueError(metric)

    out = _apply_focal(tiles, tile_size, 1, ntx, nty, kern)
    return out.filter(
        (F.col("gx") > 0)
        & (F.col("gx") < width - 1)
        & (F.col("gy") > 0)
        & (F.col("gy") < height - 1)
    )


def dem_aspect_tiles(
    tiles: DataFrame, tile_size: int, width: int, height: int
) -> DataFrame:
    """gdaldem aspect (apps/gdaldem_lib.cpp:1441-1468, GDALAspectAlg
    with angle-as-azimuth): dx = (E column, mid doubled) − (W column),
    dy = (S row) − (N row); aspect = atan2(dy, −dx)°, remapped to a
    compass azimuth (>90 → 450−a, else 90−a); flat cells (dx=dy=0)
    emit nothing (nodata).  Returns (gx, gy, az, dx, dy) — dx/dy ride
    along so exact-integer oracles can classify the azimuth octant
    without transcendental parity."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    out_schema = T.StructType(
        [
            T.StructField("gx", T.LongType()),
            T.StructField("gy", T.LongType()),
            T.StructField("az", T.DoubleType()),
            T.StructField("dx", T.DoubleType()),
            T.StructField("dy", T.DoubleType()),
        ]
    )
    ts_ = tile_size
    strips = _emit_strips(tiles, ts_, 1, ntx, nty)

    def per_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        z = _assemble_padded(pdf, ts_, 1)
        c = slice(1, 1 + ts_)
        lo = slice(0, ts_)
        hi = slice(2, 2 + ts_)
        dx = (z[lo, hi] + 2.0 * z[c, hi] + z[hi, hi]) - (
            z[lo, lo] + 2.0 * z[c, lo] + z[hi, lo]
        )
        dy = (z[hi, lo] + 2.0 * z[hi, c] + z[hi, hi]) - (
            z[lo, lo] + 2.0 * z[lo, c] + z[lo, hi]
        )
        a = np.degrees(np.arctan2(dy, -dx))
        az = np.where(a > 90.0, 450.0 - a, 90.0 - a)
        flat = (dx == 0) & (dy == 0)
        gx = np.arange(ts_) + tx * ts_
        gy = np.arange(ts_) + ty * ts_
        GX, GY = np.meshgrid(gx, gy)
        keep = (
            ~flat
            & (GX > 0) & (GX < width - 1) & (GY > 0) & (GY < height - 1)
        )
        ys, xs = np.nonzero(keep)
        return pd.DataFrame(
            {
                "gx": GX[ys, xs],
                "gy": GY[ys, xs],
                "az": az[ys, xs],
                "dx": dx[ys, xs],
                "dy": dy[ys, xs],
            }
        )

    return strips.groupBy("tx", "ty").applyInPandas(per_tile, out_schema)


def hillshade_tiles(
    tiles: DataFrame,
    tile_size: int,
    width: int,
    height: int,
    azimuth: float = 315.0,
    altitude: float = 45.0,
) -> DataFrame:
    """gdaldem hillshade, Horn derivatives, ZEVENBERGEN off
    (apps/gdaldem_lib.cpp:882-896, 1030-1036; combined/multidirectional/
    igor live in hillshade_multidirectional_tiles + queries q245-q247):

        cang·254 = (254·sinα − (q·254·cosAz·cosα − p·254·sinAz·cosα))
                   / sqrt(1 + p² + q²)
        out = 1.0 if cang·254 ≤ 0 else 1.0 + cang·254

    with p, q the Horn /8 derivatives (z-factor 1, unit resolution; the
    reference folds scale into its precomputed constants the same way,
    but evaluates in float32 — we stay float64 end-to-end).  The trig
    constants are evaluated ONCE here and inlined into the SQL oracle
    verbatim, so both engines run the identical IEEE expression."""
    import math

    c1 = 254.0 * math.sin(math.radians(altitude))
    c2 = 254.0 * math.cos(math.radians(azimuth)) * math.cos(math.radians(altitude))
    c3 = 254.0 * math.sin(math.radians(azimuth)) * math.cos(math.radians(altitude))
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size

    def kern(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 2
        z = padded
        c = slice(1, 1 + ts)
        lo = slice(0, ts)
        hi = slice(2, 2 + ts)
        p = (
            (z[lo, hi] + 2.0 * z[c, hi] + z[hi, hi])
            - (z[lo, lo] + 2.0 * z[c, lo] + z[hi, lo])
        ) / 8.0
        q = (
            (z[hi, lo] + 2.0 * z[hi, c] + z[hi, hi])
            - (z[lo, lo] + 2.0 * z[lo, c] + z[lo, hi])
        ) / 8.0
        cang254 = (c1 - (q * c2 - p * c3)) / np.sqrt((1.0 + p * p) + q * q)
        return np.where(cang254 <= 0.0, 1.0, 1.0 + cang254)

    out = _apply_focal(tiles, tile_size, 1, ntx, nty, kern)
    return out.filter(
        (F.col("gx") > 0)
        & (F.col("gx") < width - 1)
        & (F.col("gy") > 0)
        & (F.col("gy") < height - 1)
    )



def hillshade_sql_consts(azimuth: float = 315.0, altitude: float = 45.0):
    """The exact double constants the kernel uses, as SQL literals."""
    import math

    c1 = 254.0 * math.sin(math.radians(altitude))
    c2 = 254.0 * math.cos(math.radians(azimuth)) * math.cos(math.radians(altitude))
    c3 = 254.0 * math.sin(math.radians(azimuth)) * math.cos(math.radians(altitude))
    return repr(c1), repr(c2), repr(c3)


def hillshade_multidirectional_tiles(
    tiles: DataFrame,
    tile_size: int,
    width: int,
    height: int,
    altitude: float = 45.0,
) -> DataFrame:
    """gdaldem hillshade -multidirectional (USGS OF 92-422; the
    reference's GDALHillshadeMultiDirectionalAlg,
    apps/gdaldem_lib.cpp:1259-1315): the weighted blend of shades from
    azimuths 225/270/315/360 where the weights sin^2(aspect - az)
    reduce to RATIONAL functions of the Horn gradients — so the whole
    pixel function is +,-,*,/ and one IEEE sqrt, mirrorable bitwise.
    Spec pinned float64 with z=1, unit resolution (yres -1), Horn:
    x = -8p, y = -8q with p,q the repo's /8 Horn derivatives; the trig
    constants are evaluated once and inlined verbatim in the oracle."""
    import math

    s127, c225, cz, sqz = hillshade_md_consts_values(altitude)
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size

    def kern(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 2
        z = padded
        c = slice(1, 1 + ts)
        lo = slice(0, ts)
        hi = slice(2, 2 + ts)
        p = (
            (z[lo, hi] + 2.0 * z[c, hi] + z[hi, hi])
            - (z[lo, lo] + 2.0 * z[c, lo] + z[hi, lo])
        ) / 8.0
        q = (
            (z[hi, lo] + 2.0 * z[hi, c] + z[hi, hi])
            - (z[lo, lo] + 2.0 * z[lo, c] + z[lo, hi])
        ) / 8.0
        x = -8.0 * p
        y = -8.0 * q
        xx = x * x
        yy = y * y
        xxyy = xx + yy
        v225 = s127 + (x - y) * c225
        v225 = np.where(v225 <= 0.0, 0.0, v225)
        v270 = s127 - x * cz
        v270 = np.where(v270 <= 0.0, 0.0, v270)
        v315 = s127 + (x + y) * c225
        v315 = np.where(v315 <= 0.0, 0.0, v315)
        v360 = s127 - y * cz
        v360 = np.where(v360 <= 0.0, 0.0, v360)
        w225 = 0.5 * xxyy - x * y
        w315 = xxyy - w225
        num = (w225 * v225 + xx * v270 + w315 * v315 + yy * v360)
        with np.errstate(invalid="ignore", divide="ignore"):
            cang = 1.0 + (num / xxyy) / np.sqrt(1.0 + sqz * xxyy)
        return np.where(xxyy == 0.0, 1.0 + 2.0 * s127, cang)

    out = _apply_focal(tiles, tile_size, 1, ntx, nty, kern)
    return out.filter(
        (F.col("gx") > 0)
        & (F.col("gx") < width - 1)
        & (F.col("gy") > 0)
        & (F.col("gy") < height - 1)
    )


def horn_pq_tiles(
    tiles: DataFrame,
    tile_size: int,
    width: int,
    height: int,
) -> DataFrame:
    """The exact dyadic Horn /8 derivatives as a (gx, gy, p, q)
    DataFrame (interior pixels only) — the shared front end for the
    transcendental hillshade variants (igor/combined), whose atan/
    acos then run as JVM Columns so the engine and the SQL oracle
    call the same class of libm (the NumPy vectorized routines
    diverge from DuckDB's scalar libm ~30x more often)."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size

    def kern_p(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 2
        z = padded
        c, lo, hi = slice(1, 1 + ts), slice(0, ts), slice(2, 2 + ts)
        return (
            (z[lo, hi] + 2.0 * z[c, hi] + z[hi, hi])
            - (z[lo, lo] + 2.0 * z[c, lo] + z[hi, lo])
        ) / 8.0

    def kern_q(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 2
        z = padded
        c, lo, hi = slice(1, 1 + ts), slice(0, ts), slice(2, 2 + ts)
        return (
            (z[hi, lo] + 2.0 * z[hi, c] + z[hi, hi])
            - (z[lo, lo] + 2.0 * z[lo, c] + z[lo, hi])
        ) / 8.0

    keep_all = lambda res: np.ones_like(res, dtype=bool)  # noqa: E731
    p = _apply_focal(tiles, tile_size, 1, ntx, nty, kern_p, keep=keep_all)
    q = _apply_focal(tiles, tile_size, 1, ntx, nty, kern_q, keep=keep_all)
    interior = (
        (F.col("gx") > 0) & (F.col("gx") < width - 1)
        & (F.col("gy") > 0) & (F.col("gy") < height - 1)
    )
    return (
        p.filter(interior).withColumnRenamed("v", "p")
        .join(q.filter(interior).withColumnRenamed("v", "q"), ["gx", "gy"])
    )


def zt_pq_tiles(
    tiles: DataFrame,
    tile_size: int,
    width: int,
    height: int,
) -> DataFrame:
    """Zevenbergen–Thorne central-difference derivatives as a
    (gx, gy, p, q) DataFrame, interior pixels only: p = (E − W)/2 and
    q = (S − N)/2 — the 4-rook-neighbor alternative to Horn's
    weighted-8 stencil (apps/gdaldem_lib.cpp
    GDALSlopeZevenbergenThorneAlg:1390 / AspectZT:1482, where
    dx = W − E = −2p and dy = S − N = 2q at unit resolution).
    Integer DEMs keep p, q exactly dyadic on both engines."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size

    def kern_p(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 2
        z = padded
        c, lo, hi = slice(1, 1 + ts), slice(0, ts), slice(2, 2 + ts)
        return (z[c, hi] - z[c, lo]) / 2.0

    def kern_q(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 2
        z = padded
        c, lo, hi = slice(1, 1 + ts), slice(0, ts), slice(2, 2 + ts)
        return (z[hi, c] - z[lo, c]) / 2.0

    keep_all = lambda res: np.ones_like(res, dtype=bool)  # noqa: E731
    p = _apply_focal(tiles, tile_size, 1, ntx, nty, kern_p, keep=keep_all)
    q = _apply_focal(tiles, tile_size, 1, ntx, nty, kern_q, keep=keep_all)
    interior = (
        (F.col("gx") > 0) & (F.col("gx") < width - 1)
        & (F.col("gy") > 0) & (F.col("gy") < height - 1)
    )
    return (
        p.filter(interior).withColumnRenamed("v", "p")
        .join(q.filter(interior).withColumnRenamed("v", "q"), ["gx", "gy"])
    )


def zt_curvature_tiles(
    tiles: DataFrame,
    tile_size: int,
    width: int,
    height: int,
) -> DataFrame:
    """Zevenbergen–Thorne SECOND derivatives as (gx, gy, r, t, s):
    r = E + W − 2C (x-curvature), t = N + S − 2C (y-curvature),
    s = NE − NW − SE + SW (cross term, ×4 scaling folded into the
    caller's contract) — the quadratic-surface coefficients the ZT
    paper fits, kept EXACT INTEGER on integer DEMs.  Interior
    pixels only; same halo front end as :func:`horn_pq_tiles`."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size

    def mk(which):
        def kern(padded: np.ndarray) -> np.ndarray:
            ts = padded.shape[0] - 2
            z = padded.astype(np.int64)
            c, lo, hi = slice(1, 1 + ts), slice(0, ts), slice(2, 2 + ts)
            if which == "r":
                out = z[c, hi] + z[c, lo] - 2 * z[c, c]
            elif which == "t":
                out = z[hi, c] + z[lo, c] - 2 * z[c, c]
            else:
                out = z[lo, hi] - z[lo, lo] - z[hi, hi] + z[hi, lo]
            return out.astype(np.float64)
        return kern

    keep_all = lambda res: np.ones_like(res, dtype=bool)  # noqa: E731
    parts = {}
    for which in ("r", "t", "s"):
        parts[which] = _apply_focal(
            tiles, tile_size, 1, ntx, nty, mk(which), keep=keep_all
        ).withColumnRenamed("v", which)
    interior = (
        (F.col("gx") > 0) & (F.col("gx") < width - 1)
        & (F.col("gy") > 0) & (F.col("gy") < height - 1)
    )
    out = parts["r"].filter(interior)
    for which in ("t", "s"):
        out = out.join(parts[which].filter(interior), ["gx", "gy"])
    return out


# D8 neighbor table in PINNED priority order (first max wins):
# E, SE, S, SW, W, NW, N, NE with ESRI codes 1,2,4,...,128.
D8_NEIGHBORS = [
    (1, 0, 1), (1, 1, 2), (0, 1, 4), (-1, 1, 8),
    (-1, 0, 16), (-1, -1, 32), (0, -1, 64), (1, -1, 128),
]


def d8_flow_tiles(
    tiles: DataFrame,
    tile_size: int,
    width: int,
    height: int,
) -> DataFrame:
    """D8 steepest-descent flow direction (the hydrology primitive on
    top of the gdaldem stencil family): each interior cell points at
    the neighbor with the largest positive drop-per-distance, with
    the sqrt(2) diagonal distance removed EXACTLY by comparing
    2*d^2 (cardinal) vs d^2 (diagonal) — squared-slope
    cross-multiplication, no float root; only positive drops
    compete and cells with none are sinks/flats (code 0).  Ties
    resolve to the FIRST direction in the pinned E,SE,S,SW,W,NW,N,NE
    order via the integer argmax encoding max(key*8 + (7-i)) — the
    same order-free map-side trick as the q415 struct argmin.
    Returns (gx, gy, v=code) for interior cells."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size

    def kern(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 2
        z = padded.astype(np.int64)
        c = z[1:1 + ts, 1:1 + ts]
        best = np.full(c.shape, -1, dtype=np.int64)
        for i, (dx, dy, _code) in enumerate(D8_NEIGHBORS):
            n = z[1 + dy:1 + dy + ts, 1 + dx:1 + dx + ts]
            d = c - n
            key = (2 - (dx != 0 and dy != 0)) * d * d
            enc = np.where(d > 0, key * 8 + (7 - i), -1)
            best = np.maximum(best, enc)
        codes = np.zeros(c.shape, dtype=np.float64)
        for i, (_dx, _dy, code) in enumerate(D8_NEIGHBORS):
            codes = np.where((best >= 0) & (best % 8 == 7 - i),
                             float(code), codes)
        return codes

    keep_all = lambda res: np.ones_like(res, dtype=bool)  # noqa: E731
    out = _apply_focal(tiles, tile_size, 1, ntx, nty, kern, keep=keep_all)
    interior = (
        (F.col("gx") > 0) & (F.col("gx") < width - 1)
        & (F.col("gy") > 0) & (F.col("gy") < height - 1)
    )
    return out.filter(interior)


def hillshade_md_consts_values(altitude: float = 45.0):
    """The multidirectional constants (float64): s127 = 127 sin(alt),
    c225 = cos(225 deg) * cos(alt)/8 * 127, cz = 127 cos(alt)/8,
    sqz = (1/8)^2."""
    import math

    z_factor = 1.0 / 8.0
    cos_alt_mul_z = math.cos(math.radians(altitude)) * z_factor
    s127 = 127.0 * math.sin(math.radians(altitude))
    c225 = math.cos(math.radians(225.0)) * cos_alt_mul_z * 127.0
    cz = 127.0 * cos_alt_mul_z
    sqz = z_factor * z_factor
    return s127, c225, cz, sqz


def color_relief_tiles(
    tiles: DataFrame,
    ramp: list[tuple],
    tile_size: int,
    width: int,
    height: int,
) -> DataFrame:
    """gdaldem color-relief, linear interpolation mode
    (apps/gdaldem_lib.cpp:1784-1801): between ramp entries each channel
    is ``clamp(int(0.5 + c0 + ratio·(c1−c0)), 0, 255)`` with
    ratio = (v−e0)/(e1−e0); below/above the ramp clamps to the end
    colors.  ``ramp``: sorted [(elevation, r, g, b)].  Pure per-pixel
    map — no halo, no shuffle; returns (gx, gy, r, g, b)."""
    evals = np.array([e for e, *_ in ramp], dtype=np.float64)
    chans = np.array([c for _, *c in ramp], dtype=np.float64)  # (n, 3)
    ts_ = tile_size
    out_schema = T.StructType(
        [
            T.StructField("gx", T.LongType()),
            T.StructField("gy", T.LongType()),
            T.StructField("r", T.IntegerType()),
            T.StructField("g", T.IntegerType()),
            T.StructField("b", T.IntegerType()),
        ]
    )

    def gen(pdf_iter):
        for pdf in pdf_iter:
            frames = []
            for _, row in pdf.iterrows():
                v = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
                    ts_, ts_
                ).astype(np.float64)
                tx, ty = int(row["tx"]), int(row["ty"])
                idx = np.clip(np.searchsorted(evals, v, side="left"), 1, len(evals) - 1)
                e0, e1 = evals[idx - 1], evals[idx]
                ratio = np.clip((v - e0) / (e1 - e0), 0.0, 1.0)
                cols = []
                for ch in range(3):
                    c0 = chans[idx - 1, ch]
                    c1 = chans[idx, ch]
                    cols.append(
                        np.clip(np.floor(0.5 + c0 + ratio * (c1 - c0)), 0, 255).astype(
                            np.int32
                        )
                    )
                gx = np.arange(ts_) + tx * ts_
                gy = np.arange(ts_) + ty * ts_
                GX, GY = np.meshgrid(gx, gy)
                keep = (GX < width) & (GY < height)
                ys, xs = np.nonzero(keep)
                frames.append(
                    pd.DataFrame(
                        {
                            "gx": GX[ys, xs],
                            "gy": GY[ys, xs],
                            "r": cols[0][ys, xs],
                            "g": cols[1][ys, xs],
                            "b": cols[2][ys, xs],
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"gx": [], "gy": [], "r": [], "g": [], "b": []}
            )

    return tiles.mapInPandas(gen, out_schema)


def fillnodata_tiles(
    tiles: DataFrame,
    tile_size: int,
    width: int,
    height: int,
    max_dist: int = 4,
    nodata: float = 0.0,
) -> DataFrame:
    """Nodata hole filling — the ``GDALFillNodata`` entry point
    (alg/fillnodata.cpp; the reference interpolates from nearest found
    pixels in up to 8 search directions).  Pinned semantics here: each
    nodata pixel takes the VALUE OF ITS NEAREST VALID PIXEL within
    ``max_dist``, ties broken by smallest (d², global row, global col)
    — fully deterministic, so an ANSI-SQL argmin oracle can check it
    exactly (the reference's directional-IDW variant drops into the
    same halo kernel).

    Bounded distance ⇒ bounded halo: one strip exchange of
    ``max_dist``-wide borders, then a per-tile first-win sweep over
    the (2r+1)² offsets in (d², Δy, Δx) order — for a fixed pixel that
    ordering IS the (d², row, col) tie-break.  Returns per-pixel
    (gx, gy, v) for all non-nodata output pixels."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    r = max_dist
    offsets = sorted(
        (
            (dx * dx + dy * dy, dy, dx)
            for dx in range(-r, r + 1)
            for dy in range(-r, r + 1)
            if (dx or dy) and dx * dx + dy * dy <= r * r
        )
    )

    def kern(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 2 * r
        valid = padded != nodata
        out = padded[r : r + ts, r : r + ts].copy()
        done = valid[r : r + ts, r : r + ts].copy()
        for _d2, dy, dx in offsets:
            if done.all():
                break
            sel = ~done & valid[r + dy : r + dy + ts, r + dx : r + dx + ts]
            out[sel] = padded[r + dy : r + dy + ts, r + dx : r + dx + ts][sel]
            done |= sel
        out[~done] = nodata
        return out

    res = _apply_focal(
        tiles, tile_size, r, ntx, nty, kern,
        pad_fill=nodata, keep=lambda a: a != nodata,
    )
    return res.filter((F.col("gx") < width) & (F.col("gy") < height))


# Fixed direction order (E, W, S, N, SE, SW, NE, NW with gy down) —
# the IDW accumulation is a left-associated chain in THIS order on
# both engines, so the doubles match bitwise.
_IDW_DIRS = ((1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (-1, 1), (1, -1), (-1, -1))


def fillnodata_idw_tiles(
    tiles: DataFrame,
    tile_size: int,
    width: int,
    height: int,
    max_dist: int = 4,
    nodata: float = 0.0,
) -> DataFrame:
    """The reference's DEFAULT ``GDALFillNodata`` shape
    (alg/fillnodata.cpp): interpolate each nodata pixel from the
    nearest valid pixel found along each of 8 search directions,
    inverse-distance weighted.  Pinned semantics: walk ≤ ``max_dist``
    unit steps per direction, stop at the first valid pixel, weight =
    1/d² with d² = (dx²+dy²)·k² (integer — keeps every term a single
    IEEE division), accumulate num/den in the fixed ``_IDW_DIRS``
    order, fill = num/den when any direction found.  Same bounded-halo
    strip exchange as ``fillnodata_tiles``; smoothing iterations (the
    reference's optional 3×3 post-pass) are not applied."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    r = max_dist

    def kern(padded: np.ndarray) -> np.ndarray:
        ts = padded.shape[0] - 2 * r
        valid = padded != nodata
        center_valid = valid[r : r + ts, r : r + ts]
        num = np.zeros((ts, ts))
        den = np.zeros((ts, ts))
        for dx, dy in _IDW_DIRS:
            found = np.zeros((ts, ts), dtype=bool)
            vdir = np.zeros((ts, ts))
            dd2 = np.ones((ts, ts))
            for k in range(1, r + 1):
                sh = padded[r + dy * k : r + dy * k + ts, r + dx * k : r + dx * k + ts]
                shv = valid[r + dy * k : r + dy * k + ts, r + dx * k : r + dx * k + ts]
                sel = ~found & shv
                vdir[sel] = sh[sel]
                dd2[sel] = float(dx * dx + dy * dy) * k * k
                found |= sel
            num = num + np.where(found, vdir / dd2, 0.0)
            den = den + np.where(found, 1.0 / dd2, 0.0)
        out = padded[r : r + ts, r : r + ts].copy()
        fill = ~center_valid & (den > 0)
        out[fill] = (num / den)[fill]
        return out

    res = _apply_focal(
        tiles, tile_size, r, ntx, nty, kern,
        pad_fill=nodata, keep=lambda a: a != nodata,
    )
    return res.filter((F.col("gx") < width) & (F.col("gy") < height))
