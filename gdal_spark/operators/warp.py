"""gdalwarp-style resample of the distributed tile table onto an
arbitrary target grid.

Reference: GDALWarpOperation chunks the TARGET raster, back-projects
each chunk's bbox into source pixel space, reads the covering source
window, and runs the resample kernel per chunk
(alg/gdalwarpoperation.cpp:611-613 chunk split, :967 window compute;
kernels alg/gdalwarpkernel.cpp — GWKNearestNoMasks / GWKBilinear).

Distributed decomposition (target-driven, like the reference):

  1. enumerate target tiles and compute, with pure column arithmetic
     (no UDF), the source-tile index range each one needs — the affine
     back-projection of the tile's pixel-center extent, expanded by one
     source pixel for bilinear support;
  2. explode the ranges and equi-join the source tile table — each
     source tile is shipped only to the target tiles whose windows it
     intersects (for a same-scale warp that's the 1-4 neighbors, an
     O(1) fan-out; a big downsample fans in, which is the true data
     motion of any warp);
  3. ``groupBy(dst tile).applyInPandas``: paste the received source
     tiles into a fill-initialized window and evaluate the resample
     kernel vectorized over the whole tile.

Rotation-free affines take a separable fast path (per-axis
column-arithmetic bounds, 1-D sample coordinates); ROTATED affines
(either side) back-project each dst tile's 4 corners through the full
2x2 inverse and join the conservative bbox of the resulting source
parallelogram.

Pixel-coordinate conventions (pinned for oracles, identical to the
reference): target pixel (i, j) has center world coords
``gd0 + (i+0.5)·gd1, gd3 + (j+0.5)·gd5``; source fractional pixel
``u = (X − gs0)/gs1``.  NEAREST takes ``floor(u)``
(GWKNearestNoMasks); BILINEAR samples at ``u − 0.5`` between the four
surrounding pixel centers, missing pixels reading as ``fill``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TILE_SCHEMA = T.StructType(
    [
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("dtype", T.StringType()),
    ]
)


def _axis_bounds(gd_off, gd_scale, gs_off, gs_scale, ts, n_dst, method):
    """Column expressions for the source-pixel range a dst tile needs
    along one axis (``method`` in nearest|bilinear|cubic).  Returns
    (lo_expr, hi_expr) as functions of the dst tile index column."""

    def bounds(dt_col):
        i0 = dt_col * ts
        i1 = F.least(i0 + ts, F.lit(n_dst)) - 1
        if method in (
            "average", "mode", "rms", "min", "max", "med", "q1", "q3", "sum"
        ):
            # footprint methods read src pixels whose CENTERS fall in
            # the dst pixel's edge-to-edge span — bound by the tile's
            # outer edges, padded one pixel (conservative is harmless)
            ua = (F.lit(gd_off) + i0.cast("double") * gd_scale - gs_off) / gs_scale
            ub = (
                F.lit(gd_off) + (i1.cast("double") + 1.0) * gd_scale - gs_off
            ) / gs_scale
            umin, umax = F.least(ua, ub), F.greatest(ua, ub)
            return (F.floor(umin) - 1).cast("long"), (F.floor(umax) + 1).cast("long")
        ua = (F.lit(gd_off) + (i0 + 0.5) * gd_scale - gs_off) / gs_scale
        ub = (F.lit(gd_off) + (i1.cast("double") + 0.5) * gd_scale - gs_off) / gs_scale
        umin, umax = F.least(ua, ub), F.greatest(ua, ub)
        if method == "lanczos":
            lo = F.floor(umin - 0.5) - 2
            hi = F.floor(umax - 0.5) + 3
        elif method == "cubic":
            lo = F.floor(umin - 0.5) - 1
            hi = F.floor(umax - 0.5) + 2
        elif method == "bilinear":
            lo = F.floor(umin - 0.5)
            hi = F.floor(umax - 0.5) + 1
        else:
            lo = F.floor(umin)
            hi = F.floor(umax)
        return lo.cast("long"), hi.cast("long")

    return bounds


_CUBIC_A = -0.5


def lanczos_weights_norm(frac: float) -> list[float]:
    """Normalized 6-tap Lanczos (radius 3) weights for fractional
    sample offset ``frac`` ∈ [0, 1): taps at offsets −2..+3 from
    floor(sample), w(d) = sinc(d)·sinc(d/3), normalized by the tap
    sum — GWKLanczosSinc + the accumulator-weight division of
    GWKResample (alg/gdalwarpkernel.cpp).  Plain Python floats so
    oracle SQL can inline repr() verbatim (bitwise both engines)."""
    import math

    raw = []
    for m in range(-2, 4):
        d = frac - m
        if d == 0.0:
            raw.append(1.0)
        elif abs(d) >= 3.0:
            raw.append(0.0)
        else:
            raw.append(
                math.sin(math.pi * d) / (math.pi * d)
                * math.sin(math.pi * d / 3.0) / (math.pi * d / 3.0)
            )
    s = sum(raw)
    return [w / s for w in raw]


def _cubic_weights(t: np.ndarray):
    """Keys cubic-convolution weights, A = −0.5 (the reference's
    GRA_Cubic kernel, alg/gdalwarpkernel.cpp CubicConvolution): taps at
    offsets −1, 0, +1, +2 from floor(sample).  Horner forms are kept
    identical in the SQL oracles."""
    A = _CUBIC_A
    d0 = t + 1.0
    w0 = A * (d0 * (d0 * (d0 - 5.0) + 8.0) - 4.0)
    w1 = t * t * ((A + 2.0) * t - (A + 3.0)) + 1.0
    d2 = 1.0 - t
    w2 = d2 * d2 * ((A + 2.0) * d2 - (A + 3.0)) + 1.0
    d3 = 2.0 - t
    w3 = A * (d3 * (d3 * (d3 - 5.0) + 8.0) - 4.0)
    return w0, w1, w2, w3


def warp_resample(
    tiles: DataFrame,
    gt_src: tuple[float, ...],
    gt_dst: tuple[float, ...],
    dst_width: int,
    dst_height: int,
    tile_size: int = 256,
    src_tile_size: int | None = None,
    method: str = "nearest",
    fill: float = 0.0,
    src_width: int | None = None,
    src_height: int | None = None,
) -> DataFrame:
    """Resample source tiles onto the target grid → target tile rows
    (tx, ty, data float64, dtype).  Target tiles whose window touches
    no source tile are omitted (all-``fill``), keeping the tile table
    sparse.

    ``src_width``/``src_height`` (when given) bound the VALID source
    raster for the footprint methods: out-of-raster cells are excluded
    from average/mode/rms contributor counts, and a dst pixel whose
    footprint has no valid contributor emits ``fill`` — the reference's
    GWKAverageOrMode writes nodata on an empty footprint and skips
    out-of-bounds source pixels (alg/gdalwarpkernel.cpp).  When omitted
    the tile table itself is taken as the universe (every window cell
    counts, matching dense interior fixtures)."""
    if method not in (
        "nearest", "bilinear", "cubic", "lanczos", "average", "mode", "rms",
        "min", "max", "med", "q1", "q3", "sum",
    ):
        raise ValueError(method)
    spark = tiles.sparkSession
    ts = tile_size
    sts = src_tile_size or tile_size
    bilinear = method == "bilinear"
    cubic = method == "cubic"
    lanczos = method == "lanczos"
    footprint = method in (
        "average", "mode", "rms", "min", "max", "med", "q1", "q3", "sum"
    )
    rotated = gt_src[2] != 0 or gt_src[4] != 0 or gt_dst[2] != 0 or gt_dst[4] != 0
    det = gt_src[1] * gt_src[5] - gt_src[2] * gt_src[4]
    ndtx = (dst_width + ts - 1) // ts
    ndty = (dst_height + ts - 1) // ts

    dst = spark.range(ndtx * ndty).select(
        (F.col("id") % ndtx).alias("dtx"), (F.col("id") / ndtx).cast("long").alias("dty")
    )
    if not rotated:
        xb = _axis_bounds(gt_dst[0], gt_dst[1], gt_src[0], gt_src[1], ts, dst_width, method)
        yb = _axis_bounds(gt_dst[3], gt_dst[5], gt_src[3], gt_src[5], ts, dst_height, method)
        sx_lo, sx_hi = xb(F.col("dtx"))
        sy_lo, sy_hi = yb(F.col("dty"))
    else:
        # rotated affine: the dst tile's (u, v) extremes are at its 4
        # pixel-center corners (the map is affine) — pure column math
        gs0_, gs1_, gs2_, gs3_, gs4_, gs5_ = gt_src
        gd0_, gd1_, gd2_, gd3_, gd4_, gd5_ = gt_dst

        def corner_uv(icol, jcol):
            X = F.lit(gd0_) + (icol + 0.5) * gd1_ + (jcol + 0.5) * gd2_
            Y = F.lit(gd3_) + (icol + 0.5) * gd4_ + (jcol + 0.5) * gd5_
            u = (F.lit(gs5_) * (X - gs0_) - F.lit(gs2_) * (Y - gs3_)) / det
            v = (F.lit(-gs4_) * (X - gs0_) + F.lit(gs1_) * (Y - gs3_)) / det
            return u, v

        i0 = (F.col("dtx") * ts).cast("double")
        i1 = (F.least(F.col("dtx") * ts + ts, F.lit(dst_width)) - 1).cast("double")
        j0 = (F.col("dty") * ts).cast("double")
        j1 = (F.least(F.col("dty") * ts + ts, F.lit(dst_height)) - 1).cast("double")
        us, vs = [], []
        if footprint:
            # footprint methods need the tile's EDGE extent (pixel
            # corners, not centers): corner_uv adds the +0.5 center
            # offset, so shifting the extreme indices by ∓0.5 lands on
            # the outer edges i0 .. i1+1
            ic_pair, jc_pair = (i0 - 0.5, i1 + 0.5), (j0 - 0.5, j1 + 0.5)
        else:
            ic_pair, jc_pair = (i0, i1), (j0, j1)
        for ic in ic_pair:
            for jc in jc_pair:
                u_, v_ = corner_uv(ic, jc)
                us.append(u_)
                vs.append(v_)
        umin, umax = F.least(*us), F.greatest(*us)
        vmin, vmax = F.least(*vs), F.greatest(*vs)
        margin = 3 if lanczos else (2 if cubic else (1 if bilinear or footprint else 0))
        off = 0.5 if (bilinear or cubic or lanczos) else 0.0
        sx_lo = (F.floor(umin - off) - margin).cast("long")
        sx_hi = (F.floor(umax - off) + margin).cast("long")
        sy_lo = (F.floor(vmin - off) - margin).cast("long")
        sy_hi = (F.floor(vmax - off) + margin).cast("long")
    mapping = (
        dst.withColumn("stx", F.explode(F.sequence(F.floor(sx_lo / sts), F.floor(sx_hi / sts))))
        .withColumn("sty", F.explode(F.sequence(F.floor(sy_lo / sts), F.floor(sy_hi / sts))))
        .select("dtx", "dty", "stx", "sty")
    )
    joined = mapping.join(
        tiles.select(
            F.col("tx").alias("stx"), F.col("ty").alias("sty"), "data", "dtype"
        ),
        ["stx", "sty"],
    )

    gs0, gs1, gs2, gs3, gs4, gs5 = gt_src
    gd0, gd1, gd2, gd3, gd4, gd5 = gt_dst

    def per_dst_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        dtx, dty = int(key[0]), int(key[1])
        i = np.arange(dtx * ts, min((dtx + 1) * ts, dst_width))
        j = np.arange(dty * ts, min((dty + 1) * ts, dst_height))
        if not rotated:
            # 1-D separable path kept verbatim: the oracle fixtures pin
            # these exact IEEE expressions (meshgrid only replicates)
            u = (gd0 + (i + 0.5) * gd1 - gs0) / gs1
            v = (gd3 + (j + 0.5) * gd5 - gs3) / gs5
            U, V = np.meshgrid(u, v)
        else:
            I, J = np.meshgrid(i + 0.5, j + 0.5)
            X = gd0 + I * gd1 + J * gd2
            Y = gd3 + I * gd4 + J * gd5
            U = (gs5 * (X - gs0) - gs2 * (Y - gs3)) / det
            V = (-gs4 * (X - gs0) + gs1 * (Y - gs3)) / det
        if footprint:
            if not rotated:
                # dst pixel footprint in src pixel space (axis-aligned):
                # src pixel k participates iff its center k+0.5 lies in
                # the half-open edge span [u_lo, u_hi)
                ux_l = (gd0 + i * gd1 - gs0) / gs1
                ux_r = (gd0 + (i + 1) * gd1 - gs0) / gs1
                uy_l = (gd3 + j * gd5 - gs3) / gs5
                uy_r = (gd3 + (j + 1) * gd5 - gs3) / gs5
                KX0_1d = np.ceil(np.minimum(ux_l, ux_r) - 0.5).astype(np.int64)
                KX1_1d = np.ceil(np.maximum(ux_l, ux_r) - 0.5).astype(np.int64)
                KY0_1d = np.ceil(np.minimum(uy_l, uy_r) - 0.5).astype(np.int64)
                KY1_1d = np.ceil(np.maximum(uy_l, uy_r) - 0.5).astype(np.int64)
                KX0, KY0 = np.meshgrid(KX0_1d, KY0_1d)
                KX1, KY1 = np.meshgrid(KX1_1d, KY1_1d)
            else:
                # ROTATED affine (GWKAverageOrMode's rule): back-project
                # the dst pixel's 4 CORNERS through the full inverse,
                # take the src-space bbox of the resulting quad, and
                # include every src pixel whose center falls in that
                # half-open bbox span — reduces exactly to the edge-span
                # rule above when rotation is zero.
                IE, JE = np.meshgrid(i.astype(np.float64), j.astype(np.float64))
                us_c, vs_c = [], []
                for ci in (IE, IE + 1.0):
                    for cj in (JE, JE + 1.0):
                        Xc = gd0 + ci * gd1 + cj * gd2
                        Yc = gd3 + ci * gd4 + cj * gd5
                        us_c.append((gs5 * (Xc - gs0) - gs2 * (Yc - gs3)) / det)
                        vs_c.append((-gs4 * (Xc - gs0) + gs1 * (Yc - gs3)) / det)
                UMIN, UMAX = np.minimum.reduce(us_c), np.maximum.reduce(us_c)
                VMIN, VMAX = np.minimum.reduce(vs_c), np.maximum.reduce(vs_c)
                KX0 = np.ceil(UMIN - 0.5).astype(np.int64)
                KX1 = np.ceil(UMAX - 0.5).astype(np.int64)
                KY0 = np.ceil(VMIN - 0.5).astype(np.int64)
                KY1 = np.ceil(VMAX - 0.5).astype(np.int64)
            x_lo, x_hi = int(KX0.min()), int(KX1.max()) - 1
            y_lo, y_hi = int(KY0.min()), int(KY1.max()) - 1
            x_hi = max(x_hi, x_lo)
            y_hi = max(y_hi, y_lo)
        elif lanczos:
            WX, WY = U - 0.5, V - 0.5
            x_lo = int(np.floor(WX.min())) - 2
            x_hi = int(np.floor(WX.max())) + 3
            y_lo = int(np.floor(WY.min())) - 2
            y_hi = int(np.floor(WY.max())) + 3
        elif cubic:
            WX, WY = U - 0.5, V - 0.5
            x_lo = int(np.floor(WX.min())) - 1
            x_hi = int(np.floor(WX.max())) + 2
            y_lo = int(np.floor(WY.min())) - 1
            y_hi = int(np.floor(WY.max())) + 2
        elif bilinear:
            WX, WY = U - 0.5, V - 0.5
            x_lo = int(np.floor(WX.min()))
            x_hi = int(np.floor(WX.max())) + 1
            y_lo = int(np.floor(WY.min()))
            y_hi = int(np.floor(WY.max())) + 1
        else:
            x_lo, x_hi = int(np.floor(U.min())), int(np.floor(U.max()))
            y_lo, y_hi = int(np.floor(V.min())), int(np.floor(V.max()))
        win = np.full((y_hi - y_lo + 1, x_hi - x_lo + 1), fill, dtype=np.float64)
        for _, row in pdf.iterrows():
            arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
                sts, sts
            )
            ox, oy = int(row["stx"]) * sts, int(row["sty"]) * sts
            ya, ybnd = max(y_lo, oy), min(y_hi + 1, oy + sts)
            xa, xbnd = max(x_lo, ox), min(x_hi + 1, ox + sts)
            if ya >= ybnd or xa >= xbnd:
                continue
            win[ya - y_lo : ybnd - y_lo, xa - x_lo : xbnd - x_lo] = arr[
                ya - oy : ybnd - oy, xa - ox : xbnd - ox
            ]
        if footprint:
            KX0 -= x_lo
            KX1 -= x_lo
            KY0 -= y_lo
            KY1 -= y_lo
            max_nx = int((KX1 - KX0).max(initial=0))
            max_ny = int((KY1 - KY0).max(initial=0))
            vals, valids = [], []
            for my in range(max_ny):
                iy = KY0 + my
                vy = iy < KY1
                # a contributor must lie INSIDE the source raster when
                # its bounds are known — window cells past the edge are
                # `fill` padding, not data (GWKAverageOrMode skips them)
                if src_height is not None:
                    gy_ = iy + y_lo
                    vy = vy & (gy_ >= 0) & (gy_ < src_height)
                for mx in range(max_nx):
                    ix = KX0 + mx
                    valid = vy & (ix < KX1)
                    if src_width is not None:
                        gx_ = ix + x_lo
                        valid = valid & (gx_ >= 0) & (gx_ < src_width)
                    iy_c = np.clip(iy, 0, win.shape[0] - 1)
                    ix_c = np.clip(ix, 0, win.shape[1] - 1)
                    vals.append(
                        win[np.where(valid, iy_c, 0), np.where(valid, ix_c, 0)]
                    )
                    valids.append(valid)
            cnt0 = np.zeros(U.shape)
            for m in valids:
                cnt0 += m
            cnt = np.maximum(cnt0, 1.0)
            if method == "average":
                s = np.zeros(U.shape)
                for v_arr, m in zip(vals, valids):
                    s += np.where(m, v_arr, 0.0)
                # empty footprint → fill (reference writes nodata when
                # the contributor count is 0, never 0.0)
                out = np.where(cnt0 > 0, s / cnt, fill)
            elif method == "rms":
                s2 = np.zeros(U.shape)
                for v_arr, m in zip(vals, valids):
                    s2 += np.where(m, v_arr * v_arr, 0.0)
                out = np.where(cnt0 > 0, np.sqrt(s2 / cnt), fill)
            elif method == "sum":
                # GRA_Sum: plain sum of valid contributors (the
                # center-inclusion footprint rule shared by the family)
                s = np.zeros(U.shape)
                for v_arr, m in zip(vals, valids):
                    s += np.where(m, v_arr, 0.0)
                out = np.where(cnt0 > 0, s, fill)
            elif method == "min":
                s = np.full(U.shape, np.inf)
                for v_arr, m in zip(vals, valids):
                    s = np.minimum(s, np.where(m, v_arr, np.inf))
                out = np.where(cnt0 > 0, s, fill)
            elif method == "max":
                s = np.full(U.shape, -np.inf)
                for v_arr, m in zip(vals, valids):
                    s = np.maximum(s, np.where(m, v_arr, -np.inf))
                out = np.where(cnt0 > 0, s, fill)
            elif method in ("med", "q1", "q3"):
                # GRA_Med / GRA_Q1 / GRA_Q3: the reference's quantile
                # pick over the SORTED footprint values is
                # idx = ceil(quant*n - 1), value = sorted[idx]
                # (alg/gdalwarpkernel.cpp:8338 GWKAOM_Quant) — exact
                # order statistic, no interpolation.
                quant = {"med": 0.5, "q1": 0.25, "q3": 0.75}[method]
                A = np.where(np.stack(valids), np.stack(vals), np.inf)
                A.sort(axis=0)
                idx = np.ceil(quant * cnt0 - 1.0).astype(np.int64)
                idx = np.clip(idx, 0, A.shape[0] - 1)
                picked = np.take_along_axis(A, idx[None, :, :], axis=0)[0]
                out = np.where(cnt0 > 0, picked, fill)
            else:  # mode, ties → SMALLEST value (pinned deterministic
                # contract; the reference's tie order is scan-order-
                # dependent and implementation-defined)
                V_arr = np.stack(vals)
                M_arr = np.stack(valids)
                best_cnt = np.full(U.shape, -1.0)
                best_val = np.full(U.shape, np.inf)
                for t in range(V_arr.shape[0]):
                    c = ((V_arr == V_arr[t]) & M_arr).sum(axis=0).astype(
                        np.float64
                    )
                    c = np.where(M_arr[t], c, -1.0)
                    v_t = np.where(M_arr[t], V_arr[t], np.inf)
                    upd = (c > best_cnt) | ((c == best_cnt) & (v_t < best_val))
                    best_cnt = np.where(upd, c, best_cnt)
                    best_val = np.where(upd, v_t, best_val)
                out = np.where(np.isfinite(best_val), best_val, fill)
        elif lanczos:
            X0 = np.floor(WX).astype(np.int64)
            Y0 = np.floor(WY).astype(np.int64)
            FX = WX - X0
            FY = WY - Y0
            X0 -= x_lo
            Y0 -= y_lo
            # per-DISTINCT-fraction weights through the same scalar
            # (math.sin) path the oracle literals come from — bitwise
            # on both engines; rational warp scales have O(1) distinct
            # fractions per tile
            def norm_w(FR):
                uf, inv = np.unique(FR, return_inverse=True)
                wtab = np.array(
                    [lanczos_weights_norm(float(f)) for f in uf]
                )  # (u, 6)
                return [wtab[:, m][inv].reshape(FR.shape) for m in range(6)]

            wxs = norm_w(FX)
            wys = norm_w(FY)
            out = np.zeros(U.shape)
            for jj, wyj in enumerate(wys):
                for ii, wxi in enumerate(wxs):
                    out += wyj * wxi * win[Y0 + (jj - 2), X0 + (ii - 2)]
        elif cubic:
            X0 = np.floor(WX).astype(np.int64)
            Y0 = np.floor(WY).astype(np.int64)
            FX = WX - X0
            FY = WY - Y0
            X0 -= x_lo
            Y0 -= y_lo
            wxs = _cubic_weights(FX)
            wys = _cubic_weights(FY)
            out = np.zeros(U.shape)
            for jj, wyj in enumerate(wys):
                for ii, wxi in enumerate(wxs):
                    out += wyj * wxi * win[Y0 + (jj - 1), X0 + (ii - 1)]
        elif bilinear:
            X0 = np.floor(WX).astype(np.int64)
            Y0 = np.floor(WY).astype(np.int64)
            FX = WX - X0
            FY = WY - Y0
            X0 -= x_lo
            Y0 -= y_lo
            z00 = win[Y0, X0]
            z10 = win[Y0, X0 + 1]
            z01 = win[Y0 + 1, X0]
            z11 = win[Y0 + 1, X0 + 1]
            out = (
                (1 - FX) * (1 - FY) * z00
                + FX * (1 - FY) * z10
                + (1 - FX) * FY * z01
                + FX * FY * z11
            )
        else:
            SX = np.floor(U).astype(np.int64) - x_lo
            SY = np.floor(V).astype(np.int64) - y_lo
            out = win[SY, SX]
        full = np.full((ts, ts), fill, dtype=np.float64)
        full[: out.shape[0], : out.shape[1]] = out
        return pd.DataFrame(
            {
                "tx": [dtx],
                "ty": [dty],
                "data": [full.tobytes()],
                "dtype": ["float64"],
            }
        )

    return joined.groupBy("dtx", "dty").applyInPandas(per_dst_tile, _TILE_SCHEMA)
