"""SURF-style keypoint detection + feature matching, exact integer spec.

Reference: alg/gdal_simplesurf.cpp (GDALSimpleSURF: integral-image
determinant-of-Hessian keypoints) and alg/gdalmatching.cpp
(GDALComputeMatchingPoints: detect on two images, match by descriptor
distance).  Re-pinned exactly:

- first-octave 9x9 DoH box filters (Dxx: 5x9 with 1/-2/1 column bands,
  Dyy transposed, Dxy: signed 3x3 quadrants), all INTEGER;
- the 0.9 Dxy weight of SURF becomes the exact rational
  doh = 100*Dxx*Dyy - 81*Dxy^2  (everything stays integer);
- keypoint = strict 3x3 local max with doh > threshold, evaluated only
  where the full filter support is inside the image;
- descriptor = the 9 sums of a 3x3 grid of 3x3 patches around the
  keypoint (integer), matched by exact squared L2 with mutual-nearest
  cross-check and ties to the smallest (x, y).

Scale shape: detection is the halo-exchange focal pattern
(operators/focal.py) — per-tile NumPy over a radius-6 halo, linear in
pixels; matching joins the per-image keypoint tables (bounded per
image), a broadcast join at any corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.operators.focal import _assemble_padded, _emit_strips

# detection radius: DoH support 4 + NMS ring 1 + descriptor reach 4 -> 6
# covers both the response and the descriptor in one halo pass
_R = 6


def _doh_window_direct(P: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """Integer DoH by direct shifted adds — the executable spec the
    integral-image path is parity-tested against (tests/test_surf.py)."""
    n = hi - lo
    Dxx = np.zeros((n, n), dtype=np.int64)
    Dyy = np.zeros((n, n), dtype=np.int64)
    Dxy = np.zeros((n, n), dtype=np.int64)
    for dy in range(-2, 3):
        for dx in range(-4, 5):
            w = 1 if (dx <= -2 or dx >= 2) else -2
            Dxx += w * P[lo + dy : hi + dy, lo + dx : hi + dx]
            Dyy += w * P[lo + dx : hi + dx, lo + dy : hi + dy]
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            if dx == 0 or dy == 0:
                continue
            s = (1 if dx > 0 else -1) * (1 if dy > 0 else -1)
            Dxy += s * P[lo + dy : hi + dy, lo + dx : hi + dx]
    return 100 * Dxx * Dyy - 81 * Dxy * Dxy


def _doh_window(P: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """Integer DoH on the window P[lo:hi, lo:hi] via an INTEGRAL IMAGE
    (the reference's own structure: GDALIntegralImage in
    alg/gdal_simplesurf.cpp) — every filter box is four lookups, exact
    integers, bitwise-equal to the direct shifted-add spec."""
    S = np.zeros((P.shape[0] + 1, P.shape[1] + 1), dtype=np.int64)
    np.cumsum(np.cumsum(P, axis=0), axis=1, out=S[1:, 1:])

    def box(a, b, c, d):  # inclusive row offsets [a,b], col offsets [c,d]
        return (
            S[lo + b + 1 : hi + b + 1, lo + d + 1 : hi + d + 1]
            - S[lo + a : hi + a, lo + d + 1 : hi + d + 1]
            - S[lo + b + 1 : hi + b + 1, lo + c : hi + c]
            + S[lo + a : hi + a, lo + c : hi + c]
        )

    Dxx = box(-2, 2, -4, -2) - 2 * box(-2, 2, -1, 1) + box(-2, 2, 2, 4)
    Dyy = box(-4, -2, -2, 2) - 2 * box(-1, 1, -2, 2) + box(2, 4, -2, 2)
    Dxy = box(-3, -1, -3, -1) - box(-3, -1, 1, 3) - box(1, 3, -3, -1) + box(1, 3, 1, 3)
    return 100 * Dxx * Dyy - 81 * Dxy * Dxy


def doh_keypoints_tiles(
    tiles: DataFrame,
    tile_size: int,
    width: int,
    height: int,
    threshold: int,
    with_descriptor: bool = False,
) -> DataFrame:
    """Keypoint rows (gx, gy, doh[, d1..d9]) from a tile table."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    fields = [
        T.StructField("gx", T.LongType()),
        T.StructField("gy", T.LongType()),
        T.StructField("doh", T.LongType()),
    ]
    if with_descriptor:
        fields += [T.StructField(f"d{i}", T.LongType()) for i in range(1, 10)]
    out_schema = T.StructType(fields)
    ts, r = tile_size, _R

    def per_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        P = _assemble_padded(pdf, ts, r, fill=0.0).astype(np.int64)
        # DoH on the tile plus a 1-px NMS ring: window [r-1, r+ts+1)
        ext = _doh_window(P, r - 1, r + ts + 1)
        c = ext[1:-1, 1:-1]
        mask = c > threshold
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                mask &= c > ext[1 + dy : 1 + dy + ts, 1 + dx : 1 + dx + ts]
        ys, xs = np.nonzero(mask)
        out = {"gx": xs + tx * ts, "gy": ys + ty * ts, "doh": c[ys, xs]}
        if with_descriptor:
            for i, (qy, qx) in enumerate(
                [(a, b) for a in (-3, 0, 3) for b in (-3, 0, 3)], start=1
            ):
                vals = np.empty(len(xs), dtype=np.int64)
                for k, (y0, x0) in enumerate(zip(ys, xs)):
                    cy, cx = r + y0 + qy, r + x0 + qx
                    vals[k] = P[cy - 1 : cy + 2, cx - 1 : cx + 2].sum()
                out[f"d{i}"] = vals
        return pd.DataFrame(out)

    strips = _emit_strips(tiles, tile_size, r, ntx, nty)
    kp = strips.groupBy("tx", "ty").applyInPandas(per_tile, out_schema)
    # keep only pixels whose full support (response + NMS + descriptor)
    # lies inside the image — padding never leaks into kept outputs
    return kp.filter(
        (F.col("gx") >= _R) & (F.col("gx") < width - _R)
        & (F.col("gy") >= _R) & (F.col("gy") < height - _R)
    )


def match_keypoints(kpa: DataFrame, kpb: DataFrame) -> DataFrame:
    """Mutual-nearest descriptor matching (exact squared L2, ties to the
    smallest (x, y)); per-image keypoint sets are bounded, so the pair
    join broadcasts."""
    a = kpa.select(
        F.col("gx").alias("xa"), F.col("gy").alias("ya"),
        *[F.col(f"d{i}").alias(f"a{i}") for i in range(1, 10)],
    )
    b = kpb.select(
        F.col("gx").alias("xb"), F.col("gy").alias("yb"),
        *[F.col(f"d{i}").alias(f"b{i}") for i in range(1, 10)],
    )
    pairs = a.crossJoin(F.broadcast(b))
    dist = None
    for i in range(1, 10):
        t = (F.col(f"a{i}") - F.col(f"b{i}")) * (F.col(f"a{i}") - F.col(f"b{i}"))
        dist = t if dist is None else dist + t
    pairs = pairs.withColumn("dist", dist)
    wa = Window.partitionBy("xa", "ya").orderBy("dist", "xb", "yb")
    wb = Window.partitionBy("xb", "yb").orderBy("dist", "xa", "ya")
    return (
        pairs.withColumn("rna", F.row_number().over(wa))
        .withColumn("rnb", F.row_number().over(wb))
        .filter((F.col("rna") == 1) & (F.col("rnb") == 1))
        .select("xa", "ya", "xb", "yb", "dist")
    )
