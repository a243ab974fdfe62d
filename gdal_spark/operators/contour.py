"""Contour extraction: marching squares over the distributed tile
table.

Reference: ``gdal contour`` walks blocks with marching squares
(alg/contour.cpp + alg/marching_squares/*.h).  The distributed form is
the focal pattern: a contour cell's 4 corners are the 2×2 pixel block
whose top-left pixel the cell is named after, so each tile task needs
a 1-pixel halo (right/bottom) — the same boundary-strip exchange as
focal/slope.

Semantics (pinned for the oracle; degenerate-free when the level is
not an attainable z value): corner is "inside" iff z > level; case id
= 1·TL + 2·TR + 4·BR + 8·BL; edge crossings by linear interpolation;
saddles (5, 10) resolved by the cell-center average (the standard
midpoint decider, also what the reference's square walks into for
ambiguous cells).  Output per intersected cell: case id, segment
count, total in-cell polyline length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.operators.focal import _assemble_padded, _emit_strips

CONTOUR_SCHEMA = T.StructType(
    [
        T.StructField("cx", T.LongType()),
        T.StructField("cy", T.LongType()),
        T.StructField("case_id", T.IntegerType()),
        T.StructField("n_seg", T.IntegerType()),
        T.StructField("seg_len", T.DoubleType()),
    ]
)


def contour_cells(
    tiles: DataFrame, level: float, tile_size: int, width: int, height: int
) -> DataFrame:
    """(cx, cy, case_id, n_seg, seg_len) for every cell the iso-line at
    ``level`` crosses.  Cells are (width-1) × (height-1)."""
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size
    ts = tile_size
    strips = _emit_strips(tiles, ts, 1, ntx, nty)

    def per_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        z = _assemble_padded(pdf, ts, 1)
        # owned cells: TL pixel local (0..ts-1); padded offset +1
        c = slice(1, 1 + ts)
        p1 = slice(2, 2 + ts)
        zTL = z[c, c]
        zTR = z[c, p1]
        zBR = z[p1, p1]
        zBL = z[p1, c]
        L = level
        case = (
            (zTL > L).astype(np.int64)
            + 2 * (zTR > L).astype(np.int64)
            + 4 * (zBR > L).astype(np.int64)
            + 8 * (zBL > L).astype(np.int64)
        )
        hit = (case != 0) & (case != 15)
        # valid cells must lie inside the raster's cell grid
        gx = np.arange(ts) + tx * ts
        gy = np.arange(ts) + ty * ts
        GX, GY = np.meshgrid(gx, gy)
        hit &= (GX < width - 1) & (GY < height - 1)
        if not hit.any():
            return pd.DataFrame(
                {"cx": [], "cy": [], "case_id": [], "n_seg": [], "seg_len": []}
            )
        with np.errstate(divide="ignore", invalid="ignore"):
            tt = (L - zTL) / (zTR - zTL)
            tr = (L - zTR) / (zBR - zTR)
            tb = (L - zBL) / (zBR - zBL)
            tl = (L - zTL) / (zBL - zTL)
        l_topleft = np.sqrt(tt * tt + tl * tl)
        l_topright = np.sqrt((1 - tt) * (1 - tt) + tr * tr)
        l_rightbottom = np.sqrt((tb - 1) * (tb - 1) + (1 - tr) * (1 - tr))
        l_bottomleft = np.sqrt(tb * tb + (1 - tl) * (1 - tl))
        l_leftright = np.sqrt(1 + (tr - tl) * (tr - tl))
        l_topbottom = np.sqrt((tb - tt) * (tb - tt) + 1)
        center = (zTL + zTR + zBR + zBL) / 4.0
        sel = [case == k for k in range(16)]
        seg_len = np.select(
            sel,
            [
                np.zeros_like(tt),                 # 0
                l_topleft,                          # 1
                l_topright,                         # 2
                l_leftright,                        # 3
                l_rightbottom,                      # 4
                np.where(center > L, l_topright + l_bottomleft,
                         l_topleft + l_rightbottom),  # 5
                l_topbottom,                        # 6
                l_bottomleft,                       # 7
                l_bottomleft,                       # 8
                l_topbottom,                        # 9
                np.where(center > L, l_topleft + l_rightbottom,
                         l_topright + l_bottomleft),  # 10
                l_rightbottom,                      # 11
                l_leftright,                        # 12
                l_topright,                         # 13
                l_topleft,                          # 14
                np.zeros_like(tt),                  # 15
            ],
        )
        n_seg = np.where((case == 5) | (case == 10), 2, 1)
        ys, xs = np.nonzero(hit)
        return pd.DataFrame(
            {
                "cx": GX[ys, xs],
                "cy": GY[ys, xs],
                "case_id": case[ys, xs].astype(np.int32),
                "n_seg": n_seg[ys, xs].astype(np.int32),
                "seg_len": seg_len[ys, xs],
            }
        )

    return strips.groupBy("tx", "ty").applyInPandas(per_tile, CONTOUR_SCHEMA)
