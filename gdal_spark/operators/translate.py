"""gdal_translate-style raster transforms on the tile table.

Reference: ``gdal_translate`` (apps/gdal_translate_lib.cpp) — the most
used GDAL tool: ``-srcwin x y w h`` window copy, ``-scale src0 src1
dst0 dst1`` linear rescale (clipped to the dst range), ``-outsize``
resample.  All three compose out of primitives this engine already
has:

- srcwin  = nearest warp onto the identity grid translated by (x, y)
  (``operators.warp`` — pixel (i,j) of the output reads source pixel
  (x+i, y+j); the tile re-alignment is the warp's range join);
- outsize = nearest/bilinear warp with the scaled geotransform;
- scale   = a pure per-tile value map (no shuffle at all).

So ``translate_tiles`` is a thin composition — the Spark analogue of
the reference building translate on top of RasterIO windows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from gdal_spark.operators.warp import _TILE_SCHEMA, warp_resample


def scale_tiles(
    tiles: DataFrame,
    src0: float,
    src1: float,
    dst0: float,
    dst1: float,
    tile_size: int,
    nodata: float | None = 0.0,
) -> DataFrame:
    """``-scale``: out = (v − src0)·(dst1−dst0)/(src1−src0) + dst0,
    clipped to [dst0, dst1] (gdal_translate_lib.cpp scale logic);
    nodata pixels pass through unchanged."""
    ts = tile_size
    k = (dst1 - dst0) / (src1 - src0)

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
                    ts, ts
                ).astype(np.float64)
                out = np.clip((arr - src0) * k + dst0, dst0, dst1)
                if nodata is not None:
                    out = np.where(arr == nodata, nodata, out)
                rows.append(
                    (int(row["tx"]), int(row["ty"]), out.tobytes(), "float64")
                )
            yield pd.DataFrame(rows, columns=["tx", "ty", "data", "dtype"])

    return tiles.select("tx", "ty", "data", "dtype").mapInPandas(gen, _TILE_SCHEMA)


def srcwin_tiles(
    tiles: DataFrame,
    x0: int,
    y0: int,
    w: int,
    h: int,
    tile_size: int,
) -> DataFrame:
    """``-srcwin x0 y0 w h``: window copy re-tiled from (0,0) — the
    nearest warp onto the identity grid translated by the window
    origin."""
    return warp_resample(
        tiles,
        (0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
        (float(x0), 1.0, 0.0, float(y0), 0.0, 1.0),
        w,
        h,
        tile_size=tile_size,
        method="nearest",
    )


def translate_tiles(
    tiles: DataFrame,
    tile_size: int,
    srcwin: tuple[int, int, int, int] | None = None,
    scale: tuple[float, float, float, float] | None = None,
    nodata: float | None = 0.0,
) -> DataFrame:
    """Window-then-scale, as the reference applies them."""
    out = tiles
    if srcwin is not None:
        out = srcwin_tiles(out, *srcwin, tile_size=tile_size)
    if scale is not None:
        out = scale_tiles(out, *scale, tile_size=tile_size, nodata=nodata)
    return out


def power_scale_col(v, src_min: float, src_max: float, dst_min: float,
                    dst_max: float, exponent: float, clip: bool = True):
    """``-scale ... -exponent e`` non-linear scaling
    (frmts/vrt/vrtsources.cpp:4042-4056 PROCESSING_FLAG_SCALING_
    EXPONENTIAL): pv = (v - srcMin)/(srcMax - srcMin), clipped to
    [0, 1] unless ``--no-clip`` (gdalalg_raster_scale.cpp:54), then
    out = (dstMax - dstMin) * pv^e + dstMin.

    exponent == 2 squares explicitly (pv*pv) so the expression tree is
    transcendental-free — the oracle-checked path; other exponents go
    through ``pow``.  Pure Column: one codegen projection per tile at
    any scale.
    """
    from pyspark.sql import functions as F

    if src_min == src_max:
        pv = F.lit(0.0)
    else:
        pv = (v - F.lit(float(src_min))) / F.lit(float(src_max - src_min))
    if clip:
        pv = F.when(pv < 0.0, F.lit(0.0)).when(pv > 1.0, F.lit(1.0)).otherwise(pv)
    powed = pv * pv if exponent == 2 else F.pow(pv, F.lit(float(exponent)))
    return F.lit(float(dst_max - dst_min)) * powed + F.lit(float(dst_min))
