"""Distributed pan-sharpening (weighted Brovey).

Reference semantics: GDALPansharpenOperation::WeightedBrovey3 /
WeightedBroveyWithNoData (alg/gdalpansharpen.cpp:502-620):

  pseudo_pan = sum_i( w_i * ms_i )          (upsampled MS at pan res)
  factor     = pan / pseudo_pan             (0 when pseudo_pan == 0 —
                                             ComputeFactor,
                                             alg/gdalpansharpen.cpp:566)
  out_i      = ms_i * factor
  nodata     : any MS band == nodata, or pan == nodata → all out bands
               = nodata (alg/gdalpansharpen.cpp:506-560)

MS→pan upsampling here is NEAREST (exact integer index arithmetic —
the oracle replays it bit-for-bit); the reference defaults to cubic
(GDALCreatePansharpenOptions, alg/gdalpansharpen.cpp:58) but accepts
every GRIORA_* mode, and a cubic upsample in this engine is the
existing halo-exchange convolution (operators/pyramid.py
pyramid_convolution) composed in front.

Physical plan (the Spark mapping of the reference's thread-pool
chunking, alg/gdalpansharpen.cpp PansharpenJobThreadFunc): MS tiles
stack their bands into one row per tile (one shuffle, O(ms tiles)),
then a single equi-join keys each pan tile to its parent MS tile
(tx >> dz, ty >> dz — with equal tile sizes a pan tile lies entirely
inside one parent, so NO halo is needed for nearest), and the Brovey
arithmetic runs vectorized per pan tile.  Both shuffles move tile
blobs, never pixels as rows; a 1000-executor cluster sharpens one
wave of pan tiles per task slot.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.operators.rasterize import TILE_SIZE


def pansharpen_tiles(
    pan: DataFrame,
    ms: DataFrame,
    weights: list[float],
    dz: int,
    nodata: float | None = None,
    tile_size: int = TILE_SIZE,
) -> DataFrame:
    """Weighted-Brovey sharpen of ``pan`` tiles (zoom z) by ``ms``
    tiles (zoom z-dz, same tile_size, one row per band with bands
    0..n-1 contiguous).

    Input schemas: pan(tx, ty, data binary float64), ms(tx, ty, band
    int, data binary float64).  Output: (tx, ty, band, data) float64
    pan-resolution tiles, one row per MS band.
    """
    n_bands = len(weights)
    w = np.asarray(weights, dtype=np.float64)

    stacked_schema = T.StructType(
        [
            T.StructField("mtx", T.LongType()),
            T.StructField("mty", T.LongType()),
            T.StructField("stack", T.BinaryType()),
        ]
    )

    def stack_bands(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("band")
        if len(pdf) != n_bands:
            raise ValueError(
                f"ms tile {key}: expected {n_bands} bands, got {len(pdf)}"
            )
        arrs = [np.frombuffer(b, dtype=np.float64) for b in pdf["data"]]
        return pd.DataFrame(
            {"mtx": [int(key[0])], "mty": [int(key[1])], "stack": [np.concatenate(arrs).tobytes()]}
        )

    ms_stacked = ms.groupBy("tx", "ty").applyInPandas(stack_bands, stacked_schema)

    joined = pan.withColumn(
        "mtx", F.shiftright(F.col("tx"), dz)
    ).withColumn("mty", F.shiftright(F.col("ty"), dz)).join(
        ms_stacked, ["mtx", "mty"]
    )

    out_schema = T.StructType(
        [
            T.StructField("tx", T.LongType()),
            T.StructField("ty", T.LongType()),
            T.StructField("band", T.IntegerType()),
            T.StructField("data", T.BinaryType()),
        ]
    )

    Tz = tile_size
    npx = Tz * Tz

    def sharpen(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                panv = np.frombuffer(row.data, dtype=np.float64)
                stack = np.frombuffer(row.stack, dtype=np.float64).reshape(
                    n_bands, npx
                )
                # nearest upsample: pan pixel (px, py) of tile (tx, ty)
                # reads MS pixel (global >> dz) - parent_origin
                px = np.arange(Tz, dtype=np.int64)
                gx = ((int(row.tx) * Tz + px) >> dz) - (int(row.tx) >> dz) * Tz
                gy = ((int(row.ty) * Tz + px) >> dz) - (int(row.ty) >> dz) * Tz
                idx = (gy[:, None] * Tz + gx[None, :]).ravel()
                ms_up = stack[:, idx]  # (n_bands, npx) at pan resolution

                pseudo = (w[:, None] * ms_up).sum(axis=0)
                if nodata is not None:
                    # any MS band at nodata zeroes pseudo_pan (the
                    # reference's break), then pseudo==0 OR pan==nodata
                    # emits nodata on every band
                    pseudo = np.where((ms_up == nodata).any(axis=0), 0.0, pseudo)
                    invalid = (pseudo == 0.0) | (panv == nodata)
                    factor = np.where(
                        invalid, 0.0, panv / np.where(pseudo == 0.0, 1.0, pseudo)
                    )
                    outs = ms_up * factor
                    outs[:, invalid] = nodata
                else:
                    factor = np.where(
                        pseudo != 0.0, panv / np.where(pseudo == 0.0, 1.0, pseudo), 0.0
                    )
                    outs = ms_up * factor
                for b in range(n_bands):
                    yield pd.DataFrame(
                        {
                            "tx": [int(row.tx)],
                            "ty": [int(row.ty)],
                            "band": [b],
                            "data": [outs[b].tobytes()],
                        }
                    )

    return joined.select("tx", "ty", "data", "stack").mapInPandas(
        sharpen, out_schema
    )
