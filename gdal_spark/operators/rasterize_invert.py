"""gdal_rasterize -i: INVERSE burn — burn a fixed value into every
pixel NOT covered by any geometry (gdal_rasterize's -i flag;
GDALRasterizeGeometries invert path, alg/gdalrasterize.cpp burn of
the complement mask).

Physical plan difference from the forward burn: uncovered tiles must
exist in the output, so the driver of the shuffle is the FULL tile
grid (a `spark.range` — O(grid), no data skew by construction) LEFT
JOINED to the exploded feature list; each task burns its tile's
coverage mask and inverts.  Tiles no feature touches short-circuit to
a constant tile.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rasterize_invert_grid(
    features: DataFrame,
    gt: tuple[float, ...],
    width: int,
    height: int,
    burn_value: float,
    tile_size: int = 64,
    geom_col: str = "geom",
    dtype: str = "float64",
    all_touched: bool = False,
) -> DataFrame:
    """Burn ``burn_value`` into every pixel whose center no geometry
    covers (scanline rule unchanged — the complement of the forward
    burn's coverage set, exactly GDAL's -i semantics)."""
    from gdal_spark.kernels import wkb as W
    from gdal_spark.kernels.burn import burn_polygon, world_to_pixel
    from gdal_spark.operators.rasterize import TILE_SCHEMA

    spark = features.sparkSession
    ntx = (width + tile_size - 1) // tile_size
    nty = (height + tile_size - 1) // tile_size

    @F.pandas_udf("array<array<long>>")
    def covered(geoms: pd.Series) -> pd.Series:
        out = []
        for blob in geoms:
            xmin, ymin, xmax, ymax = W.wkb_bbox(bytes(blob))
            px, py = world_to_pixel(np.array([xmin, xmax]), np.array([ymin, ymax]), gt)
            x0, x1 = sorted([px[0], px[1]])
            y0, y1 = sorted([py[0], py[1]])
            tx0 = max(int(np.floor(x0 / tile_size)), 0)
            tx1 = min(int(np.floor(x1 / tile_size)), ntx - 1)
            ty0 = max(int(np.floor(y0 / tile_size)), 0)
            ty1 = min(int(np.floor(y1 / tile_size)), nty - 1)
            out.append(
                [[tx, ty] for tx in range(tx0, tx1 + 1) for ty in range(ty0, ty1 + 1)]
            )
        return pd.Series(out)

    feats = (
        features.withColumn("_tile", F.explode(covered(F.col(geom_col))))
        .select(
            F.col("_tile")[0].alias("tx"),
            F.col("_tile")[1].alias("ty"),
            geom_col,
        )
    )
    grid = spark.range(ntx * nty).select(
        (F.col("id") % ntx).alias("tx"),
        (F.col("id") / ntx).cast("long").alias("ty"),
    )
    joined = grid.join(feats, ["tx", "ty"], "left")

    def burn_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        nx = min(tile_size, width - tx * tile_size)
        ny = min(tile_size, height - ty * tile_size)
        mask = np.zeros((ny, nx), dtype=np.float64)
        for blob in pdf[geom_col]:
            if blob is None:
                continue
            for rings in W.polygon_rings(bytes(blob)):
                pix = []
                for r in rings:
                    px_, py_ = world_to_pixel(r[:, 0], r[:, 1], gt)
                    pix.append(
                        np.column_stack([px_ - tx * tile_size, py_ - ty * tile_size])
                    )
                burn_polygon(mask, pix, 1.0)
        arr = np.where(mask == 0.0, burn_value, 0.0).astype(np.dtype(dtype))
        return pd.DataFrame(
            {
                "z": [0], "tx": [tx], "ty": [ty], "band": [1],
                "data": [arr.tobytes()], "dtype": [dtype], "nodata": [0.0],
            }
        )

    return joined.groupBy("tx", "ty").applyInPandas(burn_tile, TILE_SCHEMA)
