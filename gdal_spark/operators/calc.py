"""Raster band algebra — the VRT pixel-function / ``gdal raster calc``
surface (frmts/vrt/pixelfunctions.cpp:4302-4430, apps/
gdalalg_raster_calc.cpp): per-pixel expressions over one or more
aligned bands.

Spark form: band tile tables join on the tile key (co-located under a
tile-partitioned layout — the multi-band analog of GDAL's band list on
one dataset), and one task evaluates the NumPy expression on one tile
stack.  The expression runs vectorized on the 2-D arrays; adding a
band is adding a join input, not a new pass over the data.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def raster_calc(
    bands: dict[str, DataFrame],
    fn: Callable[..., np.ndarray],
    tile_size: int,
    dtype: str = "float64",
    how: str = "inner",
) -> DataFrame:
    """``fn(**{name: ndarray})`` per tile over the aligned band tables.

    ``how='inner'`` evaluates only tiles present in every band;
    ``'outer'`` fills absent bands with zeros (sparse-tile convention).
    Returns a tile table (z=0, tx, ty, band=1, data, dtype, nodata=0).
    """
    names = list(bands)
    joined = None
    for name in names:
        b = bands[name].select(
            "tx", "ty",
            F.col("data").alias(f"_d_{name}"),
            F.col("dtype").alias(f"_t_{name}"),
        )
        joined = b if joined is None else joined.join(
            b, ["tx", "ty"], "inner" if how == "inner" else "full"
        )

    from gdal_spark.operators.rasterize import TILE_SCHEMA

    def per_tile(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                arrs = {}
                for name in names:
                    blob = row[f"_d_{name}"]
                    if blob is None:
                        arrs[name] = np.zeros((tile_size, tile_size))
                    else:
                        arrs[name] = np.frombuffer(
                            blob, dtype=np.dtype(row[f"_t_{name}"])
                        ).reshape(tile_size, tile_size).astype(np.float64)
                out = fn(**arrs).astype(np.dtype(dtype))
                rows.append(
                    (0, int(row["tx"]), int(row["ty"]), 1, out.tobytes(), dtype, 0.0)
                )
            yield pd.DataFrame(
                rows, columns=["z", "tx", "ty", "band", "data", "dtype", "nodata"]
            )

    return joined.mapInPandas(per_tile, TILE_SCHEMA)


def reclassify(arr: np.ndarray, bounds: list[float], values: list[float]) -> np.ndarray:
    """Pixel-function `reclassify`: bin by bounds → class values
    (len(values) == len(bounds) + 1)."""
    idx = np.searchsorted(np.asarray(bounds, dtype=np.float64), arr, side="right")
    return np.asarray(values, dtype=np.float64)[idx]
