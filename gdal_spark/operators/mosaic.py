"""Mosaic / composite of multiple rasters onto a shared grid.

Reference: ``gdal_merge`` / ``gdalbuildvrt`` + ``gdal raster mosaic``
(apps/gdalalg_raster_mosaic.cpp): later inputs PAINT OVER earlier ones
wherever they have valid (non-nodata) pixels; nodata stays transparent.

Spark decomposition: tag each source's tiles with its layer ordinal,
union the tile tables (no alignment work — same grid), and reduce per
(tx, ty) with a vectorized paint-over fold in layer order.  ONE
shuffle keyed by tile id; output tile count = occupied tiles, not
inputs × tiles.  first-wins is the same fold in reverse; ``count`` and
``max``/``min``/``sum`` composites drop into the same reducer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("dtype", T.StringType()),
    ]
)


def mosaic_tiles(
    layers: list[DataFrame],
    tile_size: int,
    nodata: float = 0.0,
    method: str = "last",
) -> DataFrame:
    """Composite ``layers`` (ordered tile DataFrames on the same grid)
    → tile rows.  ``method``: 'last' (gdal_merge default — later
    layers overwrite), 'first' (gdalbuildvrt default), 'sum', 'max',
    'min' (the reference mosaic's pixel functions)."""
    if method not in ("last", "first", "sum", "max", "min"):
        raise ValueError(method)
    ts = tile_size
    tagged = None
    for i, layer in enumerate(layers):
        t = layer.select(
            "tx", "ty", "data", "dtype", F.lit(i).alias("_layer")
        )
        tagged = t if tagged is None else tagged.unionByName(t)

    def combine(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        pdf = pdf.sort_values("_layer")
        out = np.full((ts, ts), nodata, dtype=np.float64)
        # explicit occupancy mask: a composite ('sum' especially) can
        # legitimately produce a value equal to nodata, so emptiness is
        # tracked, never inferred from out == nodata
        occupied = np.zeros((ts, ts), dtype=bool)
        for _, row in pdf.iterrows():
            arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
                ts, ts
            ).astype(np.float64)
            valid = arr != nodata
            both = valid & occupied
            fresh = valid & ~occupied
            if method == "last":
                out[valid] = arr[valid]
            elif method == "first":
                out[fresh] = arr[fresh]
            elif method == "sum":
                out[both] += arr[both]
                out[fresh] = arr[fresh]
            elif method == "max":
                out[both] = np.maximum(out[both], arr[both])
                out[fresh] = arr[fresh]
            elif method == "min":
                out[both] = np.minimum(out[both], arr[both])
                out[fresh] = arr[fresh]
            occupied |= valid
        out[~occupied] = nodata
        return pd.DataFrame(
            {"tx": [tx], "ty": [ty], "data": [out.tobytes()], "dtype": ["float64"]}
        )

    return tagged.groupBy("tx", "ty").applyInPandas(combine, _OUT_SCHEMA)
