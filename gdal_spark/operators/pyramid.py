"""Tile pyramid (overview) construction.

Reference: GDALRegenerateOverviewsEx resampling dispatch
(gcore/overview.cpp:4302-4774) — NEAREST / AVERAGE / MODE / SUM etc.
over 2×2 child blocks.  The distributed form is a per-level tree
aggregation: groupBy(parent tile) over ≤ 4 children, reduce the 2×2
pixel blocks in NumPy.  Each level is one shuffle whose cardinality
drops 4× — total work is a geometric series dominated by the base
level, which is how the pyramid stays O(n) at 10^12 pages.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.operators.rasterize import TILE_SCHEMA, TILE_SIZE


def _reduce2x2(arr: np.ndarray, method: str) -> np.ndarray:
    ny, nx = arr.shape
    a = arr.reshape(ny // 2, 2, nx // 2, 2)
    if method == "sum":
        return a.sum(axis=(1, 3))
    if method == "average":
        return a.mean(axis=(1, 3))
    if method == "nearest":
        return arr[::2, ::2]
    if method == "max":
        return a.max(axis=(1, 3))
    if method == "min":
        return a.min(axis=(1, 3))
    if method == "mode":
        # most frequent of the 4 children; ties -> smallest value
        # (deterministic; vectorized via sorted-block equality counts)
        v = a.transpose(0, 2, 1, 3).reshape(-1, 4)
        s = np.sort(v, axis=1)
        cnt = (s[:, :, None] == s[:, None, :]).sum(axis=2)
        idx = np.argmax(cnt, axis=1)  # first max -> smallest value (sorted)
        return s[np.arange(s.shape[0]), idx].reshape(ny // 2, nx // 2)
    raise ValueError(f"unsupported resampling {method}")


def pyramid_level(
    tiles: DataFrame,
    method: str = "sum",
    tile_size: int = TILE_SIZE,
) -> DataFrame:
    """One zoom level up: tiles at z → tiles at z-1.

    ``sum`` is the density-pyramid reduction (counts stay counts);
    ``average`` matches the reference's AVERAGE overview semantics.
    """

    parent = tiles.withColumn("ptx", F.col("tx") / 2).withColumn(
        "pty", F.col("ty") / 2
    )
    parent = parent.withColumn("ptx", F.floor("ptx").cast("long")).withColumn(
        "pty", F.floor("pty").cast("long")
    )

    def reduce_children(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ptx, pty = int(key[0]), int(key[1])
        z = int(pdf["z"].iloc[0]) - 1
        dtype = pdf["dtype"].iloc[0]
        out_dtype = np.float64 if method == "average" else np.dtype(dtype)
        out = np.zeros((tile_size, tile_size), dtype=out_dtype)
        for _, row in pdf.iterrows():
            child = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
                tile_size, tile_size
            )
            red = _reduce2x2(child, method)
            oy = (int(row["ty"]) - 2 * pty) * (tile_size // 2)
            ox = (int(row["tx"]) - 2 * ptx) * (tile_size // 2)
            out[oy : oy + tile_size // 2, ox : ox + tile_size // 2] = red
        return pd.DataFrame(
            {
                "z": [z],
                "tx": [ptx],
                "ty": [pty],
                "band": [int(pdf["band"].iloc[0])],
                "data": [out.astype(np.dtype(dtype)).tobytes()],
                "dtype": [dtype],
                "nodata": [float(pdf["nodata"].iloc[0])],
            }
        )

    return parent.groupBy("ptx", "pty").applyInPandas(reduce_children, TILE_SCHEMA)


def build_pyramid(tiles: DataFrame, min_z: int, base_z: int, method: str = "sum"):
    """All levels base_z-1 .. min_z; returns dict z → DataFrame.

    Callers persist each level before reducing the next (lineage
    checkpoint), so a killed job resumes from the last written level.
    """
    levels = {}
    cur = tiles
    for z in range(base_z - 1, min_z - 1, -1):
        cur = pyramid_level(cur, method)
        levels[z] = cur
    return levels
