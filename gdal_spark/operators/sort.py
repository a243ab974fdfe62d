"""Spatial sort / clustering keys.

Reference surface: ``gdal vector sort --hilbert`` (apps/
gdalalg_vector_sort.cpp:302-389) and FlatGeobuf's packed Hilbert
R-tree write order (ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:78-107):
order features along a space-filling curve so that spatially-near rows
are file-near.  In Spark the same idea is the *clustering* primitive:
``repartitionByRange(curve_key)`` + sorted write gives min/max-prunable
files and co-located spatial scans.

Two keys over the same 2^res grid:
- ``morton_expr`` — Z-order by bit interleaving, pure Catalyst
  expression (whole-stage codegen, and exactly mirrorable in ANSI SQL
  for the oracle).
- Hilbert — better locality, via the NumPy kernel
  (kernels.geodesy.hilbert_xy2d) exposed through ``s2_encode``; used
  by the pipeline's cell clustering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _grid_expr(lon: str, lat: str, res: int):
    n = 1 << res
    x = F.floor(((F.col(lon) + F.lit(180.0)) / F.lit(360.0)) * F.lit(float(n))).cast("long")
    y = F.floor(((F.lit(90.0) - F.col(lat)) / F.lit(180.0)) * F.lit(float(n))).cast("long")
    x = F.least(F.greatest(x, F.lit(0).cast("long")), F.lit(n - 1).cast("long"))
    y = F.least(F.greatest(y, F.lit(0).cast("long")), F.lit(n - 1).cast("long"))
    return x, y


def morton_expr(lon: str, lat: str, res: int = 8) -> Column:
    """Z-order key: interleave the res-bit grid coords (x high bits).
    SQL twin: SUM over j of ((x//2^j)%2)*2^(2j+1) + ((y//2^j)%2)*2^(2j)."""
    x, y = _grid_expr(lon, lat, res)
    m = F.lit(0).cast("long")
    for j in range(res):
        xbit = F.shiftright(x, j).bitwiseAND(F.lit(1).cast("long"))
        ybit = F.shiftright(y, j).bitwiseAND(F.lit(1).cast("long"))
        m = m.bitwiseOR(F.shiftleft(xbit, 2 * j + 1)).bitwiseOR(F.shiftleft(ybit, 2 * j))
    return m


def spatial_sort(
    points: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    res: int = 8,
    out: str = "morton",
    partitions: int | None = None,
) -> DataFrame:
    """Cluster a point table along the Z-curve: range-partition on the
    morton key and sort within partitions — the write-side layout that
    makes bbox queries prune files (the reference's Hilbert sort goal,
    as a Spark physical layout decision)."""
    df = points.withColumn(out, morton_expr(lon, lat, res))
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartitionByRange(n, out).sortWithinPartitions(out)


def with_hilbert(
    points: DataFrame, lon: str = "lon", lat: str = "lat", order: int = 8,
    out: str = "hilbert",
) -> DataFrame:
    """Hilbert-curve sort key (the better locality of the two
    space-filling curves — neighbors on the curve are always neighbors
    in space, unlike Z-order's quadrant jumps).  The bit loop doesn't
    express as a closed-form Catalyst expression like morton, so it
    rides the batched NumPy kernel."""
    from gdal_spark.kernels.geodesy import hilbert_xy2d

    n = 1 << order

    @F.pandas_udf(T.LongType())
    def hkey(lo: pd.Series, la: pd.Series) -> pd.Series:
        x = np.clip(
            np.floor((lo.to_numpy(np.float64) + 180.0) / 360.0 * n), 0, n - 1
        ).astype(np.int64)
        y = np.clip(
            np.floor((90.0 - la.to_numpy(np.float64)) / 180.0 * n), 0, n - 1
        ).astype(np.int64)
        return pd.Series(hilbert_xy2d(order, x, y))

    return points.withColumn(out, hkey(F.col(lon), F.col(lat)))
