"""Distributed point-in-polygon spatial join.

Re-creates the reference's spatial-filter join (iterate one layer with
``SetSpatialFilter`` bound to the other's geometry — an index-nested-
loop join over its quadtree/R-tree, ogrlayer.cpp:3492-3618 + 4004-4076)
as the idiomatic Spark two-phase plan:

  phase 0  polygon side → cell cover set at res R (driver-side for the
           broadcastable case; it is per-polygon metadata, not data)
  phase 1  points.join(broadcast(cover), on=cell)  — hash join, no
           shuffle of the big side beyond its scan
  phase 2  exact PIP pandas UDF on the candidates (vectorized kernel,
           grouped by polygon inside each Arrow batch)

Skew: web-scale point sets pile onto a few metro cells.  With
``salt_factor > 1`` hot cells are split point-side into K sub-keys and
the cover side is exploded K× — a deterministic pre-salt that
complements AQE's runtime skew splitting (both are on).

At 10^12 rows the phase-1 join is the only wide dependency, and it is
broadcast — the point table is never shuffled; candidates flow
straight from the scan through the UDF filter (verify with
.explain(): one BroadcastHashJoin, no Exchange on the point side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdal_spark.functions.st import st_intersects_point, st_contains_point
from gdal_spark.kernels import wkb as W
from gdal_spark.kernels.cells import cell_encode, cells_cover_polygon

DEFAULT_RES = 7


def with_cell(points: DataFrame, lon="lon", lat="lat", res: int = DEFAULT_RES,
              out="cell") -> DataFrame:
    """Attach the equi-join cell id to a point DataFrame (vectorized
    kernel via Arrow batches)."""

    @F.pandas_udf(T.LongType())
    def enc(lo: pd.Series, la: pd.Series) -> pd.Series:
        return pd.Series(cell_encode(lo.to_numpy(np.float64), la.to_numpy(np.float64), res))

    return points.withColumn(out, enc(F.col(lon), F.col(lat)))


def polygon_cover(polys: list[tuple], res: int = DEFAULT_RES) -> list[tuple]:
    """[(poly_id, wkb)] → [(cell, poly_id, wkb)] cover rows (superset
    cover; exact phase removes false positives)."""
    rows = []
    for pid, blob in polys:
        cover: set[int] = set()
        for rings in W.polygon_rings(blob):
            cover.update(cells_cover_polygon(rings, res).tolist())
        rows.extend((int(c), pid, blob) for c in cover)
    return rows


def spatial_join_points_in_polygons(
    points: DataFrame,
    polys: list[tuple],
    lon: str = "lon",
    lat: str = "lat",
    res: int = DEFAULT_RES,
    include_boundary: bool = True,
    salt_factor: int = 1,
    poly_id_col: str = "poly_id",
) -> DataFrame:
    """points × small polygon set → matching (point row, poly_id) rows.

    ``polys``: [(poly_id, wkb_bytes)] — the broadcastable side (dims,
    admin boundaries, zone sets).  For polygon sets too large to
    broadcast use the cover as a DataFrame and let AQE pick the join.
    """
    spark = points.sparkSession
    cover_rows = polygon_cover(polys, res)
    cover_schema = T.StructType(
        [
            T.StructField("cell", T.LongType()),
            T.StructField(poly_id_col, T.LongType()),
            T.StructField("_poly_wkb", T.BinaryType()),
        ]
    )
    pts = with_cell(points, lon, lat, res)

    if salt_factor > 1:
        salted = [
            (c, pid, blob, s)
            for (c, pid, blob) in cover_rows
            for s in range(salt_factor)
        ]
        cover_schema = cover_schema.add("_salt", T.IntegerType())
        cover = spark.createDataFrame(salted, cover_schema)
        pts = pts.withColumn(
            "_salt", (F.abs(F.hash(F.col(lon), F.col(lat))) % salt_factor).cast("int")
        )
        joined = pts.join(F.broadcast(cover), ["cell", "_salt"])
    else:
        cover = spark.createDataFrame(cover_rows, cover_schema)
        joined = pts.join(F.broadcast(cover), "cell")

    pred = st_intersects_point if include_boundary else st_contains_point
    out = joined.filter(pred(F.col("_poly_wkb"), F.col(lon), F.col(lat)))
    drop = ["_poly_wkb", "cell"] + (["_salt"] if salt_factor > 1 else [])
    return out.drop(*drop)
