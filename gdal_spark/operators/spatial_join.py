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


def cell_expr(lon, lat, res: int):
    """Catalyst expression computing the same int64 cell id as
    ``kernels.cells.cell_encode`` — bit-identical by construction (the
    identical IEEE op sequence ``floor(((lon+180.0)/360.0)*n)``, then
    clip, then the same bit packing).

    Cell assignment is pure arithmetic, so the *default* path keeps it
    inside whole-stage codegen: no Arrow round trip, and no risk of
    Catalyst double-evaluating a Python UDF when it pushes an
    ``isnotnull`` join-key filter through the projection (which it
    does — measured as 2× ArrowEvalPython in the join plan).  The
    NumPy kernel (``with_cell_kernel``) stays as the parity oracle."""
    n = 1 << res
    xf = F.floor(((F.col(lon) + F.lit(180.0)) / F.lit(360.0)) * F.lit(float(n))).cast("long")
    yf = F.floor(((F.lit(90.0) - F.col(lat)) / F.lit(180.0)) * F.lit(float(n))).cast("long")
    xc = F.least(F.greatest(xf, F.lit(0).cast("long")), F.lit(n - 1).cast("long"))
    yc = F.least(F.greatest(yf, F.lit(0).cast("long")), F.lit(n - 1).cast("long"))
    return (
        F.shiftleft(F.lit(res).cast("long"), 57)
        .bitwiseOR(F.shiftleft(xc, 28))
        .bitwiseOR(yc)
    )


def with_cell(points: DataFrame, lon="lon", lat="lat", res: int = DEFAULT_RES,
              out="cell") -> DataFrame:
    """Attach the equi-join cell id (JVM-side codegen expression)."""
    return points.withColumn(out, cell_expr(lon, lat, res))


def with_cell_kernel(points: DataFrame, lon="lon", lat="lat", res: int = DEFAULT_RES,
                     out="cell") -> DataFrame:
    """Pandas-UDF variant wrapping the batched NumPy kernel — kept as
    the parity reference for ``cell_expr`` (tested equal on random and
    boundary inputs)."""

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
    broadcast_cover: bool = True,
) -> DataFrame:
    """points × polygon set → matching (point row, poly_id) rows.

    ``polys``: [(poly_id, wkb_bytes)].

    Join strategy (the scale decision):

    - ``broadcast_cover=True`` (default) — the cover set rides to every
      executor; ONE BroadcastHashJoin, the point table is never
      shuffled.  Salting is pointless here (there is no shuffle whose
      keys could skew), so ``salt_factor`` is ignored.
    - ``broadcast_cover=False`` — the cover is a DataFrame and the join
      is a shuffle hash join on ``cell``: the path for polygon sets too
      large to broadcast.  Here hot metro cells DO skew the exchange,
      and ``salt_factor > 1`` splits each cover cell into K sub-keys
      while points pick one pseudo-randomly — the north rule's salted
      repartition (AQE skew-join splitting stays on as the runtime
      backstop).
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
    cover = spark.createDataFrame(cover_rows, cover_schema)

    if broadcast_cover:
        joined = pts.join(F.broadcast(cover), "cell")
        salted = False
    elif salt_factor > 1:
        cover = cover.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
        ).withColumn("_salt", F.col("_salt").cast("int"))
        pts = pts.withColumn(
            "_salt", (F.abs(F.hash(F.col(lon), F.col(lat))) % salt_factor).cast("int")
        )
        joined = pts.hint("shuffle_hash").join(cover, ["cell", "_salt"])
        salted = True
    else:
        joined = pts.hint("shuffle_hash").join(cover, "cell")
        salted = False

    pred = st_intersects_point if include_boundary else st_contains_point
    out = joined.filter(pred(F.col("_poly_wkb"), F.col(lon), F.col(lat)))
    drop = ["_poly_wkb", "cell"] + (["_salt"] if salted else [])
    return out.drop(*drop)
