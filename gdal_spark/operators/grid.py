"""Grid interpolation: scattered points → regular grid cells.

Reference: GDALGridCreate algorithms (alg/gdal_alg.h:402-416,
alg/gdalgrid.cpp) — InverseDistanceToAPower, MovingAverage,
NearestNeighbor, metrics — each a reduction over points within a
search window of the target cell.  Distributed form: explode each
point onto the target cells whose search window contains it (radius →
fixed cell fan-out), then groupBy(cell).agg — one shuffle whose keys
are grid cells, perfectly balanced by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_idw(
    points: DataFrame,
    x0: float,
    y0: float,
    cell: float,
    nx: int,
    ny: int,
    radius: float,
    power: int = 2,
    lon: str = "lon",
    lat: str = "lat",
    value_col: str = "v",
) -> DataFrame:
    """Inverse-distance-to-a-power over a fixed search radius
    (GDALGridInverseDistanceToAPower semantics: weight = 1/d^power,
    points at d > radius excluded; cell with no points → null).

    Grid cell centers: (x0 + (i+0.5)·cell, y0 + (j+0.5)·cell).
    The point→cells fan-out is ceil(radius/cell)² per point — a
    constant; no cross-join.
    """
    r_cells = int(radius // cell) + 1
    p = points.select(
        F.col(lon).alias("px"), F.col(lat).alias("py"), F.col(value_col).cast("double").alias("pv")
    )
    # candidate cell indexes around each point
    p = p.withColumn("ci0", F.floor((F.col("px") - F.lit(x0)) / F.lit(cell)).cast("int"))
    p = p.withColumn("cj0", F.floor((F.col("py") - F.lit(y0)) / F.lit(cell)).cast("int"))
    offs = F.sequence(F.lit(-r_cells), F.lit(r_cells))
    p = (
        p.withColumn("di", F.explode(offs))
        .withColumn("i", F.col("ci0") + F.col("di"))
        .withColumn("dj", F.explode(offs))
        .withColumn("j", F.col("cj0") + F.col("dj"))
        .filter((F.col("i") >= 0) & (F.col("i") < nx) & (F.col("j") >= 0) & (F.col("j") < ny))
    )
    cx = F.lit(x0) + (F.col("i") + 0.5) * F.lit(cell)
    cy = F.lit(y0) + (F.col("j") + 0.5) * F.lit(cell)
    d2 = (F.col("px") - cx) * (F.col("px") - cx) + (F.col("py") - cy) * (F.col("py") - cy)
    p = p.withColumn("d2", d2).filter(F.col("d2") <= F.lit(radius * radius))
    # exact-hit points (d2 == 0) take the value directly (reference
    # IDW: dfR2 == 0 → return point value)
    w = F.when(F.col("d2") > 0, F.pow(F.col("d2"), F.lit(-power / 2.0))).otherwise(F.lit(0.0))
    agg = p.groupBy("i", "j").agg(
        F.round(F.sum(w * F.col("pv")), 6).alias("wsum"),
        F.round(F.sum(w), 6).alias("wtot"),
        F.count(F.when(F.col("d2") == 0, 1)).alias("nhit"),
        F.round(F.avg(F.when(F.col("d2") == 0, F.col("pv"))), 6).alias("hitval"),
        F.count("*").alias("npts"),
    )
    return agg.select(
        "i",
        "j",
        F.when(F.col("nhit") > 0, F.col("hitval"))
        .otherwise(F.round(F.col("wsum") / F.col("wtot"), 6))
        .alias("idw"),
        "npts",
    )


def _fanout_in_radius(
    points: DataFrame, x0, y0, cell, nx, ny, radius, lon, lat, value_col
) -> DataFrame:
    """points → (i, j, pv, d2) candidate rows for every grid cell whose
    search window contains the point (shared by all grid algorithms)."""
    r_cells = int(radius // cell) + 1
    p = points.select(
        F.col(lon).alias("px"), F.col(lat).alias("py"), F.col(value_col).cast("double").alias("pv")
    )
    p = p.withColumn("ci0", F.floor((F.col("px") - F.lit(x0)) / F.lit(cell)).cast("int"))
    p = p.withColumn("cj0", F.floor((F.col("py") - F.lit(y0)) / F.lit(cell)).cast("int"))
    offs = F.sequence(F.lit(-r_cells), F.lit(r_cells))
    p = (
        p.withColumn("di", F.explode(offs))
        .withColumn("i", F.col("ci0") + F.col("di"))
        .withColumn("dj", F.explode(offs))
        .withColumn("j", F.col("cj0") + F.col("dj"))
        .filter((F.col("i") >= 0) & (F.col("i") < nx) & (F.col("j") >= 0) & (F.col("j") < ny))
    )
    cx = F.lit(x0) + (F.col("i") + 0.5) * F.lit(cell)
    cy = F.lit(y0) + (F.col("j") + 0.5) * F.lit(cell)
    d2 = (F.col("px") - cx) * (F.col("px") - cx) + (F.col("py") - cy) * (F.col("py") - cy)
    return p.withColumn("d2", d2).filter(F.col("d2") <= F.lit(radius * radius))


def grid_moving_average(
    points: DataFrame, x0, y0, cell, nx, ny, radius,
    lon: str = "lon", lat: str = "lat", value_col: str = "v",
) -> DataFrame:
    """GDALGridMovingAverage: plain mean of points within radius."""
    p = _fanout_in_radius(points, x0, y0, cell, nx, ny, radius, lon, lat, value_col)
    return p.groupBy("i", "j").agg(
        F.round(F.avg("pv"), 6).alias("avg_v"), F.count("*").alias("npts")
    )


def grid_data_metrics(
    points: DataFrame, x0, y0, cell, nx, ny, radius,
    lon: str = "lon", lat: str = "lat", value_col: str = "v",
) -> DataFrame:
    """GDALGrid data metrics (alg/gdal_alg.h GGA_Metric*): per cell the
    Count / Minimum / Maximum / Range / AverageDistance of points in
    the search radius — one shuffle keyed by grid cell, map-side
    partial aggregation for every metric."""
    p = _fanout_in_radius(points, x0, y0, cell, nx, ny, radius, lon, lat, value_col)
    return p.groupBy("i", "j").agg(
        F.count("*").alias("m_count"),
        F.min("pv").alias("m_min"),
        F.max("pv").alias("m_max"),
        (F.max("pv") - F.min("pv")).alias("m_range"),
        F.round(F.avg(F.sqrt(F.col("d2"))), 6).alias("m_avg_dist"),
    )
