"""Zonal statistics: per-zone aggregates of point/pixel values.

Reference: GDALZonalStats (alg/zonal.cpp:277-306) — COUNT, SUM, MEAN,
MIN/MAX, STDDEV, VARIETY etc. per polygon zone over raster pixels.
Distributed form: assign each row its zone (the PIP spatial join) and
groupBy(zone).agg(...) — Catalyst does partial aggregation map-side,
so the shuffle carries one partial row per (task, zone), not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gdal_spark.operators.spatial_join import spatial_join_points_in_polygons


def zonal_stats_points(
    points: DataFrame,
    zones: list[tuple],
    value_col: str,
    lon: str = "lon",
    lat: str = "lat",
    res: int = 7,
    zone_id_col: str = "zone_id",
) -> DataFrame:
    """zones: [(zone_id, wkb)] → per-zone count/sum/mean/min/max/stddev
    of ``value_col`` (the reference's core stat set, alg/zonal.cpp:277).
    Aggregate doubles are rounded (4 dp) to make results reproducible
    across accumulation orders."""
    tagged = spatial_join_points_in_polygons(
        points, zones, lon=lon, lat=lat, res=res, poly_id_col=zone_id_col
    )
    v = F.col(value_col).cast("double")
    return tagged.groupBy(zone_id_col).agg(
        F.count("*").alias("zcount"),
        F.round(F.sum(v), 4).alias("zsum"),
        F.round(F.avg(v), 4).alias("zmean"),
        F.min(v).alias("zmin"),
        F.max(v).alias("zmax"),
        F.round(F.stddev_pop(v), 4).alias("zstddev"),
        F.count_distinct(v).alias("zvariety"),
    )
