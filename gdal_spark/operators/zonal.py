"""Zonal statistics: per-zone aggregates of point/pixel values.

Reference: GDALZonalStats (alg/zonal.cpp:277-306) — COUNT, SUM, MEAN,
MIN/MAX, STDDEV, VARIETY etc. per polygon zone over raster pixels.
Distributed form: assign each row its zone (the PIP spatial join) and
groupBy(zone).agg(...) — Catalyst does partial aggregation map-side,
so the shuffle carries one partial row per (task, zone), not the data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def zonal_stats_raster(
    zone_tiles: DataFrame,
    value_tiles: DataFrame,
    tile_size: int,
    zone_nodata: float = 0.0,
) -> DataFrame:
    """GDALZonalStats raster path (alg/zonal.cpp, CLI
    apps/gdalalg_raster_zonal_stats.cpp): per zone-raster value,
    aggregate the value raster's pixels.

    Physical plan: the zone and value tile tables join on the tile key
    — with both written tile-partitioned this is a co-located join (no
    data movement beyond the scan on a bucketed/Iceberg layout); each
    task folds one tile pair into per-zone integer-exact partials
    (count, Σv, Σv², min, max via np.bincount), and the final combine
    shuffles one row per (task, zone) — never pixels."""
    z = zone_tiles.select(
        "tx", "ty", F.col("data").alias("_zdata"), F.col("dtype").alias("_zdtype")
    )
    v = value_tiles.select(
        "tx", "ty", F.col("data").alias("_vdata"), F.col("dtype").alias("_vdtype")
    )
    joined = z.join(v, ["tx", "ty"])

    def partial(pdf_iter):
        for pdf in pdf_iter:
            frames = []
            for _, row in pdf.iterrows():
                zones = np.frombuffer(row["_zdata"], dtype=np.dtype(row["_zdtype"])).reshape(
                    tile_size, tile_size
                )
                vals = np.frombuffer(row["_vdata"], dtype=np.dtype(row["_vdtype"])).reshape(
                    tile_size, tile_size
                )
                m = zones != zone_nodata
                if not m.any():
                    continue
                zid = zones[m].astype(np.int64)
                iv = vals[m].astype(np.int64)
                uniq, inv = np.unique(zid, return_inverse=True)
                n = np.bincount(inv)
                s = np.bincount(inv, weights=iv.astype(np.float64)).astype(np.int64)
                ss = np.bincount(inv, weights=(iv * iv).astype(np.float64)).astype(np.int64)
                vmin = np.full(uniq.size, np.iinfo(np.int64).max)
                vmax = np.full(uniq.size, np.iinfo(np.int64).min)
                np.minimum.at(vmin, inv, iv)
                np.maximum.at(vmax, inv, iv)
                frames.append(
                    pd.DataFrame(
                        {"zone": uniq, "n": n, "s": s, "ss": ss,
                         "vmin": vmin, "vmax": vmax}
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"zone": [], "n": [], "s": [], "ss": [], "vmin": [], "vmax": []}
            )

    p = joined.mapInPandas(
        partial, "zone long, n long, s long, ss long, vmin long, vmax long"
    )
    agg = p.groupBy("zone").agg(
        F.sum("n").alias("n"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )
    nD = F.col("n").cast("double")
    mean = F.col("s") / nD
    return agg.select(
        "zone", "n", "vmin", "vmax",
        F.round(mean, 6).alias("mean"),
        F.round(F.sqrt(F.col("ss") / nD - mean * mean), 6).alias("stddev_pop"),
    )


def zonal_histogram(
    zone_tiles: DataFrame,
    value_tiles: DataFrame,
    tile_size: int,
    zone_nodata: float = 0.0,
) -> DataFrame:
    """(zone, v, cnt) — the per-zone value histogram behind the
    reference zonal stats' mode/variety/minority outputs
    (apps/gdalalg_raster_zonal_stats.cpp): same co-located tile-pair
    join as ``zonal_stats_raster``, each task emitting unique
    (zone, value) partial counts — the shuffle carries histogram rows,
    never pixels."""
    z = zone_tiles.select(
        "tx", "ty", F.col("data").alias("_zdata"), F.col("dtype").alias("_zdtype")
    )
    v = value_tiles.select(
        "tx", "ty", F.col("data").alias("_vdata"), F.col("dtype").alias("_vdtype")
    )
    joined = z.join(v, ["tx", "ty"])
    schema = T.StructType(
        [
            T.StructField("zone", T.LongType()),
            T.StructField("v", T.LongType()),
            T.StructField("cnt", T.LongType()),
        ]
    )

    def partial(pdf_iter):
        for pdf in pdf_iter:
            frames = []
            for _, row in pdf.iterrows():
                zones = np.frombuffer(row["_zdata"], dtype=np.dtype(row["_zdtype"])).reshape(
                    tile_size, tile_size
                )
                vals = np.frombuffer(row["_vdata"], dtype=np.dtype(row["_vdtype"])).reshape(
                    tile_size, tile_size
                )
                m = zones != zone_nodata
                if not m.any():
                    continue
                pairs = np.stack([zones[m].astype(np.int64), vals[m].astype(np.int64)])
                uniq, cnt = np.unique(pairs, axis=1, return_counts=True)
                frames.append(
                    pd.DataFrame({"zone": uniq[0], "v": uniq[1], "cnt": cnt})
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"zone": [], "v": [], "cnt": []}
            )

    return (
        joined.mapInPandas(partial, schema)
        .groupBy("zone", "v")
        .agg(F.sum("cnt").alias("cnt"))
    )


def zonal_weighted_raster(
    zone_tiles: DataFrame,
    value_tiles: DataFrame,
    weight_tiles: DataFrame,
    tile_size: int,
    zone_nodata: float = 0.0,
) -> DataFrame:
    """WEIGHTED_SUM / WEIGHTED_MEAN / WEIGHTED_STDEV / WEIGHTED_VARIANCE
    (alg/zonal.cpp Stat::WEIGHTED_*): a third tile table supplies the
    weight raster; the same co-located three-way tile join folds each
    tile triple into integer-exact partials (Σw, Σw·v, Σw·v²) and the
    combine shuffles one row per (task, zone)."""
    z = zone_tiles.select(
        "tx", "ty", F.col("data").alias("_zdata"), F.col("dtype").alias("_zdtype")
    )
    v = value_tiles.select(
        "tx", "ty", F.col("data").alias("_vdata"), F.col("dtype").alias("_vdtype")
    )
    w = weight_tiles.select(
        "tx", "ty", F.col("data").alias("_wdata"), F.col("dtype").alias("_wdtype")
    )
    joined = z.join(v, ["tx", "ty"]).join(w, ["tx", "ty"])

    def partial(pdf_iter):
        for pdf in pdf_iter:
            frames = []
            for _, row in pdf.iterrows():
                zones = np.frombuffer(row["_zdata"], dtype=np.dtype(row["_zdtype"])).reshape(
                    tile_size, tile_size
                )
                vals = np.frombuffer(row["_vdata"], dtype=np.dtype(row["_vdtype"])).reshape(
                    tile_size, tile_size
                )
                wts = np.frombuffer(row["_wdata"], dtype=np.dtype(row["_wdtype"])).reshape(
                    tile_size, tile_size
                )
                m = zones != zone_nodata
                if not m.any():
                    continue
                zid = zones[m].astype(np.int64)
                iv = vals[m].astype(np.int64)
                iw = wts[m].astype(np.int64)
                uniq, inv = np.unique(zid, return_inverse=True)
                sw = np.bincount(inv, weights=iw.astype(np.float64)).astype(np.int64)
                swv = np.bincount(inv, weights=(iw * iv).astype(np.float64)).astype(np.int64)
                swvv = np.bincount(
                    inv, weights=(iw * iv * iv).astype(np.float64)
                ).astype(np.int64)
                frames.append(
                    pd.DataFrame({"zone": uniq, "sw": sw, "swv": swv, "swvv": swvv})
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"zone": [], "sw": [], "swv": [], "swvv": []}
            )

    p = joined.mapInPandas(partial, "zone long, sw long, swv long, swvv long")
    agg = p.groupBy("zone").agg(
        F.sum("sw").alias("sw"),
        F.sum("swv").alias("swv"),
        F.sum("swvv").alias("swvv"),
    )
    swD = F.col("sw").cast("double")
    mean = F.col("swv") / swD
    return agg.select(
        "zone",
        F.col("swv").alias("wsum"),
        F.round(mean, 6).alias("wmean"),
        F.round(F.col("swvv") / swD - mean * mean, 6).alias("wvariance"),
        F.round(F.sqrt(F.col("swvv") / swD - mean * mean), 6).alias("wstdev"),
    )


def zonal_minmax_location(
    zone_tiles: DataFrame,
    value_tiles: DataFrame,
    tile_size: int,
    zone_nodata: float = 0.0,
) -> DataFrame:
    """MIN_CENTER_X/Y and MAX_CENTER_X/Y (alg/zonal.cpp Stat enum):
    cell-center coordinates of the extreme pixels, tie → first in
    row-major scan order (smallest (gy, gx)).  Per-tile partials carry
    one candidate row per (tile, zone, kind); the global argmin/argmax
    is a window pick — never a pixel shuffle."""
    z = zone_tiles.select(
        "tx", "ty", F.col("data").alias("_zdata"), F.col("dtype").alias("_zdtype")
    )
    v = value_tiles.select(
        "tx", "ty", F.col("data").alias("_vdata"), F.col("dtype").alias("_vdtype")
    )
    joined = z.join(v, ["tx", "ty"])

    def partial(pdf_iter):
        for pdf in pdf_iter:
            frames = []
            for _, row in pdf.iterrows():
                zones = np.frombuffer(row["_zdata"], dtype=np.dtype(row["_zdtype"])).reshape(
                    tile_size, tile_size
                )
                vals = np.frombuffer(row["_vdata"], dtype=np.dtype(row["_vdtype"])).reshape(
                    tile_size, tile_size
                )
                tx, ty = int(row["tx"]), int(row["ty"])
                m = zones != zone_nodata
                if not m.any():
                    continue
                ys, xs = np.nonzero(m)
                zid = zones[m].astype(np.int64)
                iv = vals[m].astype(np.int64)
                gx = xs + tx * tile_size
                gy = ys + ty * tile_size
                rows = []
                for zu in np.unique(zid):
                    sel = zid == zu
                    vv, gxx, gyy = iv[sel], gx[sel], gy[sel]
                    for kind, idx in (
                        ("min", np.lexsort((gxx, gyy, vv))[0]),
                        ("max", np.lexsort((gxx, gyy, -vv))[0]),
                    ):
                        rows.append(
                            (int(zu), kind, int(vv[idx]), int(gy[sel][idx]), int(gxx[idx]))
                        )
                frames.append(
                    pd.DataFrame(rows, columns=["zone", "kind", "v", "gy", "gx"])
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"zone": [], "kind": [], "v": [], "gy": [], "gx": []}
            )

    from pyspark.sql import Window

    p = joined.mapInPandas(partial, "zone long, kind string, v long, gy long, gx long")
    wmin = Window.partitionBy("zone").orderBy(F.col("v").asc(), F.col("gy"), F.col("gx"))
    wmax = Window.partitionBy("zone").orderBy(F.col("v").desc(), F.col("gy"), F.col("gx"))
    mn = (
        p.filter(F.col("kind") == "min")
        .withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select(
            "zone", F.col("v").alias("vmin"),
            (F.col("gx") + 0.5).alias("min_cx"), (F.col("gy") + 0.5).alias("min_cy"),
        )
    )
    mx = (
        p.filter(F.col("kind") == "max")
        .withColumn("rn", F.row_number().over(wmax))
        .filter(F.col("rn") == 1)
        .select(
            "zone", F.col("v").alias("vmax"),
            (F.col("gx") + 0.5).alias("max_cx"), (F.col("gy") + 0.5).alias("max_cy"),
        )
    )
    return mn.join(mx, "zone")
