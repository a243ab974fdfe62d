"""Band statistics over the distributed tile table.

Reference: ``GDALRasterBand::ComputeStatistics`` streams blocks and
folds (count, min, max, Σv, Σv²) (gcore/gdalrasterband.cpp); the Spark
form is per-tile NumPy partials + one tiny final aggregation — a tree
reduction where the leaves are 64 KB tile buffers, which is exactly
how a 100 TB raster's stats run on 1000 executors (no pixel ever
crosses the network, only 5 numbers per tile).

Nodata pixels are excluded (the reference's default)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_stats_tiles(
    tiles: DataFrame, tile_size: int, nodata: float | None = 0.0
) -> DataFrame:
    """(n, vmin, vmax, mean, stddev_pop) over non-nodata pixels.

    Partials keep integer-exact Σv and Σv² (int64) so the final
    mean/std arithmetic is deterministic across engines."""

    def partial(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
                    tile_size, tile_size
                )
                vals = arr[arr != nodata] if nodata is not None else arr.reshape(-1)
                if vals.size == 0:
                    continue
                iv = vals.astype(np.int64)
                rows.append(
                    (
                        int(vals.size),
                        float(vals.min()),
                        float(vals.max()),
                        int(iv.sum()),
                        int((iv * iv).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["n", "vmin", "vmax", "s", "ss"]
            )

    p = tiles.mapInPandas(
        partial, "n long, vmin double, vmax double, s long, ss long"
    )
    agg = p.agg(
        F.sum("n").alias("n"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s") / n
    return agg.select(
        "n",
        "vmin",
        "vmax",
        F.round(mean, 6).alias("mean"),
        F.round(F.sqrt(F.col("ss") / n - mean * mean), 6).alias("stddev_pop"),
    )


def band_histogram_tiles(
    tiles: DataFrame,
    tile_size: int,
    bucket_width: int = 16,
    nodata: float | None = 0.0,
) -> DataFrame:
    """GDALRasterBand::GetHistogram as per-tile bincount partials +
    one bucket-keyed combine (bucket = floor(v / width) on integral
    values; nodata excluded).  Histogram cardinality is O(buckets), so
    the shuffle moves a few rows per tile regardless of raster size."""

    def partial(pdf_iter):
        for pdf in pdf_iter:
            frames = []
            for _, row in pdf.iterrows():
                arr = np.frombuffer(row["data"], dtype=np.dtype(row["dtype"])).reshape(
                    tile_size, tile_size
                )
                vals = arr[arr != nodata] if nodata is not None else arr.reshape(-1)
                if vals.size == 0:
                    continue
                b = np.floor_divide(vals.astype(np.int64), bucket_width)
                uniq, cnt = np.unique(b, return_counts=True)
                frames.append(pd.DataFrame({"bucket": uniq, "n": cnt}))
            yield pd.concat(frames) if frames else pd.DataFrame({"bucket": [], "n": []})

    p = tiles.mapInPandas(partial, "bucket long, n long")
    return p.groupBy("bucket").agg(F.sum("n").alias("n"))
