"""One-off scale probe for the round-4 continuation raster ops:
median-cut quantization at millions of pixels, Floyd-Steinberg across
hundreds of images, SURF keypoints on a 1024x1024 raster.

Run: python scripts/round4b_scaleprobe.py   (local[32], warm min-of-2)
Results recorded in BASELINE.md "scale-holding evidence".
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gdal_spark import get_spark


def probe_median_cut(spark, n):
    from gdal_spark.operators.mediancut import median_cut_quantize

    i = F.col("id")
    px = spark.range(n).select(
        i.cast("long").alias("pid"),
        ((i % 7) * 31 + (i * 7) % 29).cast("long").alias("r"),
        ((i % 7) * 29 + (i * 13) % 31).cast("long").alias("g"),
        ((i % 7) * 23 + (i * 29) % 37).cast("long").alias("b"),
    )
    t0 = time.time()
    rows = median_cut_quantize(px, rounds=3).collect()
    dt = time.time() - t0
    assert sum(r["n_box"] for r in rows) == n
    return dt


def probe_dither(spark, n_img):
    from gdal_spark.kernels.dither import floyd_steinberg_counts

    schema = "img long, n long"

    def per_img(pdf_iter):
        for pdf in pdf_iter:
            out = []
            for _, row in pdf.iterrows():
                img = int(row["id"])
                counts = floyd_steinberg_counts(img, 32, 32)
                out.append((img, int(counts.sum())))
            yield pd.DataFrame(out, columns=["img", "n"])

    t0 = time.time()
    got = spark.range(n_img).repartition(32).mapInPandas(per_img, schema).collect()
    dt = time.time() - t0
    assert all(r["n"] == 1024 for r in got)
    return dt


def probe_surf(spark, size, tile):
    from gdal_spark.operators.rasterize import TILE_SCHEMA
    from gdal_spark.operators.surf import doh_keypoints_tiles

    nt = size // tile

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                t = int(row["id"])
                tx, ty = t % nt, t // nt
                gx = np.arange(tile) + tx * tile
                gy = np.arange(tile) + ty * tile
                GX, GY = np.meshgrid(gx, gy)
                img = (
                    (((GX % 97) - 48) ** 2 + ((GY % 89) - 44) ** 2 <= 64)
                    .astype(np.int64) * 150
                    + (GX * 3 + GY * 5) % 7
                ).astype(np.float64)
                rows.append((0, tx, ty, 1, img.tobytes(), "float64", 0.0))
            yield pd.DataFrame(
                rows, columns=["z", "tx", "ty", "band", "data", "dtype", "nodata"]
            )

    tiles = spark.range(nt * nt).repartition(32).mapInPandas(gen, TILE_SCHEMA)
    t0 = time.time()
    n = doh_keypoints_tiles(tiles, tile, size, size, 2_000_000).count()
    dt = time.time() - t0
    return dt, n


if __name__ == "__main__":
    spark = get_spark("probe", cores=32, shuffle_partitions=32)
    for label, fn in [
        ("median_cut 4.2M px", lambda: probe_median_cut(spark, 4_194_304)),
        ("fs_dither 512 img x 32^2", lambda: probe_dither(spark, 512)),
    ]:
        dts = [fn() for _ in range(2)]
        print(f"{label}: {min(dts):.2f} s (min of 2)")
    for sz in (512, 1024):
        dts, ns = zip(*[probe_surf(spark, sz, 64) for _ in range(2)])
        print(f"surf {sz}x{sz}: {min(dts):.2f} s, {ns[0]} keypoints "
              f"({sz*sz/min(dts)/1e6:.1f} Mpx/s)")
