"""Scale-holding probe for the raster operator suite.

Runs the heavyweight raster operators (bilinear warp, cross-tile
polygonize, hillshade halo pass, two-layer mosaic) on synthetic
rasters of growing size at fixed parallelism and reports Mpx/s per
op per size.  The property that extrapolates to a 10^12-px raster on
a real cluster is NOT the absolute rate but the trend: per-pixel cost
must stay flat (or fall, as fixed per-job latency amortizes) as the
raster grows 16×.

Synthetic input: z(gx, gy) integer DEM (same family as the query
fixtures); the polygonize band is the 64-px-block quantization so the
region count stays O((n/64)²) — the realistic regime (rasters that
polygonize to millions of tiny regions are reclassified first in any
real pipeline, exactly as the reference's sieve step does).

Usage: ``python -m gdal_spark.plans.rasterbench [sizes...]`` —
prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd


TILE = 256


def _tiles(spark, n: int, block_band: bool):
    from pyspark.sql import functions as F  # noqa: F401
    from gdal_spark.operators.rasterize import TILE_SCHEMA

    nt = n // TILE

    def gen(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for _, row in pdf.iterrows():
                t = int(row["id"])
                tx, ty = t % nt, t // nt
                gx = np.arange(TILE) + tx * TILE
                gy = np.arange(TILE) + ty * TILE
                GX, GY = np.meshgrid(gx, gy)
                if block_band:
                    z = ((GX // 64 + GY // 64) % 5 + 1).astype(np.float64)
                else:
                    z = ((GX * 7 + GY * 13) % 97 + (GX * GX) % 23).astype(np.float64)
                rows.append((0, tx, ty, 1, z.tobytes(), "float64", 0.0))
            yield pd.DataFrame(
                rows, columns=["z", "tx", "ty", "band", "data", "dtype", "nodata"]
            )

    return (
        spark.range(nt * nt)
        .repartition(min(nt * nt, 64))
        .mapInPandas(gen, TILE_SCHEMA)
        .persist()
    )


def run(spark, sizes=(1024, 2048, 4096)) -> dict:
    from gdal_spark.operators.focal import hillshade_tiles
    from gdal_spark.operators.mosaic import mosaic_tiles
    from gdal_spark.operators.polygonize import polygonize_tiles
    from gdal_spark.operators.warp import warp_resample

    out: dict = {"tile": TILE, "sizes": {}}
    for n in sizes:
        dem = _tiles(spark, n, block_band=False)
        blocks = _tiles(spark, n, block_band=True)
        dem.count(), blocks.count()  # materialize synth outside timings
        px = float(n * n)
        res: dict = {}

        t0 = time.time()
        warp_resample(
            dem, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
            (0.25, 1.0, 0.0, 0.25, 0.0, 1.0), n - 1, n - 1,
            tile_size=TILE, method="bilinear",
        ).count()
        res["warp_bilinear_mpx_s"] = round(px / (time.time() - t0) / 1e6, 2)

        t0 = time.time()
        polygonize_tiles(blocks, nodata=None, connect8=True, tile_size=TILE).count()
        res["polygonize_8conn_mpx_s"] = round(px / (time.time() - t0) / 1e6, 2)

        t0 = time.time()
        hillshade_tiles(dem, TILE, n, n).count()
        res["hillshade_mpx_s"] = round(px / (time.time() - t0) / 1e6, 2)

        t0 = time.time()
        mosaic_tiles([dem, blocks], tile_size=TILE, nodata=-1.0, method="last").count()
        res["mosaic_mpx_s"] = round(px / (time.time() - t0) / 1e6, 2)

        out["sizes"][str(n)] = res
        dem.unpersist()
        blocks.unpersist()
    return out


def main() -> None:
    from gdal_spark import get_spark

    sizes = tuple(int(a) for a in sys.argv[1:]) or (1024, 2048, 4096)
    spark = get_spark("rasterbench", cores=32)
    print(json.dumps(run(spark, sizes)))


if __name__ == "__main__":
    main()
