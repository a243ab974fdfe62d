"""mosaic_tiles compositing methods on two overlapping rect layers."""

import numpy as np

from gdal_spark.kernels import wkb as W
from gdal_spark.operators.mosaic import mosaic_tiles
from gdal_spark.operators.rasterize import rasterize_wkb_grid, tiles_to_features

IDENTITY_GT = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def rect_wkb(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)
    return W.polygon_wkb([ring])


def _layers(spark):
    l1 = spark.createDataFrame([(3.0, rect_wkb(10, 10, 30, 30))], "burn double, geom binary")
    l2 = spark.createDataFrame([(7.0, rect_wkb(20, 20, 40, 40))], "burn double, geom binary")
    return (
        rasterize_wkb_grid(l1, IDENTITY_GT, 64, 64, tile_size=32),
        rasterize_wkb_grid(l2, IDENTITY_GT, 64, 64, tile_size=32),
    )


def _px(spark, method):
    t1, t2 = _layers(spark)
    out = mosaic_tiles([t1, t2], tile_size=32, nodata=0.0, method=method)
    return {(r["gx"], r["gy"]): r["v"] for r in
            tiles_to_features(out, tile_size=32, nodata=0.0).collect()}


def test_methods(spark):
    cases = {
        "last": (3.0, 7.0, 7.0),    # (only-l1, overlap, only-l2)
        "first": (3.0, 3.0, 7.0),
        "sum": (3.0, 10.0, 7.0),
        "max": (3.0, 7.0, 7.0),
        "min": (3.0, 3.0, 7.0),
    }
    for method, (a, b, c) in cases.items():
        px = _px(spark, method)
        assert px[(10, 10)] == a, method
        assert px[(25, 25)] == b, method
        assert px[(35, 35)] == c, method
        assert len(px) == 20 * 20 * 2 - 10 * 10, method
