"""Salted two-phase feature burn: bitwise parity with the single-phase
plan for BOTH merge semantics (ADD = partial-sum merge, REPLACE =
per-pixel last-writer-wins by feature sequence)."""

import numpy as np
import pyspark.sql.functions as F

from gdal_spark.kernels import wkb as W
from gdal_spark.operators.rasterize import rasterize_wkb_grid
from gdal_spark.session import local_df

IDENTITY_GT = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def _overlapping_rect_feats(spark, n=40):
    rows = []
    for k in range(n):
        x0 = (k * 7) % 40
        y0 = (k * 11) % 40
        w = 6 + k % 9
        h = 5 + k % 7
        ring = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
            dtype=np.float64,
        )
        rows.append((float(k + 1), W.polygon_wkb([ring])))
    return local_df(spark, rows, "burn double, geom binary")


def _tile_hashes(df):
    return (
        df.select("tx", "ty", F.md5(F.col("data")).alias("h"))
        .toPandas()
        .sort_values(["tx", "ty"])
        .reset_index(drop=True)
    )


def test_replace_salted_parity(spark):
    feats = _overlapping_rect_feats(spark)
    a = _tile_hashes(rasterize_wkb_grid(feats, IDENTITY_GT, 64, 64, tile_size=32))
    b = _tile_hashes(
        rasterize_wkb_grid(feats, IDENTITY_GT, 64, 64, tile_size=32, salt=8)
    )
    assert len(a) and a.equals(b)


def test_add_salted_parity(spark):
    feats = _overlapping_rect_feats(spark)
    a = _tile_hashes(
        rasterize_wkb_grid(feats, IDENTITY_GT, 64, 64, tile_size=32, merge_add=True)
    )
    b = _tile_hashes(
        rasterize_wkb_grid(
            feats, IDENTITY_GT, 64, 64, tile_size=32, merge_add=True, salt=8
        )
    )
    assert len(a) and a.equals(b)
