"""warp_resample invariants: identity warp reproduces the source,
integer shift translates it, bilinear at exact centers is lossless."""

import numpy as np

from gdal_spark.kernels import wkb as W
from gdal_spark.operators.rasterize import rasterize_wkb_grid, tiles_to_features
from gdal_spark.operators.warp import warp_resample

IDENTITY_GT = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def rect_wkb(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)
    return W.polygon_wkb([ring])


def _src(spark):
    feats = spark.createDataFrame(
        [(3.0, rect_wkb(10, 10, 40, 30)), (5.0, rect_wkb(50, 33, 61, 62))],
        "burn double, geom binary",
    )
    return rasterize_wkb_grid(feats, IDENTITY_GT, 64, 64, tile_size=32)


def _px(df):
    return {(r["gx"], r["gy"]): r["v"] for r in df.collect()}


def test_identity_nearest(spark):
    src = _src(spark)
    out = warp_resample(src, IDENTITY_GT, IDENTITY_GT, 64, 64, tile_size=32)
    assert _px(tiles_to_features(out, tile_size=32, nodata=0.0)) == _px(
        tiles_to_features(src, tile_size=32, nodata=0.0)
    )


def test_integer_shift_nearest(spark):
    src = _src(spark)
    out = warp_resample(
        src, IDENTITY_GT, (5.0, 1.0, 0.0, -7.0, 0.0, 1.0), 64, 64, tile_size=32
    )
    shifted = {
        (gx - 5, gy + 7): v
        for (gx, gy), v in _px(tiles_to_features(src, 32, nodata=0.0)).items()
    }
    expect = {k: v for k, v in shifted.items() if 0 <= k[0] < 64 and 0 <= k[1] < 64}
    assert _px(tiles_to_features(out, tile_size=32, nodata=0.0)) == expect


def test_identity_bilinear_lossless(spark):
    src = _src(spark)
    out = warp_resample(
        src, IDENTITY_GT, IDENTITY_GT, 64, 64, tile_size=32, method="bilinear"
    )
    assert _px(tiles_to_features(out, tile_size=32, nodata=0.0)) == _px(
        tiles_to_features(src, tile_size=32, nodata=0.0)
    )


def test_downsample_2x_nearest(spark):
    src = _src(spark)
    out = warp_resample(
        src, IDENTITY_GT, (0.0, 2.0, 0.0, 0.0, 0.0, 2.0), 32, 32, tile_size=32
    )
    srcpx = _px(tiles_to_features(src, 32, nodata=0.0))
    expect = {
        (i, j): srcpx[(2 * i + 1, 2 * j + 1)]
        for i in range(32)
        for j in range(32)
        if (2 * i + 1, 2 * j + 1) in srcpx
    }
    assert _px(tiles_to_features(out, tile_size=32, nodata=0.0)) == expect


def test_rotated_transpose(spark):
    src = _src(spark)
    out = warp_resample(
        src, IDENTITY_GT, (0.0, 0.0, 1.0, 0.0, 1.0, 0.0), 64, 64,
        tile_size=32, method="nearest",
    )
    got = _px(tiles_to_features(out, tile_size=32, nodata=0.0))
    expect = {
        (gy, gx): v
        for (gx, gy), v in _px(tiles_to_features(src, 32, nodata=0.0)).items()
    }
    assert got == expect


def test_rotated_bilinear_identity_values(spark):
    """45°-free sanity on the rotated path: swapping axes twice (dst
    grid swaps, then compare against the plain transpose) with
    bilinear at exact centers is lossless."""
    src = _src(spark)
    out = warp_resample(
        src, IDENTITY_GT, (0.0, 0.0, 1.0, 0.0, 1.0, 0.0), 64, 64,
        tile_size=32, method="bilinear",
    )
    got = _px(tiles_to_features(out, tile_size=32, nodata=0.0))
    expect = {
        (gy, gx): v
        for (gx, gy), v in _px(tiles_to_features(src, 32, nodata=0.0)).items()
    }
    assert got == expect


def test_average_upsample_empty_footprint_emits_fill(spark):
    """ADVICE round-3 (medium): on a 2x UPSAMPLE each dst pixel's
    footprint holds at most one src center and three of four hold
    none — those must emit `fill` (dropped by nodata), never 0/1=0.0
    or a fill-padding 'contributor'."""
    src = _src(spark)
    out = warp_resample(
        src, IDENTITY_GT, (0.0, 0.5, 0.0, 0.0, 0.0, 0.5), 128, 128,
        tile_size=32, method="average", fill=-999.0,
        src_width=64, src_height=64,
    )
    got = _px(tiles_to_features(out, tile_size=32, nodata=-999.0))
    src_px = _px(tiles_to_features(src, tile_size=32, nodata=None))
    # dst pixel (i, j) spans src x ∈ [i/2, (i+1)/2): contains the src
    # center k+0.5 iff i == 2k+1 — only odd dst rows AND columns survive
    expect = {
        (2 * kx + 1, 2 * ky + 1): v
        for (kx, ky), v in src_px.items()
    }
    assert got == expect


def test_average_edge_excludes_out_of_raster(spark):
    """ADVICE round-3 (medium): a 2x DOWNSAMPLE of a 63-wide raster —
    the last dst column's footprint covers src x ∈ [62, 64) but only
    x=62 is in-raster; the average must divide by the IN-RASTER count
    (1), not by the window size (2) with fill counted."""
    src = _src(spark)  # 64x64 tile table; declare raster as 63 wide
    out = warp_resample(
        src, IDENTITY_GT, (0.0, 2.0, 0.0, 0.0, 0.0, 2.0), 32, 32,
        tile_size=32, method="average", src_width=63, src_height=64,
    )
    got = _px(tiles_to_features(out, tile_size=32, nodata=None))
    src_px = _px(tiles_to_features(src, tile_size=32, nodata=None))
    for gy in range(32):
        vals = [src_px[(62, 2 * gy)], src_px[(62, 2 * gy + 1)]]
        assert got[(31, gy)] == sum(vals) / 2.0  # count 2, not 4
