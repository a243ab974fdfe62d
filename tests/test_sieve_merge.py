"""sieve_tiles MERGE semantics: small regions absorb into largest
neighbour, isolated small regions survive, merges work across tiles."""

import numpy as np

from gdal_spark.kernels import wkb as W
from gdal_spark.operators.rasterize import rasterize_wkb_grid, tiles_to_features
from gdal_spark.operators.sieve import sieve_tiles

IDENTITY_GT = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def rect_wkb(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float)
    return W.polygon_wkb([ring])


def _px(df):
    return {(r["gx"], r["gy"]): r["v"] for r in df.collect()}


def test_satellite_merges_into_big_neighbor(spark):
    """2×2 satellite (dn=9) touching a 8×6 rect (dn=3) across the tile
    border at x=32: after sieve(5) every satellite pixel reads 3."""
    feats = spark.createDataFrame(
        [(3.0, rect_wkb(24, 10, 32, 16)), (9.0, rect_wkb(32, 11, 34, 13))],
        "burn double, geom binary",
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 64, 64, tile_size=32)
    out = sieve_tiles(tiles, threshold=5, nodata=0.0, tile_size=32)
    px = _px(tiles_to_features(out, tile_size=32, nodata=0.0))
    assert px[(32, 11)] == 3.0 and px[(33, 12)] == 3.0
    assert px[(24, 10)] == 3.0
    assert sum(1 for v in px.values() if v == 3.0) == 8 * 6 + 4
    assert 9.0 not in px.values()


def test_isolated_small_region_survives(spark):
    """A small region bordered only by nodata has no neighbour to merge
    into — it stays (reference behaviour with a mask)."""
    feats = spark.createDataFrame(
        [(7.0, rect_wkb(10, 10, 12, 12))], "burn double, geom binary"
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 64, 64, tile_size=32)
    out = sieve_tiles(tiles, threshold=5, nodata=0.0, tile_size=32)
    px = _px(tiles_to_features(out, tile_size=32, nodata=0.0))
    assert px == {(x, y): 7.0 for x in (10, 11) for y in (10, 11)}


def test_cascade_chain_absorbs_inward(spark):
    """chain: big A (dn=1, 36px) – B (dn=2, 4px) – C (dn=3, 2px),
    threshold 5: B merges into A (largest neighbour); C then merges
    into the grown A region → everything reads 1."""
    feats = spark.createDataFrame(
        [
            (1.0, rect_wkb(10, 10, 16, 16)),
            (2.0, rect_wkb(16, 12, 18, 14)),
            (3.0, rect_wkb(18, 12, 19, 14)),
        ],
        "burn double, geom binary",
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 64, 64, tile_size=32)
    out = sieve_tiles(tiles, threshold=5, nodata=0.0, tile_size=32)
    px = _px(tiles_to_features(out, tile_size=32, nodata=0.0))
    assert set(px.values()) == {1.0}
    assert len(px) == 36 + 4 + 2


def test_threshold_boundary_not_merged(spark):
    """A region exactly AT the threshold is kept (strictly-smaller
    rule, as the reference's nSizeThreshold comparison)."""
    feats = spark.createDataFrame(
        [(1.0, rect_wkb(10, 10, 16, 16)), (2.0, rect_wkb(16, 12, 18, 14))],
        "burn double, geom binary",
    )
    tiles = rasterize_wkb_grid(feats, IDENTITY_GT, 64, 64, tile_size=32)
    out = sieve_tiles(tiles, threshold=4, nodata=0.0, tile_size=32)
    px = _px(tiles_to_features(out, tile_size=32, nodata=0.0))
    assert px[(16, 12)] == 2.0  # 4 px >= threshold 4 → survives
