"""Exact separable EDT vs brute force on random target sets, and
agreement with the bounded halo kernel inside its radius."""

import numpy as np

from gdal_spark.kernels import wkb as W
from gdal_spark.operators.focal import proximity_tiles, proximity_unbounded
from gdal_spark.operators.rasterize import rasterize_wkb_grid

IDENTITY_GT = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def _tiles_from_points(spark, pts, size=64):
    rows = []
    for x, y in pts:
        ring = np.array(
            [[x, y], [x + 1, y], [x + 1, y + 1], [x, y + 1], [x, y]], dtype=float
        )
        rows.append((1.0, W.polygon_wkb([ring])))
    feats = spark.createDataFrame(rows, "burn double, geom binary")
    return rasterize_wkb_grid(feats, IDENTITY_GT, size, size, tile_size=32)


def _brute(pts, size=64):
    tx = np.array([p[0] for p in pts])
    ty = np.array([p[1] for p in pts])
    gx, gy = np.meshgrid(np.arange(size), np.arange(size))
    d2 = ((gx[..., None] - tx) ** 2 + (gy[..., None] - ty) ** 2).min(axis=-1)
    return np.round(np.sqrt(d2.astype(np.float64)), 6)


def test_random_targets_match_brute_force(spark):
    rng = np.random.RandomState(42)
    for trial in range(3):
        pts = {(int(x), int(y)) for x, y in rng.randint(0, 64, size=(8, 2))}
        tiles = _tiles_from_points(spark, sorted(pts))
        got = {
            (r["gx"], r["gy"]): r["dist"]
            for r in proximity_unbounded(tiles, 32, 64, 64).collect()
        }
        expect = _brute(sorted(pts))
        assert len(got) == 64 * 64
        for (x, y), d in got.items():
            assert d == expect[y, x], (trial, x, y, d, expect[y, x])


def test_agrees_with_bounded_kernel(spark):
    pts = [(5, 5), (40, 50), (60, 10)]
    tiles = _tiles_from_points(spark, pts)
    unb = {
        (r["gx"], r["gy"]): r["dist"]
        for r in proximity_unbounded(tiles, 32, 64, 64).collect()
    }
    bnd = {
        (r["gx"], r["gy"]): r["dist"]
        for r in proximity_tiles(tiles, 32, 64, 64, max_dist=8).collect()
    }
    for k, v in bnd.items():
        assert unb[k] == v


def test_dense_mask_matches_brute_force(spark):
    """Dense target mask (~40% of pixels): the per-column-block target
    shuffle must handle thousands of targets with no driver collect and
    still be exact; also exercises multiple row/col blocks."""
    rng = np.random.RandomState(7)
    mask = rng.rand(64, 64) < 0.4
    pts = sorted((int(x), int(y)) for y, x in zip(*np.nonzero(mask)))
    tiles = _tiles_from_points(spark, pts)
    got = {
        (r["gx"], r["gy"]): r["dist"]
        for r in proximity_unbounded(
            tiles, 32, 64, 64, row_block=16, col_block=16
        ).collect()
    }
    want = _brute(pts)
    assert len(got) == 64 * 64
    for (x, y), d in got.items():
        assert d == want[y, x]
