"""Polygonize kernels vs the ported polygonize_in.grd fixture
(FIXTURES.md §3, reference autotest/alg/polygonize.py:30-117)."""

import numpy as np

from gdal_spark.kernels.ccl import (
    border_runs,
    extract_polygons,
    label_tile,
    region_table,
)

GRID = np.array(
    [
        [107, 123, 132, 115, 132],
        [115, 132, 132, 123, 123],
        [115, 132, 140, 132, 123],
        [148, 132, 123, 123, 123],
        [156, 156, 156, 140, 132],
        [156, 100, 156, 101, 102],
        [156, 156, 156, 103, 103],
    ],
    dtype=np.int32,
)
GT = (440720.0, 60.0, 0.0, 3751440.0, 0.0, -60.0)
NODATA = 132

EXPECT_MASKED_4 = sorted([107, 123, 115, 115, 140, 148, 123, 140, 100, 101, 102, 156, 103])
EXPECT_NOMASK_4 = sorted(
    [107, 123, 115, 132, 115, 140, 132, 132, 148, 123, 140, 132, 100, 101, 102, 156, 103]
)


def test_polygonize_masked_4conn():
    labels = label_tile(GRID, mask=GRID != NODATA, connect8=False)
    polys = extract_polygons(GRID, labels, GT)
    assert len(polys) == 13  # polygonize.py:53
    assert sorted(int(dn) for dn, _ in polys) == EXPECT_MASKED_4


def test_polygonize_nomask_4conn():
    labels = label_tile(GRID, connect8=False)
    polys = extract_polygons(GRID, labels, GT)
    assert len(polys) == 17  # polygonize.py:94-117
    assert sorted(int(dn) for dn, _ in polys) == EXPECT_NOMASK_4


def _norm_ring(ring: np.ndarray) -> list[tuple]:
    """Rotation- and direction-insensitive canonical form."""
    pts = [tuple(p) for p in ring[:-1]]
    best = None
    for seq in (pts, pts[::-1]):
        k = seq.index(min(seq))
        cand = seq[k:] + seq[:k]
        if best is None or cand < best:
            best = cand
    return best


def test_polygonize_dn156_geometry():
    # polygonize.py:61-67: DN=156 polygon is a 3×3-cell square with a
    # 1-cell hole.
    labels = label_tile(GRID, mask=GRID != NODATA, connect8=False)
    polys = extract_polygons(GRID, labels, GT)
    rings = next(r for dn, r in polys if dn == 156)
    assert len(rings) == 2
    exp_outer = np.array(
        [
            [440720, 3751200],
            [440720, 3751020],
            [440900, 3751020],
            [440900, 3751200],
            [440720, 3751200],
        ],
        dtype=float,
    )
    exp_hole = np.array(
        [
            [440780, 3751140],
            [440840, 3751140],
            [440840, 3751080],
            [440780, 3751080],
            [440780, 3751140],
        ],
        dtype=float,
    )
    assert _norm_ring(rings[0]) == _norm_ring(exp_outer)
    assert _norm_ring(rings[1]) == _norm_ring(exp_hole)


def test_8conn_merges_diagonals():
    grid = np.array([[1, 0], [0, 1]], dtype=np.int32)
    l4 = label_tile(grid, connect8=False)
    l8 = label_tile(grid, connect8=True)
    assert l4.max() == 3  # four separate components
    assert l8.max() == 1  # two (diagonals merged)


def test_border_runs():
    labels = label_tile(GRID, mask=GRID != NODATA)
    runs = border_runs(GRID, labels)
    sides = {s for s, *_ in runs}
    assert sides <= {"N", "S", "E", "W"}
    n_runs = [r for r in runs if r[0] == "N"]
    # top row: 107 | 123 | (132 masked) | 115 | (132 masked)
    assert [(r[1], r[2]) for r in n_runs] == [(0, 1), (1, 2), (3, 4)]


def test_region_table_counts():
    labels = label_tile(GRID, mask=GRID != NODATA)
    rows = region_table(GRID, labels)
    total = sum(c for _, _, c, _, _ in rows)
    assert total == int((GRID != NODATA).sum())
