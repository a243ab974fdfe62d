"""Greiner–Hormann overlay kernel: known cases (partial overlap,
containment, disjoint, multi-piece, hole creation) plus a randomized
rectilinear property test — staircase polygons decompose into disjoint
rects, so every overlay area has an exact inclusion-exclusion value.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.kernels.clipgen import clip_area, general_clip


def sq(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], float)


def stair_up(x0, y0, sw, sh, k=3):
    """Ascending staircase = union of rects [x0+j·sw, x0+(j+1)·sw] ×
    [y0, y0+(j+1)·sh]."""
    pts = [[x0, y0], [x0 + k * sw, y0], [x0 + k * sw, y0 + k * sh]]
    for j in range(k - 1, 0, -1):
        pts += [[x0 + j * sw, y0 + (j + 1) * sh], [x0 + j * sw, y0 + j * sh]]
    pts += [[x0, y0 + sh]]
    return np.array(pts, float)


def stair_rects(x0, y0, sw, sh, k=3):
    return [
        (x0 + j * sw, y0, x0 + (j + 1) * sw, y0 + (j + 1) * sh)
        for j in range(k)
    ]


def rect_inter(ra, rb):
    w = min(ra[2], rb[2]) - max(ra[0], rb[0])
    h = min(ra[3], rb[3]) - max(ra[1], rb[1])
    return max(w, 0.0) * max(h, 0.0)


def test_known_cases():
    A = sq(0, 0, 4, 4)
    B = sq(2.5, 1.5, 6.5, 5.5)
    assert clip_area(A, B, "intersection") == 3.75
    assert clip_area(A, B, "union") == 28.25
    assert clip_area(A, B, "difference") == 12.25
    C = sq(1, 1, 2, 2)
    assert clip_area(A, C, "intersection") == 1.0
    assert clip_area(A, C, "union") == 16.0
    assert clip_area(A, C, "difference") == 15.0
    assert len(general_clip(A, C, "difference")) == 2  # ring + hole
    assert clip_area(A, sq(10, 10, 12, 12), "union") == 20.0


def test_multi_piece_and_holes():
    U = np.array(
        [[0, 0], [8, 0], [8, 8], [6, 8], [6, 2], [2, 2], [2, 8], [0, 8]], float
    )
    bar = sq(-0.5, 4.5, 8.5, 6.5)
    assert clip_area(U, bar, "intersection") == 8.0
    assert len(general_clip(U, bar, "intersection")) == 2
    assert clip_area(U, bar, "union") == 50.0
    assert clip_area(U, bar, "difference") == 32.0
    assert clip_area(bar, U, "difference") == 10.0
    cap = sq(-0.5, 6.5, 8.5, 8.5)
    assert clip_area(U, cap, "union") == 52.0  # donut (hole nests)


def test_random_staircase_property():
    rng = np.random.RandomState(11)
    for _ in range(30):
        swa, sha = int(rng.randint(2, 6)), int(rng.randint(2, 6))
        swb, shb = int(rng.randint(2, 6)), int(rng.randint(2, 6))
        ox = int(rng.randint(-4, 5)) + 0.5
        oy = int(rng.randint(-4, 5)) + 0.5
        A = stair_up(0, 0, swa, sha)
        B = stair_up(ox, oy, swb, shb)
        ras = stair_rects(0, 0, swa, sha)
        rbs = stair_rects(ox, oy, swb, shb)
        inter = sum(rect_inter(ra, rb) for ra in ras for rb in rbs)
        area_a = 3 * swa * (1 + 2 + 3) / 3 * sha  # Σ (j+1)·sw·sh
        area_a = sum((r[2] - r[0]) * (r[3] - r[1]) for r in ras)
        area_b = sum((r[2] - r[0]) * (r[3] - r[1]) for r in rbs)
        assert clip_area(A, B, "intersection") == inter
        assert clip_area(A, B, "union") == area_a + area_b - inter
        assert clip_area(A, B, "difference") == area_a - inter
        assert clip_area(B, A, "difference") == area_b - inter
