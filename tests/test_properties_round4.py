"""Hypothesis properties for the round-4 surfaces: WRAPDATELINE is
measure-preserving, PointOnSurface lands strictly inside, and
organizePolygons output is structurally consistent on random nestings."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.kernels import wkb as W
from gdal_spark.kernels.geomops import organize_rings
from gdal_spark.kernels.pip import points_in_polygon


def _rect(x0, y0, w, h):
    return np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
        dtype=np.float64,
    )


def _mp_area_and_count(blob: bytes):
    gtype, parts = W.parse_wkb(blob)
    assert gtype == W.MULTIPOLYGON
    total = 0.0
    for _t, rings in parts:
        for j, r in enumerate(rings):
            a = 0.5 * float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))
            total += abs(a) if j == 0 else -abs(a)
    return total, len(parts)


@settings(max_examples=40, deadline=None)
@given(
    lon0=st.integers(150, 200), w=st.integers(1, 40),
    lat0=st.integers(-80, 70), h=st.integers(1, 15),
)
def test_wrapdateline_preserves_area(lon0, w, lat0, h):
    """Splitting at the antimeridian never gains or loses area, and the
    piece count is 2 exactly when the rect straddles 180."""
    from gdal_spark.functions.st import st_wrapdateline

    ring = _rect(lon0, lat0, w, h)
    out = st_wrapdateline.func(pd.Series([W.polygon_wkb([ring])]))
    area, n = _mp_area_and_count(bytes(out[0]))
    assert area == float(w * h)
    crosses = lon0 < 180 < lon0 + w
    assert n == (2 if crosses else 1)


@settings(max_examples=40, deadline=None)
@given(
    Wv=st.integers(6, 30), Hv=st.integers(5, 20),
    a=st.integers(1, 2), b=st.integers(1, 2), d=st.integers(1, 3),
)
def test_point_on_surface_strictly_inside(Wv, Hv, a, b, d):
    """The returned point is STRICTLY interior for any U-shape (arm
    widths a/b, base depth d < H)."""
    from gdal_spark.functions.st import st_point_on_surface

    if d >= Hv:
        return
    if a + b >= Wv:
        return
    ring = np.array(
        [[0, 0], [Wv, 0], [Wv, Hv], [Wv - b, Hv], [Wv - b, d],
         [a, d], [a, Hv], [0, Hv], [0, 0]],
        dtype=np.float64,
    )
    out = st_point_on_surface.func(pd.Series([W.polygon_wkb([ring])]))
    px, py = out[0]
    inside = points_in_polygon(
        np.array([px]), np.array([py]), [ring], include_boundary=False
    )[0]
    assert bool(inside), (Wv, Hv, a, b, d, px, py)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_organize_rings_structural_invariants(seed):
    """Random non-crossing nested rects: every hole's parent strictly
    contains it and has even depth; every shell has even depth; the
    hole count equals the odd-depth count."""
    rng = np.random.default_rng(seed)
    rings = [_rect(0, 0, 200, 200)]
    # random nested chain + a disjoint sibling
    x0, y0, w, h = 0, 0, 200, 200
    for _ in range(int(rng.integers(1, 5))):
        m = int(rng.integers(1, max(min(w, h) // 3, 2)))
        x0, y0, w, h = x0 + m, y0 + m, w - 2 * m, h - 2 * m
        if w <= 2 or h <= 2:
            break
        rings.append(_rect(x0, y0, w, h))
    rings.append(_rect(300, 0, 10, 10))
    out = organize_rings(rings)
    # recompute depths independently by strict rect containment
    def contains(i, j):
        a, bq = rings[i], rings[j]
        return (a[0, 0] < bq[0, 0] and a[0, 1] < bq[0, 1]
                and a[2, 0] > bq[2, 0] and a[2, 1] > bq[2, 1])

    n = len(rings)
    depth = [sum(contains(i, j) for i in range(n) if i != j) for j in range(n)]
    for j, parent, role in out:
        if depth[j] % 2 == 0:
            assert role == "shell" and parent == -1
        else:
            assert role == "hole" and contains(parent, j)
            assert depth[parent] % 2 == 0
