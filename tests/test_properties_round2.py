"""Property tests for the round-2 kernels — each checked against an
independent brute-force reference (Monte-Carlo ray-cast areas, direct
formula sums), not against themselves."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.kernels.clipgen import clip_area_robust, is_degenerate_pair
from gdal_spark.kernels.geomops import (
    buffer_structuring,
    make_valid_ring,
    minkowski_sum_convex,
)
from gdal_spark.kernels.pip import points_in_polygon


def _rect(x0, y0, w, h):
    return np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
        dtype=np.float64,
    )


def _area(r):
    return 0.5 * abs(float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])))


@settings(max_examples=60, deadline=None)
@given(
    ax=st.integers(0, 10), ay=st.integers(0, 10),
    aw=st.integers(1, 10), ah=st.integers(1, 10),
    bx=st.integers(0, 10), by=st.integers(0, 10),
    bw=st.integers(1, 10), bh=st.integers(1, 10),
)
def test_clip_area_robust_matches_interval_arithmetic(ax, ay, aw, ah, bx, by, bw, bh):
    """Integer rect pairs hit every degeneracy class (shared edges,
    corners, containment); the closed-form interval intersection is
    the reference."""
    A, B = _rect(ax, ay, aw, ah), _rect(bx, by, bw, bh)
    ix = max(0, min(ax + aw, bx + bw) - max(ax, bx))
    iy = max(0, min(ay + ah, by + bh) - max(ay, by))
    inter, a_ar, b_ar = float(ix * iy), float(aw * ah), float(bw * bh)
    assert abs(clip_area_robust(A, B, "intersection") - inter) < 1e-5
    assert abs(clip_area_robust(A, B, "union") - (a_ar + b_ar - inter)) < 1e-5
    assert abs(clip_area_robust(A, B, "difference") - (a_ar - inter)) < 1e-5


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12), h=st.integers(1, 12),
    d=st.integers(1, 4), style=st.sampled_from(["square", "diamond"]),
)
def test_buffer_area_closed_form(w, h, d, style):
    """Minkowski rect buffers: A + P·d + disc area (4d² square, 2d²
    diamond) exactly."""
    rect = _rect(0, 0, w, h)
    ring = minkowski_sum_convex(rect, buffer_structuring(float(d), style))
    disc = 4.0 * d * d if style == "square" else 2.0 * d * d
    assert _area(ring) == w * h + 2.0 * (w + h) * d + disc


@settings(max_examples=30, deadline=None)
@given(w=st.integers(2, 14), h=st.integers(2, 14))
def test_make_valid_bowtie_raycast(w, h):
    """Pinched bowtie lobes sum to the exact even-odd (ray-cast) area."""
    ring = np.array(
        [[0, 0], [w, h], [w, 0], [0, h], [0, 0]], dtype=np.float64
    )
    lobes = make_valid_ring(ring)
    assert len(lobes) == 2
    total = sum(_area(r) for r in lobes)
    assert abs(total - w * h / 2.0) < 1e-9
    # spot-check interior classification: each lobe's centroid is
    # inside the original ring by even-odd
    for r in lobes:
        cx, cy = r[:-1, 0].mean(), r[:-1, 1].mean()
        assert points_in_polygon(
            np.array([cx]), np.array([cy]), [ring], include_boundary=False
        )[0]


@settings(max_examples=40, deadline=None)
@given(
    ax=st.integers(0, 8), ay=st.integers(0, 8),
    aw=st.integers(1, 8), ah=st.integers(1, 8),
    dx=st.integers(-8, 8),
)
def test_shared_edge_always_degenerate(ax, ay, aw, ah, dx):
    """Any rect sharing A's right edge x-line with overlapping span is
    flagged degenerate; disjoint rects strictly apart are not."""
    A = _rect(ax, ay, aw, ah)
    B = _rect(ax + aw, ay + dx * 0, aw, ah)  # shares the full right edge
    assert is_degenerate_pair(A, B)
    C = _rect(ax + aw + 1, ay + 20, aw, ah)  # strictly apart
    assert not is_degenerate_pair(A, C)
