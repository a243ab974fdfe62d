"""Property-based invariants (hypothesis) over the NumPy kernels —
no SparkSession needed, so these run fast and explore corners the
fixture tests don't."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.kernels.burn import burn_polygon
from gdal_spark.kernels.cells import cell_decode, cell_encode, cell_parent, s2_encode
from gdal_spark.kernels.ccl import label_tile, region_table
from gdal_spark.kernels.clip import clip_convex, ring_area
from gdal_spark.kernels.geodesy import hilbert_d2xy, hilbert_xy2d
from gdal_spark.kernels.pip import points_in_polygon

rects = st.tuples(
    st.integers(1, 50), st.integers(1, 50), st.integers(2, 12), st.integers(2, 12)
)


@given(st.lists(rects, min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_burn_then_ccl_recovers_rect_areas(rs):
    """Disjoint integer rects: burn → CCL → region pixel counts == w·h."""
    # space rects on a 16px lattice so they never touch
    arr = np.zeros((128, 128), dtype=np.float64)
    expected = {}
    for i, (cx, cy, w, h) in enumerate(rs[:6]):
        x0 = (i % 4) * 32 + 2 + (cx % 8)
        y0 = (i // 4) * 32 + 2 + (cy % 8)
        w = min(w, 12)
        h = min(h, 12)
        ring = np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
            dtype=float,
        )
        burn_polygon(arr, [ring], float(i + 1))
        expected[float(i + 1)] = w * h
    labels = label_tile(arr, mask=arr != 0, connect8=False)
    got = {}
    for _lab, dn, cnt, _, _ in region_table(arr, labels):
        got[float(dn)] = got.get(float(dn), 0) + cnt
    assert got == expected


@given(
    st.lists(
        st.tuples(st.floats(-179, 179), st.floats(-89, 89)), min_size=1, max_size=50
    ),
    st.integers(1, 12),
)
@settings(max_examples=50, deadline=None)
def test_cell_encode_decode_roundtrip(pts, res):
    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    cid = cell_encode(lon, lat, res)
    r, x, y = cell_decode(cid)
    assert (r == res).all()
    n = 1 << res
    assert (x >= 0).all() and (x < n).all() and (y >= 0).all() and (y < n).all()
    # parent containment: the parent cell's xy is the child's xy >> k
    if res > 1:
        p = cell_parent(cid, res - 1)
        _, px, py = cell_decode(p)
        assert (px == x >> 1).all() and (py == y >> 1).all()


@given(st.integers(1, 10), st.data())
@settings(max_examples=50, deadline=None)
def test_hilbert_bijection(order, data):
    n = 1 << order
    xs = np.array(data.draw(st.lists(st.integers(0, n - 1), min_size=1, max_size=30)))
    ys = np.array(data.draw(
        st.lists(st.integers(0, n - 1), min_size=len(xs), max_size=len(xs))
    ))
    d = hilbert_xy2d(order, xs, ys)
    assert (d >= 0).all() and (d < n * n).all()
    x2, y2 = hilbert_d2xy(order, d)
    assert (x2 == xs).all() and (y2 == ys).all()


@given(
    st.tuples(st.floats(-50, 0), st.floats(-50, 0), st.floats(1, 50), st.floats(1, 50)),
    st.tuples(st.floats(-50, 0), st.floats(-50, 0), st.floats(1, 50), st.floats(1, 50)),
)
@settings(max_examples=60, deadline=None)
def test_clip_area_equals_rect_intersection(ra, rb):
    ax0, ay0, aw, ah = ra
    bx0, by0, bw, bh = rb

    def rect(x0, y0, x1, y1):
        return np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float
        )

    out = clip_convex(rect(ax0, ay0, ax0 + aw, ay0 + ah), rect(bx0, by0, bx0 + bw, by0 + bh))
    expect = max(0.0, min(ax0 + aw, bx0 + bw) - max(ax0, bx0)) * max(
        0.0, min(ay0 + ah, by0 + bh) - max(ay0, by0)
    )
    assert abs(abs(ring_area(out)) - expect) < 1e-6 * max(1.0, expect)


@given(
    st.lists(st.floats(0.01, 6.27), min_size=3, max_size=8, unique=True),
    st.floats(1.0, 10.0),
    st.lists(st.tuples(st.floats(-12, 12), st.floats(-12, 12)), min_size=1, max_size=40),
)
@settings(max_examples=40, deadline=None)
def test_pip_matches_winding_sign_for_convex_hull(angles, radius, pts):
    """For a convex polygon (distinct angles on a circle — convex by
    construction), the crossing-rule PIP must agree with the half-plane
    test at non-boundary points."""
    th = np.sort(np.array(angles))
    hull = np.column_stack([radius * np.cos(th), radius * np.sin(th)])
    if abs(ring_area(hull)) < 1e-6:
        return
    ring = np.vstack([hull, hull[:1]])
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    got = points_in_polygon(xs, ys, [ring], include_boundary=True)
    # half-plane test (CCW orientation)
    if ring_area(hull) < 0:
        hull = hull[::-1]
    inside = np.ones(len(xs), dtype=bool)
    on_edge = np.zeros(len(xs), dtype=bool)
    m = len(hull)
    for i in range(m):
        a, b = hull[i], hull[(i + 1) % m]
        cross = (b[0] - a[0]) * (ys - a[1]) - (b[1] - a[1]) * (xs - a[0])
        inside &= cross >= 0
        on_edge |= np.abs(cross) < 1e-9
    check = ~on_edge & ~np.isclose(np.abs(xs[:, None] - hull[None, :, 0]), 0).any(1)
    assert (got[check] == inside[check]).all()


@given(
    st.lists(
        st.one_of(st.integers(0, 40), st.just(None)), min_size=1, max_size=40
    )
)
@settings(max_examples=60, deadline=None)
def test_edt_1d_matches_brute_force(fs):
    """1-D parabola-envelope EDT == brute-force min over sites."""
    from gdal_spark.operators.focal import _edt_1d_sq

    f = np.array([np.inf if v is None else float(v * v) for v in fs])
    got = _edt_1d_sq(f)
    n = f.shape[0]
    for q in range(n):
        brute = min(
            ((q - p) ** 2 + f[p] for p in range(n) if np.isfinite(f[p])),
            default=np.inf,
        )
        assert got[q] == brute


@given(st.floats(0.0, 1.0, exclude_max=True, allow_nan=False))
@settings(max_examples=80, deadline=None)
def test_cubic_weights_partition_of_unity(t):
    """Keys cubic weights sum to 1 (within fp) and reproduce the
    piecewise kernel formula at each tap distance."""
    from gdal_spark.operators.warp import _cubic_weights

    w = _cubic_weights(np.array([t]))
    assert abs(sum(x[0] for x in w) - 1.0) < 1e-12
    A = -0.5

    def K(d):
        d = abs(d)
        if d < 1:
            return (A + 2) * d**3 - (A + 3) * d**2 + 1
        if d < 2:
            return A * (d**3 - 5 * d**2 + 8 * d - 4)
        return 0.0

    for tapped, d in zip(w, (t + 1, t, 1 - t, 2 - t)):
        assert abs(tapped[0] - K(d)) < 1e-12


@given(st.integers(0, 2**31), st.integers(2, 4))
@settings(max_examples=40, deadline=None)
def test_ccl_8conn_matches_flood_fill(seed, nvals):
    """8-connected label_tile component count == reference flood fill
    on random small grids."""
    rng = np.random.RandomState(seed % 2**31)
    a = rng.randint(1, nvals + 1, size=(8, 8)).astype(np.float64)
    labels = label_tile(a, connect8=True)
    n_ours = labels.max() + 1
    # brute-force 8-conn flood fill
    seen = np.zeros_like(a, dtype=bool)
    n_ref = 0
    for sy in range(8):
        for sx in range(8):
            if seen[sy, sx]:
                continue
            n_ref += 1
            stack = [(sy, sx)]
            seen[sy, sx] = True
            while stack:
                y, x = stack.pop()
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        yy, xx = y + dy, x + dx
                        if (
                            0 <= yy < 8 and 0 <= xx < 8 and not seen[yy, xx]
                            and a[yy, xx] == a[y, x]
                        ):
                            seen[yy, xx] = True
                            stack.append((yy, xx))
    assert n_ours == n_ref
