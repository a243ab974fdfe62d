"""Property tests for the round-3 kernels — checked against
independent references (interval arithmetic, Monte-Carlo membership,
brute-force per-row kernels), not against themselves."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark.kernels.arrangement import (
    overlay_area_exact,
    overlay_geoms_exact,
    valid_geoms_exact,
)
from gdal_spark.kernels.geodesy import (
    WGS84_A,
    vincenty_inverse,
)
from gdal_spark.kernels.geomops import min_distance, min_distance_batch


def _rect(x0, y0, w, h):
    return np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
        dtype=np.float64,
    )


@settings(max_examples=40, deadline=None)
@given(
    ax=st.integers(0, 8), ay=st.integers(0, 8),
    aw=st.integers(1, 8), ah=st.integers(1, 8),
    bx=st.integers(0, 8), by=st.integers(0, 8),
    bw=st.integers(1, 8), bh=st.integers(1, 8),
    op=st.sampled_from(["intersection", "union", "difference",
                        "symdifference"]),
)
def test_overlay_geoms_membership_monte_carlo(ax, ay, aw, ah, bx, by, bw, bh, op):
    """Emitted geometry must CONTAIN exactly the right points: sample
    a grid of half-integer probes, decide membership by interval
    arithmetic on the input rects (independent of the noder), and
    check even-odd containment in the emitted rings agrees."""
    A, B = _rect(ax, ay, aw, ah), _rect(bx, by, bw, bh)
    polys = overlay_geoms_exact(A, B, op)

    def in_rect(px, py, x0, y0, w, h):
        return x0 < px < x0 + w and y0 < py < y0 + h

    def expected(px, py):
        a = in_rect(px, py, ax, ay, aw, ah)
        b = in_rect(px, py, bx, by, bw, bh)
        return {
            "intersection": a and b,
            "union": a or b,
            "difference": a and not b,
            "symdifference": a != b,
        }[op]

    def emitted(px, py):
        inside = False
        for rings in polys:
            for r in rings:
                cnt = 0
                for i in range(r.shape[0] - 1):
                    x1, y1 = r[i]
                    x2, y2 = r[i + 1]
                    if (y1 > py) != (y2 > py):
                        xc = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                        if xc > px:
                            cnt ^= 1
                inside ^= bool(cnt)
        return inside

    for px in np.arange(min(ax, bx) - 0.5, max(ax + aw, bx + bw) + 1, 1.0):
        for py in np.arange(min(ay, by) - 0.5, max(ay + ah, by + bh) + 1, 1.0):
            assert emitted(px + 0.0, py + 0.0) == expected(px, py), (
                px, py, op,
            )


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_valid_geoms_area_vs_monte_carlo(data):
    """Even-odd lobes of a random self-crossing ring: emitted area vs
    a Monte-Carlo even-odd ray-cast on the RAW ring."""
    n = data.draw(st.integers(5, 8))
    pts = np.array(
        [[data.draw(st.integers(0, 8)), data.draw(st.integers(0, 8))]
         for _ in range(n)],
        dtype=np.float64,
    )
    ring = np.vstack([pts, pts[:1]])
    polys = valid_geoms_exact(ring)
    area = sum(
        0.5 * float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))
        for rings in polys for r in rings
    )
    rng = np.random.default_rng(1)
    samples = rng.uniform(-0.5, 8.5, (20000, 2))
    px, py = samples[:, 0], samples[:, 1]
    cnt = np.zeros(len(samples), dtype=np.int64)
    for i in range(ring.shape[0] - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        m = (y1 > py) != (y2 > py)
        if y2 != y1:
            xc = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            cnt += (m & (xc > px)).astype(np.int64)
    mc = float(np.mean(cnt % 2 == 1)) * 81.0
    assert abs(area - mc) < 2.5  # MC noise bound at 20k samples


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_min_distance_batch_equals_per_row(data):
    na = data.draw(st.integers(1, 6))
    nb = data.draw(st.integers(1, 6))
    g = data.draw(st.integers(1, 5))
    A = np.array(
        [[[data.draw(st.integers(0, 15)), data.draw(st.integers(0, 15))]
          for _ in range(na)] for _ in range(g)],
        dtype=np.float64,
    )
    B = np.array(
        [[[data.draw(st.integers(0, 15)), data.draw(st.integers(0, 15))]
          for _ in range(nb)] for _ in range(g)],
        dtype=np.float64,
    )
    batch = min_distance_batch(A, B)
    for i in range(g):
        assert batch[i] == min_distance(A[i], B[i])


@settings(max_examples=40, deadline=None)
@given(
    lat=st.integers(-80, 80), lon=st.integers(-170, 170),
    dlat=st.integers(1, 9), dlon=st.integers(1, 9),
)
def test_vincenty_bounds_and_symmetry(lat, lon, dlat, dlon):
    """Geodesic distance is symmetric and bounded by the chord and the
    great-ellipse bounds: between a·θ_min-ish and b... use loose
    sphere bounds with the polar/equatorial radii."""
    d12 = float(vincenty_inverse(lat, lon, lat + dlat, lon + dlon))
    d21 = float(vincenty_inverse(lat + dlat, lon + dlon, lat, lon))
    assert abs(d12 - d21) < 1e-7
    # Vincenty's own structure: s = A·b·(σ − Δσ) with σ the central
    # angle on the AUXILIARY sphere (REDUCED latitudes) and
    # 1 ≤ A ≤ a/b, so b·σ ≲ s ≲ a·σ are the honest loose bounds
    f = 1 / 298.257223563
    b = WGS84_A * (1 - f)
    b1, b2 = np.arctan((1 - f) * np.tan(np.radians([lat, lat + dlat])))
    dl = np.radians(dlon)
    sigma = np.arccos(
        np.clip(
            np.sin(b1) * np.sin(b2) + np.cos(b1) * np.cos(b2) * np.cos(dl),
            -1, 1,
        )
    )
    assert b * sigma * 0.999 <= d12 <= WGS84_A * sigma * 1.001
