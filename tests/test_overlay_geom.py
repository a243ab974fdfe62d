"""Geometry emission from the exact arrangement noder
(kernels/arrangement.py::overlay_geoms_exact / valid_geoms_exact) —
the WKB-ring completion of the area-only overlay surface.

Reference semantics: OGRLayer::Intersection/Union/Difference/
SymDifference emit clipped geometries
(ogr/ogrsf_frmts/generic/ogrlayer.cpp:5385-7846);
OGRGeometry::MakeValid (ogr/ogrgeometry.cpp:4183) emits the even-odd
lobes.  Invariants tested: signed ring areas re-sum to the EXACT area
path, exteriors CCW / holes CW, rings closed + minimal (no collinear
vertices), canonical start + ordering, hole parenting, pinch
decomposition.
"""

import numpy as np
import pytest

from gdal_spark.kernels.arrangement import (
    overlay_area_exact,
    overlay_geoms_exact,
    valid_area_exact,
    valid_geoms_exact,
)


def _signed(r: np.ndarray) -> float:
    return 0.5 * float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))


def _mp_area(polys) -> float:
    return sum(_signed(r) for rings in polys for r in rings)


def _check_invariants(polys):
    for rings in polys:
        for j, r in enumerate(rings):
            assert np.array_equal(r[0], r[-1]), "ring not closed"
            sa = _signed(r)
            if j == 0:
                assert sa > 0, "exterior not CCW"
            else:
                assert sa < 0, "hole not CW"
            # minimal: no exactly-collinear triple survives
            o = r[:-1]
            n = len(o)
            for i in range(n):
                p, v, q = o[i - 1], o[i], o[(i + 1) % n]
                cross = (v[0] - p[0]) * (q[1] - p[1]) - (v[1] - p[1]) * (
                    q[0] - p[0]
                )
                assert cross != 0.0, "collinear vertex survived"
            # canonical start: lexicographic-min vertex
            assert tuple(o[0]) == min(map(tuple, o)), "not min-start"


def test_shared_edge_union_merges():
    A = np.array([[0, 0], [4, 0], [4, 3], [0, 3], [0, 0]], float)
    B = np.array([[4, 0], [6, 0], [6, 3], [4, 3], [4, 0]], float)
    polys = overlay_geoms_exact(A, B, "union")
    assert len(polys) == 1 and len(polys[0]) == 1
    assert polys[0][0].shape[0] == 5  # shared-edge endpoints eliminated
    assert _mp_area(polys) == 18.0
    _check_invariants(polys)


def test_island_difference_emits_hole():
    A = np.array([[0, 0], [4, 0], [4, 3], [0, 3], [0, 0]], float)
    isl = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float)
    polys = overlay_geoms_exact(A, isl, "difference")
    assert len(polys) == 1 and len(polys[0]) == 2
    assert _signed(polys[0][1]) == -1.0
    assert _mp_area(polys) == 11.0
    _check_invariants(polys)


def test_symdiff_pinch_decomposes():
    A = np.array([[0, 0], [4, 0], [4, 3], [0, 3], [0, 0]], float)
    C = np.array([[2, -1], [5, -1], [5, 4], [2, 4], [2, -1]], float)
    polys = overlay_geoms_exact(A, C, "symdifference")
    assert len(polys) == 2  # A-only piece + C-frame piece, pinched apart
    assert abs(_mp_area(polys) - overlay_area_exact(A, C, "symdifference")) == 0
    _check_invariants(polys)


def test_makevalid_interleaved_zigzag():
    # the bottom edge is crossed TWICE — out of the pinch-lobe
    # kernel's contract, in the noder's
    ring = np.array([[0, 0], [3, 3], [6, 0], [6, 1], [0, 1], [0, 0]], float)
    polys = valid_geoms_exact(ring)
    assert len(polys) == 3
    areas = sorted(_signed(p[0]) for p in polys)
    assert areas == [0.5, 0.5, 4.0]
    assert _mp_area(polys) == valid_area_exact(ring)
    _check_invariants(polys)


def test_doubly_wound_is_empty():
    dw = np.array(
        [[0, 0], [4, 0], [4, 3], [0, 3], [0, 0], [4, 0], [4, 3], [0, 3],
         [0, 0]],
        float,
    )
    assert valid_geoms_exact(dw) == []


@pytest.mark.parametrize("op", ["intersection", "union", "difference",
                                "symdifference"])
def test_fuzz_geoms_vs_exact_area(op):
    rng = np.random.default_rng(11)

    def rand_ring(n, scale=8):
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.integers(2, scale, n)
        pts = np.stack(
            [np.round(rad * np.cos(ang)), np.round(rad * np.sin(ang))], axis=1
        )
        keep = [pts[0]]
        for p in pts[1:]:
            if not np.array_equal(p, keep[-1]):
                keep.append(p)
        r = np.array(keep, float)
        return np.vstack([r, r[:1]])

    for _ in range(25):
        P = rand_ring(int(rng.integers(4, 9)))
        Q = rand_ring(int(rng.integers(4, 9))) + rng.integers(-3, 4, 2)
        polys = overlay_geoms_exact(P, Q, op)
        assert abs(_mp_area(polys) - overlay_area_exact(P, Q, op)) < 1e-9
        _check_invariants(polys)


def test_fuzz_valid_geoms_vs_exact_area():
    rng = np.random.default_rng(13)
    for _ in range(25):
        n = int(rng.integers(5, 10))
        pts = rng.integers(0, 9, (n, 2)).astype(float)
        ring = np.vstack([pts, pts[:1]])
        polys = valid_geoms_exact(ring)
        assert abs(_mp_area(polys) - valid_area_exact(ring)) < 1e-9
        _check_invariants(polys)


def test_multiring_hole_inputs():
    """Even-odd multi-ring inputs (polygon with hole) work as parity:
    Q covering the hole fills it in the union (no interior ring
    survives), and all four op areas match inclusion-exclusion."""
    Pext = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    Phole = np.array([[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]], float)
    Q = np.array([[2, 2], [8, 2], [8, 8], [2, 8], [2, 2]], float)
    P = [Pext, Phole]
    assert _mp_area(overlay_geoms_exact(P, Q, "intersection")) == 20.0
    u = overlay_geoms_exact(P, Q, "union")
    assert _mp_area(u) == 100.0
    assert len(u) == 1 and len(u[0]) == 1  # hole filled, single ring
    assert _mp_area(overlay_geoms_exact(P, Q, "difference")) == 64.0
    assert _mp_area(overlay_geoms_exact(P, Q, "symdifference")) == 80.0


def test_overlay_features_union_symdiff_b_side(spark):
    """overlay_features union/symdifference emit the reference's
    method-side rows too: B-remainders (B − union of intersecting A)
    and untouched-B pass-through (ogrlayer.cpp Union :6188)."""
    from gdal_spark.kernels import wkb as WK
    from gdal_spark.operators.overlay import overlay_features
    from gdal_spark.session import local_df

    def rect(x0, y0, x1, y1):
        ring = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=float
        )
        return WK.polygon_wkb([ring])

    # A0 overlaps B0 (half), A1 disjoint from everything, B1 untouched
    layer = local_df(
        spark,
        [(0, rect(0, 0, 4, 4)), (1, rect(100, 100, 102, 102))],
        "a_id long, geom binary",
    )
    bpolys = [(0, rect(2, 0, 6, 4)), (1, rect(50, 50, 53, 53))]
    rows = overlay_features(layer, bpolys, "union").collect()
    got = {(r["a_id"], r["b_id"]): round(r["piece_area"], 9) for r in rows}
    assert got == {
        (0, 0): 8.0,       # A0 ∩ B0
        (0, None): 8.0,    # A0 − B0
        (1, None): 4.0,    # A1 whole (no candidates)
        (None, 0): 8.0,    # B0 − A0
        (None, 1): 9.0,    # B1 untouched pass-through
    }
    rows = overlay_features(layer, bpolys, "symdifference").collect()
    got = {(r["a_id"], r["b_id"]): round(r["piece_area"], 9) for r in rows}
    assert got == {
        (0, None): 8.0,
        (1, None): 4.0,
        (None, 0): 8.0,
        (None, 1): 9.0,
    }
