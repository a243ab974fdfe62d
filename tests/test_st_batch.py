"""Bitwise parity of the round-3 batch-vectorized ST_* paths vs the
per-row kernels they replaced (functions/st.py, kernels/geomops.py::
min_distance_batch).  The batch path must be a pure speedup — any
reordering of the float expression tree would break the atol=0 oracle
contract."""

import numpy as np
import pandas as pd

from gdal_spark.functions import st
from gdal_spark.kernels import geomops as G
from gdal_spark.kernels import wkb as W


def _col(n=500):
    blobs = []
    for i in range(n):
        w, h = 3 + i % 7, 2 + i % 5
        t = np.array([(i % 20) * 25, (i // 20) * 25], dtype=np.float64)
        ring = np.array(
            [[0, 0], [w, 0], [w + 1, h / 2], [w, h], [0, h], [-1, h / 2],
             [0, 0]],
            dtype=np.float64,
        ) + t
        blobs.append(W.polygon_wkb([ring]))
    return pd.Series(blobs)


def test_min_distance_batch_bitwise():
    rng = np.random.default_rng(3)
    A = rng.integers(0, 20, (300, 6, 2)).astype(float)
    B = rng.integers(0, 20, (300, 5, 2)).astype(float)
    batch = G.min_distance_batch(A, B)
    ref = np.array([G.min_distance(A[i], B[i]) for i in range(300)])
    assert (batch == ref).all()


def test_st_centroid_batch_bitwise():
    col = _col()
    new = st.st_centroid.func(col)
    ref = []
    for blob in col:
        _t, parts = W.parse_wkb(bytes(blob))
        cx, cy = G.polygon_centroid(parts[0])
        ref.append([cx, cy])
    assert list(new) == ref


def test_st_astext_matches_generic():
    col = _col()
    new = st.st_astext.func(col)
    ref = [W.wkb_to_wkt(bytes(b)) for b in col]
    assert list(new) == ref


def test_st_distance_mixed_fallback():
    # mix fast-layout rows with a LINESTRING (generic-parser) row —
    # the bucketing must route each correctly
    col_a = list(_col(50))
    col_b = list(_col(50))[::-1]
    ls = W.linestring_wkb(np.array([[0.0, 0.0], [5.0, 5.0]]))
    col_a[7] = ls
    a, b = pd.Series(col_a), pd.Series(col_b)
    new = st.st_distance.func(a, b)
    ref = []
    for ga, gb in zip(a, b):
        ta, pa = W.parse_wkb(bytes(ga))
        tb, pb = W.parse_wkb(bytes(gb))
        ref.append(
            G.min_distance(
                np.vstack(W._collect_coords(ta, pa)),
                np.vstack(W._collect_coords(tb, pb)),
            )
        )
    assert list(new) == ref


def test_fmt_coords_byte_identical_to_fstring():
    """round-4: the one-C-call '%g' formatter must be byte-identical to
    the former per-pair f'{x:g} {y:g}' loop on every float shape."""
    rng = np.random.default_rng(9)
    cases = [
        rng.integers(-1000, 1000, (7, 2)).astype(float),
        rng.uniform(-1e6, 1e6, (11, 2)),
        rng.uniform(-1e-7, 1e-7, (5, 2)),
        np.array([[0.1, -0.25], [1e20, -1e-20], [123456.789, 3.0]]),
    ]
    for arr in cases:
        old = ",".join(f"{x:g} {y:g}" for x, y in arr)
        assert W._fmt_coords(arr) == old
    # batch formatter agrees with per-ring on a (G, N, 2) group
    batch = rng.uniform(-1e4, 1e4, (40, 6, 2))
    assert W.fmt_coords_batch(batch) == [W._fmt_coords(r) for r in batch]


def test_st_segmentize_group_bitwise():
    """round-4: whole-group densify must be BITWISE equal to the
    former per-row path (same expression tree, flat repeat/cumsum)."""
    col = _col(400)
    tol = pd.Series([1.5 + (i % 4) * 0.7 for i in range(400)])
    new = st.st_segmentize.func(col, tol)

    def densify_ref(coords, ml):
        a, b = coords[:-1], coords[1:]
        seg = np.hypot(b[:, 0] - a[:, 0], b[:, 1] - a[:, 1])
        n = np.maximum(np.ceil(seg / ml).astype(np.int64), 1)
        reps = np.repeat(np.arange(len(a)), n)
        cum = np.cumsum(n)
        pos = np.arange(int(cum[-1])) - (cum - n)[reps] + 1
        frac = pos / n[reps]
        pts = a[reps] + (b[reps] - a[reps]) * frac[:, None]
        return np.vstack([coords[:1], pts])

    for i, blob in enumerate(col):
        _t, parts = W.parse_wkb(bytes(blob))
        ref = W.polygon_wkb([densify_ref(parts[0], float(tol[i]))])
        assert bytes(new[i]) == ref, i


def test_st_buffer_convexity_is_combinatorial():
    """ADVICE round-3: non-integer CONVEX rings must stay on the convex
    Minkowski path (Polygon out, not MultiPolygon), even when the two
    shoelace sums differ by an ulp."""
    import struct as _s

    # irregular convex pentagon with non-representable coordinates
    ring = np.array(
        [[0.1, 0.1], [4.3, 0.7], [5.9, 3.1], [2.2, 5.3], [-0.7, 2.9],
         [0.1, 0.1]]
    ) * (1.0 / 3.0)
    blob = W.polygon_wkb([ring])
    out = st.st_buffer.func(
        pd.Series([blob]), pd.Series([0.5]), pd.Series(["square"])
    )
    gtype = _s.unpack_from("<I", bytes(out[0]), 1)[0]
    assert gtype == W.POLYGON  # convex fast path, not the noder
    # and a genuinely concave ring still routes to the noder
    lring = np.array(
        [[0, 0], [4, 0], [4, 1], [1, 1], [1, 3], [0, 3], [0, 0]], dtype=float
    )
    out2 = st.st_buffer.func(
        pd.Series([W.polygon_wkb([lring])]), pd.Series([0.5]),
        pd.Series(["square"]),
    )
    assert _s.unpack_from("<I", bytes(out2[0]), 1)[0] == W.MULTIPOLYGON
