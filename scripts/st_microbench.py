"""Microbench: batch-vectorized ST_* pandas-UDF bodies vs the former
per-row parse loops, on a 100k single-ring-polygon column.

Run: python scripts/st_microbench.py [n]
Prints one line per function: old_s new_s speedup, plus a bitwise
parity check of the outputs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from gdal_spark.functions import st
from gdal_spark.kernels import geomops as G
from gdal_spark.kernels import wkb as W


def make_column(n: int) -> pd.Series:
    blobs = []
    for i in range(n):
        w, h = 3 + i % 7, 2 + i % 5
        tx, ty = (i % 100) * 20, (i // 100) * 20
        # non-degenerate hexagon (positive area, varied size)
        ring = np.array(
            [[0, 0], [w, 0], [w + 1, h / 2], [w, h], [0, h], [-1, h / 2],
             [0, 0]],
            dtype=np.float64,
        ) + np.array([tx, ty], dtype=np.float64)
        blobs.append(W.polygon_wkb([ring]))
    return pd.Series(blobs)


# --- former per-row implementations (round-2 bodies) -----------------


def old_astext(wkb):
    return pd.Series([W.wkb_to_wkt(bytes(b)) for b in wkb])


def old_centroid(wkb):
    out = []
    for blob in wkb:
        gtype, parts = W.parse_wkb(bytes(blob))
        cx, cy = G.polygon_centroid(parts[0])
        out.append([cx, cy])
    return pd.Series(out)


def old_convexhull(wkb):
    out = []
    for blob in wkb:
        gtype, parts = W.parse_wkb(bytes(blob))
        coords = np.vstack(W._collect_coords(gtype, parts))
        out.append(W.polygon_wkb([G.convex_hull(coords)]))
    return pd.Series(out)


def old_simplify(wkb, tol):
    out = []
    for blob, t in zip(wkb, tol):
        gtype, parts = W.parse_wkb(bytes(blob))
        out.append(W.polygon_wkb([G.simplify_dp(r, float(t)) for r in parts]))
    return pd.Series(out)


def old_segmentize(wkb, max_len):
    out = []
    for blob, ml in zip(wkb, max_len):
        gtype, parts = W.parse_wkb(bytes(blob))
        ml = float(ml)

        def densify(coords):
            pts = [coords[0]]
            for a, b in zip(coords[:-1], coords[1:]):
                seg = float(np.hypot(b[0] - a[0], b[1] - a[1]))
                n = max(int(np.ceil(seg / ml)), 1)
                for i in range(1, n + 1):
                    pts.append(a + (b - a) * (i / n))
            return np.asarray(pts)

        out.append(W.polygon_wkb([densify(r) for r in parts]))
    return pd.Series(out)


def old_distance(a_wkb, b_wkb):
    out = np.zeros(len(a_wkb))
    for i, (ga, gb) in enumerate(zip(a_wkb, b_wkb)):
        ta, pa = W.parse_wkb(bytes(ga))
        tb, pb = W.parse_wkb(bytes(gb))
        ca = np.vstack(W._collect_coords(ta, pa))
        cb = np.vstack(W._collect_coords(tb, pb))
        out[i] = G.min_distance(ca, cb)
    return pd.Series(out)


def bench(name, old_fn, new_fn, *args, reps=2):
    t0 = time.perf_counter()
    for _ in range(reps):
        ref = old_fn(*args)
    t_old = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        new = new_fn(*args)
    t_new = (time.perf_counter() - t0) / reps
    same = list(ref) == list(new)
    print(
        f"{name:14s} old {t_old:7.3f}s  new {t_new:7.3f}s  "
        f"speedup {t_old / t_new:5.1f}x  parity={'BITWISE' if same else 'DIFF'}"
    )
    assert same, name


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    col = make_column(n)
    col_b = make_column(n)[::-1].reset_index(drop=True)
    tol = pd.Series(np.full(n, 1.0))
    ml = pd.Series(np.full(n, 2.0))
    print(f"n = {n}")
    bench("st_astext", old_astext, st.st_astext.func, col)
    bench("st_centroid", old_centroid, st.st_centroid.func, col)
    bench("st_convexhull", old_convexhull, st.st_convexhull.func, col)
    bench("st_simplify", old_simplify, st.st_simplify.func, col, tol)
    bench("st_segmentize", old_segmentize, st.st_segmentize.func, col, ml)
    bench("st_distance", old_distance, st.st_distance.func, col, col_b)


if __name__ == "__main__":
    main()
