"""Throughput contract for the exact rational arrangement noder
(round-3 verdict #6): per-pair cost of overlay_geoms_exact at 1k/10k
feature pairs, documenting the cost envelope of the DEGENERATE/
geometry-emission route.  The float GH path remains the
general-position route (tests/test_clip_degenerate.py pins routing).

Run: python scripts/noder_microbench.py [n_pairs ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gdal_spark.kernels.arrangement import overlay_geoms_exact


def _pair(k: int):
    """Deterministic concave pentagon + shifted quad, vertex-on-edge
    contact (the degenerate class the noder exists for)."""
    base = np.array(
        [[0, 0], [6, 0], [6, 4], [3, 2], [0, 4], [0, 0]], dtype=np.float64
    ) + np.array([k % 17, (k * 3) % 11], dtype=np.float64)
    quad = np.array(
        [[3, 0], [8, 1], [7, 5], [2, 4], [3, 0]], dtype=np.float64
    ) + np.array([k % 17, (k * 3) % 11], dtype=np.float64)
    return base, quad


def main(sizes):
    for n in sizes:
        t0 = time.perf_counter()
        total_polys = 0
        for k in range(n):
            P, Q = _pair(k)
            total_polys += len(overlay_geoms_exact(P, Q, "intersection"))
        dt = time.perf_counter() - t0
        print(
            f"n={n:6d}  wall={dt:7.2f}s  per-pair={dt / n * 1e3:7.3f} ms  "
            f"pairs/s={n / dt:8.1f}  (polys={total_polys})"
        )


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [1000, 10000])
