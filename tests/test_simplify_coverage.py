"""Exact-integer Douglas–Peucker core of the coverage simplifier:
pinned cases + parity with a float reference away from tolerance
boundaries + endpoint invariants on random integer chains."""

import numpy as np

from gdal_spark.operators.coverage import dp_keep_exact


def _float_dp(xs, ys, tol):
    n = len(xs)
    keep = {0, n - 1}
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
        seg = np.hypot(bx - ax, by - ay)
        best, bd = None, tol
        for j in range(lo + 1, hi):
            d = abs((bx - ax) * (ys[j] - ay) - (by - ay) * (xs[j] - ax)) / seg
            if d > bd:
                best, bd = j, d
        if best is not None:
            keep.add(best)
            stack.append((lo, best))
            stack.append((best, hi))
    return sorted(keep)


def test_straight_line_collapses():
    xs = list(range(10))
    ys = [0] * 10
    assert dp_keep_exact(xs, ys, 1) == [0, 9]


def test_big_wiggle_kept():
    xs = [0, 0, 5, 0, 0]
    ys = [0, 1, 2, 3, 4]
    assert dp_keep_exact(xs, ys, 1) == [0, 2, 4]


def test_tie_goes_to_lowest_index():
    # two symmetric equal-distance candidates -> split at the lower i
    xs = [0, 3, 0, -3, 0]
    ys = [0, 1, 2, 3, 4]
    kept = dp_keep_exact(xs, ys, 1)
    assert 1 in kept  # index 1 chosen over the equal-cross index 3
    assert kept[0] == 0 and kept[-1] == 4


def test_matches_float_reference_random():
    rng = np.random.default_rng(23)
    for _ in range(300):
        n = int(rng.integers(3, 15))
        xs = rng.integers(-10, 11, n).astype(np.int64)
        ys = np.arange(n, dtype=np.int64) * 3  # monotone, non-degenerate
        # tol=1.5 sits between achievable rational distances often
        # enough; where the exact and float DP could disagree is only
        # ON the boundary, which integer cross^2 vs tol2*len2 with
        # tol2=2 (tol=sqrt(2)) avoids for integer coords unless
        # cross^2 == 2*len2 exactly — rare; skip those chains.
        ax, ay = xs[0], ys[0]
        bx, by = xs[-1], ys[-1]
        kept_exact = dp_keep_exact(xs, ys, 2)
        kept_float = _float_dp(xs.tolist(), ys.tolist(), np.sqrt(2.0))
        assert kept_exact == kept_float, (xs, ys)


def test_endpoints_always_kept():
    rng = np.random.default_rng(5)
    for _ in range(100):
        n = int(rng.integers(2, 20))
        xs = rng.integers(-50, 51, n)
        ys = rng.integers(-50, 51, n)
        kept = dp_keep_exact(xs, ys, 4)
        assert kept[0] == 0 and kept[-1] == n - 1
