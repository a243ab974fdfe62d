"""The q227 mode closed form (max final count, min last-occurrence
scan position) equals the reference's sequential update rule
(vrtfilters.cpp:623-631: winner replaced only when a count strictly
exceeds the running max) on random windows."""

import numpy as np


def _c_loop_mode(vals):
    counts = {}
    maxc = 0
    res = None
    for v in vals:
        counts[v] = counts.get(v, 0) + 1
        if counts[v] > maxc:
            maxc = counts[v]
            res = v
    return res


def _closed_form_mode(vals):
    counts = {}
    last = {}
    for i, v in enumerate(vals):
        counts[v] = counts.get(v, 0) + 1
        last[v] = i
    maxc = max(counts.values())
    cands = [v for v in counts if counts[v] == maxc]
    return min(cands, key=lambda v: last[v])


def test_mode_closed_form_matches_scan_loop():
    rng = np.random.default_rng(19)
    for _ in range(5000):
        n = rng.integers(1, 12)
        vals = rng.integers(0, 5, n).tolist()
        assert _closed_form_mode(vals) == _c_loop_mode(vals), vals
