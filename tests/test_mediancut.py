"""Median-cut quantization (operators/mediancut.py) vs an independent
pure-NumPy reference of the same round-synchronous spec.

The q192 oracle mechanically replays the engine's construction in SQL, so
this test is the independent check that the SPEC itself is implemented
correctly (not just identically twice): a from-scratch NumPy median cut
with the same rules (longest axis with r>g>b ties, lower median 2*cum>=n,
floor-mean palette, nearest assignment with lowest-index ties).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.mediancut import median_cut_quantize


def _ref_median_cut(r, g, b, rounds):
    box = np.zeros(len(r), dtype=np.int64)
    chans = [r, g, b]
    for _ in range(rounds):
        new = np.empty_like(box)
        for bx in np.unique(box):
            m = box == bx
            rngs = [c[m].max() - c[m].min() for c in chans]
            if rngs[0] >= rngs[1] and rngs[0] >= rngs[2]:
                axis = 0
            elif rngs[1] >= rngs[2]:
                axis = 1
            else:
                axis = 2
            v = chans[axis][m]
            uniq, cnt = np.unique(v, return_counts=True)
            cum = np.cumsum(cnt)
            med = uniq[np.argmax(2 * cum >= len(v))]
            new[m] = box[m] * 2 + (v > med)
        box = new
    return box


def _ref_palette_and_counts(r, g, b, box):
    boxes = np.unique(box)
    pal = {}
    for bx in boxes:
        m = box == bx
        n = int(m.sum())
        pal[int(bx)] = (
            int(r[m].sum()) // n,
            int(g[m].sum()) // n,
            int(b[m].sum()) // n,
            n,
        )
    keys = sorted(pal)
    pr = np.array([pal[k][0] for k in keys])
    pg = np.array([pal[k][1] for k in keys])
    pb = np.array([pal[k][2] for k in keys])
    d = (
        (r[:, None] - pr[None, :]) ** 2
        + (g[:, None] - pg[None, :]) ** 2
        + (b[:, None] - pb[None, :]) ** 2
    )
    nearest = np.argmin(d, axis=1)  # argmin takes the FIRST (lowest-index) tie
    counts = {k: 0 for k in keys}
    for idx in nearest:
        counts[keys[idx]] += 1
    return pal, counts


@pytest.mark.parametrize("seed", [None, 1234])
def test_median_cut_matches_numpy_reference(spark, seed):
    n = 4096
    if seed is None:
        i = F.col("id")
        px = spark.range(n).select(
            i.cast("long").alias("pid"),
            ((i % 5) * 47 + (i * 7) % 19).cast("long").alias("r"),
            ((i % 5) * 41 + (i * 13) % 17).cast("long").alias("g"),
            ((i % 5) * 37 + (i * 29) % 23).cast("long").alias("b"),
        )
    else:
        # pinned random-pixel case: exercises median/axis ties the
        # clustered fixture cannot (deterministic corpus, CLAUDE.md rule)
        rng = np.random.default_rng(seed)
        vals = rng.integers(0, 256, size=(n, 3))
        rows = [(int(k), int(vals[k, 0]), int(vals[k, 1]), int(vals[k, 2]))
                for k in range(n)]
        px = spark.createDataFrame(rows, "pid long, r long, g long, b long")
    got = {
        row["box"]: (row["pal_r"], row["pal_g"], row["pal_b"],
                     row["n_box"], row["n_assigned"])
        for row in median_cut_quantize(px, rounds=3).collect()
    }

    ids = np.arange(n, dtype=np.int64)
    if seed is None:
        r = (ids % 5) * 47 + (ids * 7) % 19
        g = (ids % 5) * 41 + (ids * 13) % 17
        b = (ids % 5) * 37 + (ids * 29) % 23
    else:
        rng = np.random.default_rng(seed)
        vals = rng.integers(0, 256, size=(n, 3)).astype(np.int64)
        r, g, b = vals[:, 0], vals[:, 1], vals[:, 2]
    box = _ref_median_cut(r, g, b, rounds=3)
    pal, counts = _ref_palette_and_counts(r, g, b, box)

    assert set(got) == set(pal)
    for k in pal:
        assert got[k] == (*pal[k], counts[k]), k
    assert sum(v[3] for v in got.values()) == n
    assert sum(v[4] for v in got.values()) == n


def test_median_cut_degenerate_single_color(spark):
    # all pixels identical: every split has range 0, median = the value,
    # all bits 0 -> box stays 0 relabeled; one palette entry holds everything
    px = spark.range(64).select(
        F.col("id").cast("long").alias("pid"),
        F.lit(7).cast("long").alias("r"),
        F.lit(9).cast("long").alias("g"),
        F.lit(11).cast("long").alias("b"),
    )
    rows = median_cut_quantize(px, rounds=3).collect()
    assert len(rows) == 1
    row = rows[0]
    assert (row["pal_r"], row["pal_g"], row["pal_b"]) == (7, 9, 11)
    assert row["n_box"] == 64 and row["n_assigned"] == 64
