"""Independent NumPy re-implementation of the gdal raster blend byte
semantics (apps/gdalalg_raster_blend.cpp) checked bitwise against the
SQL expression generator in gdal_spark.functions.blend, evaluated by
DuckDB.  Two independent transcriptions of the C code agreeing on
random bytes pins the semantics; the q220 oracle audit then pins the
Spark dialect against the same DuckDB tree.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from gdal_spark.functions import blend as BL


def _mul255(a, b):
    return (a * b + 255) // 256


def _div255(a, b):
    # a==0 -> 0; b==0 -> 255; else (a*255)//b   (all args non-negative)
    safe = np.maximum(b, 1)
    return np.where(a == 0, 0, np.where(b == 0, 255, (a * 255) // safe))


def _band8(x):
    return x & 255


def _ref_blend(mode, br, bg, bb, ba, orr, og, ob, oa, opacity, swapped):
    """Literal transcription of the C per-pixel loops (int64 NumPy)."""
    if not swapped:
        ov = _mul255(oa, opacity)
        a = ba
    else:
        ov = oa
        a = _mul255(ba, opacity)
    fa = _band8(ov + a - _mul255(ov, a))

    outs = {}
    for key, c0, oc0 in (("r", br, orr), ("g", bg, og), ("b", bb, ob)):
        c = _mul255(c0, a)
        oc = _mul255(oc0, ov)
        t = _mul255(c, 255 - ov) + _mul255(oc, 255 - a)
        amul = _mul255(ov, a)
        if mode == "multiply":
            num = _mul255(c, oc) + t
        elif mode == "screen":
            num = c + oc - _mul255(c, oc)
        elif mode in ("overlay", "hard-light"):
            if mode == "overlay":
                bc, bal, sc, sal = c, a, oc, ov
            else:
                bc, bal, sc, sal = oc, ov, c, a
            less = 2 * _mul255(bc, sc) + t
            geq = amul - 2 * _mul255(bal - bc, sal - sc) + t
            num = np.where(2 * bc < bal, less, geq)
        elif mode == "darken":
            num = np.minimum(_mul255(oc, a), _mul255(c, ov)) + t
        elif mode == "lighten":
            num = np.maximum(_mul255(oc, a), _mul255(c, ov)) + t
        elif mode == "color-dodge":
            cond = _mul255(oc, a) + _mul255(c, ov) >= amul
            geq = amul + t
            unp_ov = _band8(_div255(oc, ov))
            lt = _div255(_band8(_mul255(c, ov)), 255 - unp_ov) + t
            num = np.where(cond, geq, lt)
        elif mode == "color-burn":
            cond = _mul255(oc, a) + _mul255(c, ov) <= amul
            le = t
            unp_c = _band8(_div255(c, a))
            unp_ov = _band8(_div255(oc, ov))
            gt = _mul255(amul, _band8(unp_c + unp_ov - 255)) + t
            num = np.where(cond, le, gt)
        else:
            raise AssertionError(mode)
        outs[key] = _band8(_div255(_band8(num), fa))
    outs["a"] = fa
    return outs


def _random_bytes(n, rng):
    df = pd.DataFrame(
        {
            k: rng.integers(0, 256, n, dtype=np.int64)
            for k in ("br", "bg", "bb", "ba", "orr", "og", "ob", "oa")
        }
    )
    # force the edge alphas the branches key on
    df.loc[0, ["ba", "oa"]] = 0
    df.loc[1, ["ba", "oa"]] = 255
    df.loc[2, "ba"] = 0
    df.loc[3, "oa"] = 0
    df.loc[4, ["orr", "og", "ob"]] = 255  # drives unprem overlay to 255
    df.loc[5, ["br", "bg", "bb"]] = 255
    return df


@pytest.mark.parametrize("mode", BL.MODES)
@pytest.mark.parametrize("opacity,swapped", [(153, False), (255, False),
                                             (0, False), (153, True)])
def test_duck_tree_matches_numpy_reference(mode, opacity, swapped):
    rng = np.random.default_rng(42)
    df = _random_bytes(4096, rng)
    con = duckdb.connect()
    con.register("px", df)
    e = BL.blend_exprs(
        "duck", mode, ("br", "bg", "bb", "ba"),
        ("orr", "og", "ob", "oa"), opacity, swapped,
    )
    got = con.execute(
        f"SELECT CAST({e['r']} AS BIGINT) AS r, "
        f"CAST({e['g']} AS BIGINT) AS g, "
        f"CAST({e['b']} AS BIGINT) AS b, "
        f"CAST({e['a']} AS BIGINT) AS a FROM px"
    ).df()
    ref = _ref_blend(
        mode, *(df[k].to_numpy() for k in
                ("br", "bg", "bb", "ba", "orr", "og", "ob", "oa")),
        opacity, swapped,
    )
    for k in ("r", "g", "b", "a"):
        np.testing.assert_array_equal(
            got[k].to_numpy(), ref[k], err_msg=f"{mode} band {k}"
        )


@pytest.mark.parametrize("mode", BL.MODES)
def test_outputs_are_bytes(mode):
    rng = np.random.default_rng(7)
    df = _random_bytes(2048, rng)
    ref = _ref_blend(
        mode, *(df[k].to_numpy() for k in
                ("br", "bg", "bb", "ba", "orr", "og", "ob", "oa")),
        153, False,
    )
    for k in ("r", "g", "b", "a"):
        assert ref[k].min() >= 0 and ref[k].max() <= 255


def test_opaque_multiply_is_plain_product():
    """With both alphas 255 and opacity 255 the multiply mode reduces
    to MulScale255(C, OverlayC) — the textbook multiply blend."""
    rng = np.random.default_rng(3)
    c = rng.integers(0, 256, 1000, dtype=np.int64)
    oc = rng.integers(0, 256, 1000, dtype=np.int64)
    full = np.full_like(c, 255)
    out = _ref_blend("multiply", c, c, c, full, oc, oc, oc, full, 255, False)
    np.testing.assert_array_equal(out["r"], _mul255(c, oc))
    np.testing.assert_array_equal(out["a"], full)
