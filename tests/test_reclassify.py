"""Parser + apply semantics for the reclassify interval-spec language
(vrtreclassifier.cpp), incl. nextafter open bounds, NO_DATA/DEFAULT/
PASS_THROUGH/NAN handling, overlap rejection, and DuckDB-tree parity."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators.reclassify import (
    Mapping,
    interval_case_sql,
    parse_mapping,
    reclassify_np,
)


def test_open_bounds_are_nextafter():
    m = parse_mapping("(0,10)=1")
    lo, hi, dst = m.intervals[0]
    assert lo == math.nextafter(0.0, math.inf)
    assert hi == math.nextafter(10.0, -math.inf)
    assert dst == 1.0
    out = reclassify_np([0.0, 10.0, 5.0], parse_mapping("(0,10)=1;DEFAULT=9"))
    assert list(out) == [9.0, 9.0, 1.0]


def test_mixed_and_inf_bounds():
    m = parse_mapping("[-inf,0)=1;[0,inf]=2")
    assert m.intervals[0][0] == -math.inf
    assert m.intervals[1][1] == math.inf
    out = reclassify_np([-1e308, -0.5, 0.0, 1e308], m)
    assert list(out) == [1.0, 1.0, 2.0, 2.0]


def test_constant_and_nodata_source():
    m = parse_mapping("NO_DATA=255;5=7;DEFAULT=0", nodata=-1.0)
    out = reclassify_np([-1.0, 5.0, 6.0], m)
    assert list(out) == [255.0, 7.0, 0.0]


def test_nodata_target_and_pass_through():
    m = parse_mapping("[0,5]=NO_DATA;(5,9]=PASS_THROUGH;DEFAULT=1",
                      nodata=-1.0)
    out = reclassify_np([2.0, 7.0, 100.0], m)
    assert list(out) == [-1.0, 7.0, 1.0]


def test_nan_mappings():
    m = parse_mapping("NAN=0;DEFAULT=5")
    assert reclassify_np([math.nan], m)[0] == 0.0
    m2 = parse_mapping("NAN=PASS_THROUGH;DEFAULT=5")
    assert math.isnan(reclassify_np([math.nan], m2)[0])
    # NaN with no NAN rule falls to DEFAULT (Reclassify():397 falls
    # through to the default handling)
    m3 = parse_mapping("[0,1]=2;DEFAULT=5")
    assert reclassify_np([math.nan], m3)[0] == 5.0


def test_default_pass_through():
    m = parse_mapping("[0,1]=9;DEFAULT=PASS_THROUGH")
    assert list(reclassify_np([0.5, 44.0], m)) == [9.0, 44.0]


def test_errors():
    with pytest.raises(ValueError, match="overlap"):
        parse_mapping("[0,10]=1;[5,20]=2")
    with pytest.raises(ValueError, match="NO_DATA"):
        parse_mapping("NO_DATA=1")  # nodata unset
    with pytest.raises(ValueError, match="NO_DATA"):
        parse_mapping("[0,1]=NO_DATA")
    with pytest.raises(ValueError):
        parse_mapping("[10,0]=1")  # lo > hi
    with pytest.raises(ValueError, match="="):
        parse_mapping("[0,1]")
    with pytest.raises(ValueError, match="no mapping"):
        reclassify_np([99.0], parse_mapping("[0,1]=1"))
    # overlap check runs on the nextafter-adjusted bounds: (0,1) and
    # (1,2) do NOT overlap even though they share the literal 1
    parse_mapping("(0,1)=1;(1,2)=2")
    with pytest.raises(ValueError, match="overlap"):
        parse_mapping("[0,1]=1;[1,2]=2")


def test_duck_tree_matches_numpy():
    spec = ("NO_DATA=255;(-200,-100]=0;(-100,0)=1;[0,10)=2;[10,20]=3;"
            "(20,40]=PASS_THROUGH;DEFAULT=99")
    m = parse_mapping(spec, nodata=-999.0)
    rng = np.random.default_rng(11)
    v = np.concatenate([
        rng.uniform(-250, 120, 5000),
        np.array([-999.0, -200.0, -100.0, 0.0, 10.0, 20.0, 40.0,
                  math.nextafter(-100.0, math.inf)]),
        rng.integers(-250, 120, 2000).astype(np.float64),
    ])
    ref = reclassify_np(v, m)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": v}))
    got = con.execute(
        f"SELECT {interval_case_sql(m, 'v')} AS out FROM t"
    ).df()["out"].to_numpy()
    np.testing.assert_array_equal(got, ref)
