"""NTv2 grid-shift kernel: binary round-trip, conventions, selection.

Synthetic grids with dyadic-exact values make every check tolerance
zero; q798 is the oracle-side twin over the documents dim."""

import numpy as np
import pytest

from gdal_spark.kernels.gridshift import (
    SubGrid,
    parse_ntv2,
    shift_points,
    write_ntv2,
)


def _grid(name="GRID0", s_lat=0.0, n_lat=36000.0, e_long=-36000.0,
          w_long=0.0, inc=3600.0, scale=1):
    nrows = int(round((n_lat - s_lat) / inc)) + 1
    ncols = int(round((w_long - e_long) / inc)) + 1
    iy, ix = np.mgrid[0:nrows, 0:ncols]
    return SubGrid(
        name, s_lat, n_lat, e_long, w_long, inc, inc,
        ((iy * 7 + ix * 3) % 16 * scale).astype(np.float32),
        ((iy * 5 + ix * 11) % 16 * scale).astype(np.float32),
    )


def test_roundtrip():
    g = _grid()
    out = parse_ntv2(write_ntv2([g]))
    assert len(out) == 1
    p = out[0]
    assert (p.s_lat, p.n_lat, p.e_long, p.w_long) == (
        g.s_lat, g.n_lat, g.e_long, g.w_long)
    assert np.array_equal(p.lat_shift, g.lat_shift)
    assert np.array_equal(p.lon_shift, g.lon_shift)


def test_garbage_rejected():
    with pytest.raises(ValueError):
        parse_ntv2(b"\x00" * 200)


def test_bilinear_exact_at_grid_nodes_and_quarters():
    grids = parse_ntv2(write_ntv2([_grid()]))
    # grid node (iy=2, ix=3): lonw = e_long + 3*inc = -36000+10800
    # => lon_east = 7.0 deg; lat 2.0 deg
    dlat, dlon = shift_points(grids, np.array([7.0]), np.array([2.0]))
    assert dlat[0] == (2 * 7 + 3 * 3) % 16
    assert dlon[0] == -((2 * 5 + 3 * 11) % 16)  # west-pos negated
    # quarter-cell point: exact dyadic bilinear
    dlat, _ = shift_points(grids, np.array([7.0]), np.array([2.25]))
    v0 = (2 * 7 + 3 * 3) % 16
    v1 = (3 * 7 + 3 * 3) % 16
    assert dlat[0] == 0.75 * v0 + 0.25 * v1


def test_outside_is_nan():
    grids = parse_ntv2(write_ntv2([_grid()]))
    dlat, dlon = shift_points(grids, np.array([-5.0]), np.array([2.0]))
    assert np.isnan(dlat[0]) and np.isnan(dlon[0])


def test_densest_subgrid_wins():
    coarse = _grid("COARSE")
    fine = _grid("FINE", s_lat=0.0, n_lat=7200.0, e_long=-7200.0,
                 w_long=0.0, inc=1800.0, scale=2)
    grids = parse_ntv2(write_ntv2([coarse, fine]))
    # (lon 1 deg, lat 1 deg) lies in both; the half-degree grid wins
    dlat, _ = shift_points(grids, np.array([1.0]), np.array([1.0]))
    # fine grid: ry = 3600/1800 = 2, rx = (-3600+7200)/1800 = 2
    assert dlat[0] == (2 * 7 + 2 * 3) % 16 * 2
    # a point only the coarse grid covers
    dlat, _ = shift_points(grids, np.array([8.0]), np.array([8.0]))
    assert dlat[0] == (8 * 7 + 2 * 3) % 16


def test_spark_udf_surface(spark):
    from gdal_spark.functions.st import gridshift_columns

    blob = write_ntv2([_grid()])
    fn = gridshift_columns(blob)
    df = spark.createDataFrame(
        [(7.0, 2.0), (7.0, 2.25), (-5.0, 2.0)], "lon double, lat double")
    rows = df.select(fn("lon", "lat").alias("s")).collect()
    assert rows[0]["s"]["dlat_sec"] == (2 * 7 + 3 * 3) % 16
    v0, v1 = (2 * 7 + 3 * 3) % 16, (3 * 7 + 3 * 3) % 16
    assert rows[1]["s"]["dlat_sec"] == 0.75 * v0 + 0.25 * v1
    assert rows[2]["s"]["dlat_sec"] is None or np.isnan(
        rows[2]["s"]["dlat_sec"])


def test_inverse_roundtrip():
    from gdal_spark.kernels.gridshift import shift_points_inverse

    grids = parse_ntv2(write_ntv2([_grid()]))
    lon = np.array([1.25, 4.5, 7.75, 3.0])
    lat = np.array([2.0, 6.25, 8.5, 1.75])
    dlat, dlon = shift_points(grids, lon, lat)
    lon_f = lon + dlon / 3600.0
    lat_f = lat + dlat / 3600.0
    lon_b, lat_b = shift_points_inverse(grids, lon_f, lat_f)
    assert np.max(np.abs(lon_b - lon)) < 1e-9
    assert np.max(np.abs(lat_b - lat)) < 1e-9
