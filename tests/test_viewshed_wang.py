"""Wang-exact viewshed kernel: hand-derived blocking checks against
the reference recurrence (alg/viewshed/viewshed_executor.cpp)."""

import numpy as np

from gdal_spark.kernels.viewshed_wang import viewshed_wang


def test_constant_dem_all_visible():
    v = viewshed_wang(np.full((9, 9), 5.0), 4, 4)
    assert (v == 255.0).all()


def test_axis_wall_shadow():
    dem = np.zeros((9, 9))
    dem[4, 6] = 10.0
    v = viewshed_wang(dem, 4, 4)
    assert v[4, 6] == 255.0  # the wall itself
    # behind the wall: required height grows as 10·n/2 — hand values
    # dfZ(x=7) = 10·3/2 = 15, dfZ(x=8) = 15·4/3 = 20, both > 0
    assert v[4, 7] == 0.0 and v[4, 8] == 0.0
    # off-axis Edge-rule shadow: (7,5) needs (10·1 + 0·2)/2 = 5 > 0
    assert v[5, 7] == 0.0


def test_observer_height_clears_wall():
    dem = np.zeros((9, 9))
    dem[4, 6] = 1.0
    # observer at +10: wall relative height 1-10 < 0, nothing blocked
    v = viewshed_wang(dem, 4, 4, obs_z=10.0)
    assert (v == 255.0).all()


def test_target_height_recovers_visibility():
    dem = np.zeros((9, 9))
    dem[4, 6] = 10.0
    # a 100-unit target pokes above every blocking surface here
    v = viewshed_wang(dem, 4, 4, target_h=100.0)
    assert (v == 255.0).all()


def test_adjacent_cells_always_visible():
    rng = np.arange(81, dtype=np.float64).reshape(9, 9) * 7 % 13
    v = viewshed_wang(rng, 4, 4)
    assert v[4, 3] == 255.0 and v[4, 5] == 255.0  # first-line neighbors
    assert v[4, 4] == 255.0
