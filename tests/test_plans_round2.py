"""Plan hygiene for the round-2 operators: salted burns add exactly
one extra (tiny, fixed-size) exchange; pansharpen's parent-tile join
is an equi-join; the native geocode stage has no Python node."""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_point_burn_has_two_exchanges(spark):
    from gdal_spark.operators.rasterize import rasterize_points
    from gdal_spark.sources.pages import geocode_encode, synth_pages

    geo = geocode_encode(synth_pages(spark, 2000, 4), res_list=(7,))
    plan = plan_of(rasterize_points(geo, z=8, salt=32))
    hashes = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    # phase 1 shuffles points on (tx, ty, salt); phase 2 shuffles only
    # partial tiles on (tx, ty) — O(tiles x salt), corpus-independent.
    # (synth_pages itself contributes a repartition exchange upstream —
    # count only the tile-keyed ones)
    tile_hashes = [h for h in hashes if "tx" in h]
    assert len(tile_hashes) == 2
    assert any("_salt" in h for h in tile_hashes)
    assert "CartesianProduct" not in plan


def test_pansharpen_join_is_equi(spark):
    from gdal_spark.operators.pansharpen import pansharpen_tiles
    from gdal_spark.session import local_df

    ts = 4
    pan = local_df(
        spark, [(0, 0, np.zeros((ts, ts)).tobytes())], "tx long, ty long, data binary"
    )
    ms = local_df(
        spark,
        [(0, 0, b, np.ones((ts, ts)).tobytes()) for b in range(2)],
        "tx long, ty long, band int, data binary",
    )
    plan = plan_of(pansharpen_tiles(pan, ms, [0.5, 0.5], dz=1, tile_size=ts))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_native_geocode_no_python_node(spark):
    from gdal_spark.sources.pages import geocode_encode, synth_pages

    plan = plan_of(geocode_encode(synth_pages(spark, 100, 2), res_list=(7, 9)))
    assert "EvalPython" not in plan


def test_inverse_burn_driven_by_full_grid(spark):
    from gdal_spark.kernels import wkb as W
    from gdal_spark.operators.rasterize_invert import rasterize_invert_grid
    from gdal_spark.session import local_df

    ring = np.array([[2, 2], [10, 2], [10, 8], [2, 8], [2, 2]], dtype=np.float64)
    feats = local_df(spark, [(1.0, W.polygon_wkb([ring]))], "burn double, geom binary")
    tiles = rasterize_invert_grid(
        feats, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), 64, 64, burn_value=5.0, tile_size=32
    )
    # ALL 4 tiles of the 64x64 grid materialize, including the 3 the
    # feature never touches
    assert tiles.count() == 4
