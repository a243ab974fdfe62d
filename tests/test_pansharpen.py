"""Weighted-Brovey nodata propagation
(GDALPansharpenOperation::WeightedBroveyWithNoData,
alg/gdalpansharpen.cpp:506-560): any MS band at nodata, or pan at
nodata, or pseudo_pan == 0, emits nodata on EVERY output band."""

import numpy as np

from gdal_spark.operators.pansharpen import pansharpen_tiles
from gdal_spark.session import local_df


def test_nodata_propagation(spark):
    ts = 4
    nod = -1.0
    pan = np.full((ts, ts), 10.0)
    pan[0, 0] = nod  # pan nodata
    ms0 = np.full((ts, ts), 2.0)
    ms1 = np.full((ts, ts), 4.0)
    ms0[1, 1] = nod  # one MS band nodata
    ms0[2, 2] = 0.0
    ms1[2, 2] = 0.0  # pseudo_pan == 0 naturally
    pan_df = local_df(spark, [(0, 0, pan.tobytes())], "tx long, ty long, data binary")
    ms_df = local_df(
        spark,
        [(0, 0, 0, ms0.tobytes()), (0, 0, 1, ms1.tobytes())],
        "tx long, ty long, band int, data binary",
    )
    out = pansharpen_tiles(
        pan_df, ms_df, [0.5, 0.5], dz=0, nodata=nod, tile_size=ts
    ).toPandas()
    bands = {
        int(r["band"]): np.frombuffer(r["data"], dtype=np.float64).reshape(ts, ts)
        for _, r in out.iterrows()
    }
    for b in (0, 1):
        assert bands[b][0, 0] == nod
        assert bands[b][1, 1] == nod
        assert bands[b][2, 2] == nod
    # a clean pixel: factor = 10 / (0.5*2 + 0.5*4) = 10/3
    assert abs(bands[0][3, 3] - 2.0 * (10.0 / 3.0)) < 1e-12
    assert abs(bands[1][3, 3] - 4.0 * (10.0 / 3.0)) < 1e-12
