"""Hillshade igor/combined/multidirectional — rounding-margin contract.

q246/q247 compare atan/acos-bearing values (JVM libm vs DuckDB libm,
which differ by 1 ulp on ~3% of arguments) after round(3) IN the
query.  Green is only honest if no fixture pixel sits near a rounding
boundary: these tests pin that every pixel's distance to the nearest
half-integer of value*1000 exceeds 1e-4 (x1e-3 units) — i.e. >= 10^8
ulps of margin, so last-ulp libm drift can never flip a rounded value.
Measured fixture minima: igor 1.16e-3, combined 1.79e-2.
"""

import numpy as np
import pyspark.sql.functions as F

from gdal_spark.operators.focal import (
    hillshade_multidirectional_tiles,
    horn_pq_tiles,
)
from gdal_spark.queries import (
    DEM_H,
    DEM_TILE,
    DEM_W,
    _aspect_sql,
    _combined_shade_sql,
    _dem_tiles,
    _igor_shade_sql,
)


def _margins(vals: np.ndarray) -> float:
    frac = np.mod(vals * 1000.0, 1.0)
    return float(np.abs(frac - 0.5).min())


def test_igor_combined_aspect_rounding_margins(spark):
    pq = horn_pq_tiles(_dem_tiles(spark), DEM_TILE, DEM_W, DEM_H)
    for expr in (_igor_shade_sql("p", "q"), _combined_shade_sql("p", "q"),
                 _aspect_sql("p", "q")):
        vals = np.array([r[0] for r in pq.select(F.expr(expr)).collect()])
        assert len(vals) == (DEM_W - 2) * (DEM_H - 2)
        assert np.isfinite(vals).all()
        assert _margins(vals) > 1e-4


def test_multidirectional_matches_flat_and_bounds(spark):
    out = hillshade_multidirectional_tiles(
        _dem_tiles(spark), DEM_TILE, DEM_W, DEM_H
    )
    vals = np.array([r["v"] for r in out.collect()])
    # shade is 1 + cang*127-ish: within (0, 256)
    assert (vals > 0.0).all() and (vals < 256.0).all()
    assert len(vals) == (DEM_W - 2) * (DEM_H - 2)
