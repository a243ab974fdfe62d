"""Coverage-check operator semantics (gdal vector check-coverage):
clean tilings have zero invalid boundary; a shifted tile flags exactly
the gap and overlap edges on the right polygons."""

import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.coverage import check_coverage


def _rects(spark, shift_id=None):
    k = spark.range(9)
    sh = F.when(F.col("id") == shift_id, 1).otherwise(0) if shift_id is not None else F.lit(0)
    return k.select(
        "id",
        ((F.col("id") % 3) * 4 + sh).alias("x0"),
        (F.floor(F.col("id") / 3) * 4).cast("long").alias("y0"),
        ((F.col("id") % 3) * 4 + sh + 4).alias("x1"),
        (F.floor(F.col("id") / 3) * 4 + 4).cast("long").alias("y1"),
    )


def test_clean_tiling_is_valid(spark):
    out = check_coverage(_rects(spark), (0, 0, 12, 12)).collect()
    assert all(r["invalid_len"] == 0 for r in out)


def test_shifted_tile_flags_gap_and_overlap(spark):
    # shift tile 4 (center) +1 in x: gap column against tile 3,
    # overlap column against tile 5
    out = {r["id"]: r["invalid_len"]
           for r in check_coverage(_rects(spark, 4), (0, 0, 12, 12)).collect()}
    # tile 4: left edge (gap, 4) + right edge inside tile 5 (4)
    assert out[4] == 8
    # tile 3: right edge now unmatched (gap) -> 4
    assert out[3] == 4
    # tile 5: left edge inside tile 4 -> 4
    assert out[5] == 4
    # tiles above/below the shifted one lose/gain single horizontal units
    assert out[1] == 1 and out[7] == 1
    # far tiles untouched
    assert out[0] == 0 and out[2] == 0 and out[6] == 0 and out[8] == 0


def test_overlap_only_both_sides_flagged(spark):
    # two rects side by side, right one overlapping by 2
    import pandas as pd

    pdf = pd.DataFrame(
        {"id": [0, 1], "x0": [0, 2], "y0": [0, 0], "x1": [4, 6], "y1": [4, 4]}
    )
    df = spark.createDataFrame(pdf)
    out = {r["id"]: r["invalid_len"]
           for r in check_coverage(df, (0, 0, 6, 4)).collect()}
    # each polygon's inner vertical edge lies in the other's interior
    # (4 units), and the top/bottom unit segments over the overlap
    # strip are matched pairs (valid) — but their midpoints sit on
    # boundaries, not interiors, so only the vertical edges flag
    assert out[0] == 4 and out[1] == 4
