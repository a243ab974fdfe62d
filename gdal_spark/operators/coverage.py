"""Polygonal-coverage validity check (``gdal vector check-coverage``).

The reference delegates to GEOS 3.12's CoverageIsValid
(apps/gdalalg_vector_check_coverage.cpp:104) which, per feature, emits
the ``invalid_edge`` portions of its boundary — the parts that either
bound a GAP against an adjacent polygon or cross into another
polygon's INTERIOR (an overlap).

This module re-creates that contract for axis-aligned integer-
coordinate tilings (the tile/chip coverages a web-density pipeline
actually produces) with an exactly-checkable decomposition:

- every rectangle boundary decomposes into UNIT grid segments;
- a segment shared by exactly two polygons (one on each side) is a
  valid interior edge — a groupBy on the canonical segment key finds
  these, a shuffle bounded by the segment vocabulary, never polygon ×
  polygon;
- a segment is INVALID iff it is unmatched (count == 1) and not on
  the coverage hull (it bounds a gap), or its midpoint lies strictly
  inside a DIFFERENT polygon (it bounds an overlap).

At 100-TB scale the midpoint-in-other-polygon test is the existing
cell-cover spatial join (broadcast here — the fixture rect set is
small); the segment multiset is a plain aggregation.  No Python in
either stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boundary_unit_segments(rects: DataFrame) -> DataFrame:
    """(id, x0, y0, x1, y1) int rects → one row per unit boundary
    segment: (id, orient 'h'/'v', c fixed coord, t cell coord, mx, my
    midpoint doubles)."""
    r = rects
    # one generator per select (Spark restriction): explode the side
    # pair first, the along-edge cells second
    vert = (
        r.select("id", "y0", "y1",
                 F.explode(F.array(F.col("x0"), F.col("x1"))).alias("c"))
        .select("id", F.lit("v").alias("orient"), "c",
                F.explode(F.sequence(F.col("y0"), F.col("y1") - 1)).alias("t"))
    )
    horiz = (
        r.select("id", "x0", "x1",
                 F.explode(F.array(F.col("y0"), F.col("y1"))).alias("c"))
        .select("id", F.lit("h").alias("orient"), "c",
                F.explode(F.sequence(F.col("x0"), F.col("x1") - 1)).alias("t"))
    )
    seg = vert.unionAll(horiz)
    return seg.select(
        "id", "orient", "c", "t",
        F.when(F.col("orient") == "v", F.col("c").cast("double"))
         .otherwise(F.col("t") + 0.5).alias("mx"),
        F.when(F.col("orient") == "v", F.col("t") + 0.5)
         .otherwise(F.col("c").cast("double")).alias("my"),
    )


def check_coverage(
    rects: DataFrame,
    hull: tuple[int, int, int, int],
) -> DataFrame:
    """Per-polygon invalid boundary length (unit-segment count).

    `hull` = (x0, y0, x1, y1) of the intended coverage extent —
    unmatched segments ON the hull are valid outer boundary.
    """
    seg = boundary_unit_segments(rects)
    counts = seg.groupBy("orient", "c", "t").agg(
        F.count("*").alias("n_owners")
    )
    seg = seg.join(counts, ["orient", "c", "t"])

    hx0, hy0, hx1, hy1 = hull
    on_hull = (
        ((F.col("orient") == "v") & F.col("c").isin(hx0, hx1))
        | ((F.col("orient") == "h") & F.col("c").isin(hy0, hy1))
    )

    other = rects.select(
        F.col("id").alias("oid"),
        F.col("x0").alias("ox0"), F.col("y0").alias("oy0"),
        F.col("x1").alias("ox1"), F.col("y1").alias("oy1"),
    )
    inside_other = seg.join(
        F.broadcast(other),
        (F.col("id") != F.col("oid"))
        & (F.col("mx") > F.col("ox0")) & (F.col("mx") < F.col("ox1"))
        & (F.col("my") > F.col("oy0")) & (F.col("my") < F.col("oy1")),
        "left_semi",
    ).select("id", "orient", "c", "t").withColumn("ov", F.lit(1))

    seg = seg.join(inside_other, ["id", "orient", "c", "t"], "left")
    invalid = seg.filter(
        (((F.col("n_owners") == 1) & ~on_hull) | F.col("ov").isNotNull())
    )
    per_poly = invalid.groupBy("id").agg(
        F.count("*").cast("long").alias("invalid_len")
    )
    return (
        rects.select("id")
        .join(per_poly, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("invalid_len"), F.lit(0)).cast("long")
            .alias("invalid_len"),
        )
    )


def dp_keep_exact(xs, ys, tol2: int):
    """Douglas–Peucker keep-indices on INTEGER coordinates with exact
    arithmetic: a segment (lo, hi) splits at the vertex maximizing the
    squared perpendicular distance (compared as cross² vs tol²·len²,
    no sqrt, no float), ties to the LOWEST index, split iff
    cross² > tol²·len² strictly.  Returns the sorted kept index list.

    This is the per-chain core of the coverage simplifier
    (``gdal vector simplify-coverage`` → GEOS CoverageSimplifier):
    each SHARED boundary chain is simplified ONCE, so the two
    polygons on either side stay edge-matched — topology preserved by
    construction.
    """
    import numpy as np

    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    n = len(xs)
    keep = {0, n - 1}
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        ax, ay, bx, by = xs[lo], ys[lo], xs[hi], ys[hi]
        jx = xs[lo + 1:hi]
        jy = ys[lo + 1:hi]
        cross = (bx - ax) * (jy - ay) - (by - ay) * (jx - ax)
        c2 = cross * cross
        len2 = (bx - ax) ** 2 + (by - ay) ** 2
        jbest = int(np.argmax(c2))  # first (= lowest index) max
        if c2[jbest] > tol2 * len2:
            j = lo + 1 + jbest
            keep.add(j)
            stack.append((lo, j))
            stack.append((j, hi))
    return sorted(keep)


def simplify_chains(chains: DataFrame, tol2: int) -> DataFrame:
    """(chain_id, i, x, y) integer chain vertices → kept vertices
    (chain_id, i, x, y), each chain simplified independently (shards
    by chain_id — embarrassingly parallel at any scale)."""
    import pandas as pd

    def per_chain(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("i").reset_index(drop=True)
        kept = dp_keep_exact(pdf["x"].to_numpy(), pdf["y"].to_numpy(), tol2)
        return pdf.iloc[kept][["chain_id", "i", "x", "y"]]

    return chains.groupBy("chain_id").applyInPandas(
        per_chain, "chain_id long, i long, x long, y long"
    )
