"""Median-cut color quantization (rgb2pct) as a distributed plan.

Reference semantics: alg/gdalmediancut.cpp (GDALComputeMedianCutPCT builds
a ≤256-color palette by recursively splitting RGB boxes at the median of
their longest axis) + alg/gdaldither.cpp's nearest-color assignment
(GDALDitherRGB2PCT without error diffusion).  This module re-creates the
operator Spark-first:

- the pixel table never leaves the cluster: each split round is one
  bounded groupBy(box) stats pass + one per-(box, value) histogram with a
  window cumsum to find the lower median — the shuffle key is the box id
  (≤ 2^rounds rows), never the pixel;
- the variant implemented is the round-synchronous "split every box each
  round" median cut (rounds r ⇒ exactly 2^r boxes), which is the
  distributable re-pinning of the reference's priority-queue loop (the
  same re-specification pattern as operators/sieve.py);
- all arithmetic is INTEGER (lower-median rule `2*cum >= n`, floor mean
  via `(sum - sum % n) / n`, squared-distance nearest with ties to the
  lowest palette index), so results are bitwise identical across engines.

Scale shape at 10^12 pixels: per-round stats and histograms are map-side
combinable; the box-stats / median tables are ≤ 2^rounds rows and
broadcast back; the final nearest-palette assignment is a broadcast
cross-join against ≤ 256 palette rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _axis_col(rr, rg, rb):
    # longest axis, ties r > g > b — CASE order mirrored in the SQL oracle
    return (
        F.when((rr >= rg) & (rr >= rb), F.lit(0))
        .when(rg >= rb, F.lit(1))
        .otherwise(F.lit(2))
    )


def median_cut_split_rounds(pixels: DataFrame, rounds: int = 3) -> DataFrame:
    """Assign each pixel a 2^rounds-box id via round-synchronous median cut.

    `pixels` needs integer columns (pid, r, g, b); returns the same rows
    with a `box` column in [0, 2^rounds).
    """
    # Each round references the current pixel table from three branches
    # (stats, the value projection, and the split join), so the LOGICAL
    # plan is a TREE that grows ~4x per round even under persist() — at
    # 8 rounds (256 colors) Catalyst analysis alone blew up.  persist
    # keeps execution one columnar pass per round; a localCheckpoint
    # every FOURTH round truncates lineage so the plan stays bounded
    # (persist alone: exponential analysis; checkpoint alone: row-format
    # materialization cost every round — measured 8x slower).  Each
    # round materializes eagerly (count) so the superseded round's
    # cache can be released — otherwise rounds+1 full pixel copies pin
    # executor storage (the graph.py iterative-loop pattern).
    px = pixels.withColumn("box", F.lit(0).cast("long")).persist()
    for round_idx in range(rounds):
        stats = px.groupBy("box").agg(
            F.min("r").alias("minr"), F.max("r").alias("maxr"),
            F.min("g").alias("ming"), F.max("g").alias("maxg"),
            F.min("b").alias("minb"), F.max("b").alias("maxb"),
            F.count("*").alias("n"),
        )
        ax = stats.select(
            "box", "n",
            _axis_col(
                F.col("maxr") - F.col("minr"),
                F.col("maxg") - F.col("ming"),
                F.col("maxb") - F.col("minb"),
            ).alias("axis"),
        )
        pv = px.join(F.broadcast(ax), "box").withColumn(
            "v",
            F.when(F.col("axis") == 0, F.col("r"))
            .when(F.col("axis") == 1, F.col("g"))
            .otherwise(F.col("b")),
        )
        hist = pv.groupBy("box", "v", "n").agg(F.count("*").alias("c"))
        cum = hist.withColumn(
            "cum", F.sum("c").over(Window.partitionBy("box").orderBy("v"))
        )
        med = (
            cum.filter(2 * F.col("cum") >= F.col("n"))
            .groupBy("box")
            .agg(F.min("v").alias("m"))
        )
        new_px = pv.join(F.broadcast(med), "box").select(
            "pid", "r", "g", "b",
            (F.col("box") * 2 + F.when(F.col("v") > F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("box"),
        )
        new_px = (new_px.localCheckpoint(eager=False)
                  if round_idx % 4 == 3 else new_px.persist())
        new_px.count()  # materialize this round's pass ...
        px.unpersist()  # ... then release the superseded round's cache
        px = new_px
    return px


def median_cut_palette(boxed: DataFrame) -> DataFrame:
    """Per-box palette entry: floor-mean color + box population.

    Floor mean is computed as (sum - sum % n) / n — pure integer
    arithmetic, so the double division is exact and engine-independent.
    """

    def fmean(c):
        s, n = F.sum(c), F.count("*")
        return ((s - s % n) / n).cast("long")

    return boxed.groupBy("box").agg(
        fmean("r").alias("pal_r"),
        fmean("g").alias("pal_g"),
        fmean("b").alias("pal_b"),
        F.count("*").alias("n_box"),
    )


def nearest_palette_counts(boxed: DataFrame, palette: DataFrame) -> DataFrame:
    """GDALDitherRGB2PCT-style nearest-color assignment (no diffusion):
    per-pixel argmin of integer squared RGB distance over the broadcast
    palette, ties to the lowest palette index; returns per-entry counts."""
    pal = palette.select(
        F.col("box").alias("pbox"),
        F.col("pal_r").alias("qr"),
        F.col("pal_g").alias("qg"),
        F.col("pal_b").alias("qb"),
    )
    dr = F.col("r") - F.col("qr")
    dg = F.col("g") - F.col("qg")
    db = F.col("b") - F.col("qb")
    scored = boxed.crossJoin(F.broadcast(pal)).withColumn(
        "dist", dr * dr + dg * dg + db * db
    )
    # argmin via lexicographic struct-min — (dist, pbox) ordering IS the
    # ties-to-lowest-index rule, and the aggregation is map-side
    # combinable (a window row_number would SORT pixels x palette rows:
    # ~1e9 at 4M px x 256 colors)
    best = scored.groupBy("pid").agg(
        F.min(F.struct("dist", "pbox")).alias("m"))
    return best.groupBy(F.col("m.pbox").alias("pbox")).agg(
        F.count("*").alias("n_assigned"))


def median_cut_quantize(pixels: DataFrame, rounds: int = 3) -> DataFrame:
    """Full rgb2pct: palette + box populations + nearest-assignment counts."""
    boxed = median_cut_split_rounds(pixels, rounds)
    # boxed is already persisted by the split loop — it feeds the palette
    # aggregation AND the assignment join without re-execution.
    palette = median_cut_palette(boxed)
    counts = nearest_palette_counts(boxed, palette)
    return (
        palette.join(counts, palette.box == counts.pbox, "left")
        .select(
            "box", "pal_r", "pal_g", "pal_b", "n_box",
            F.coalesce(F.col("n_assigned"), F.lit(0)).cast("long").alias("n_assigned"),
        )
    )
