"""Multidimensional array (MDArray) API — GDAL's multidim surface
(gcore/gdalmultidim.cpp: GDALMDArray::GetView slicing :3181,
Transpose :4049, GetMean/statistics :7776) mapped Spark-first.

Representation: a LONG-FORMAT DataFrame — one row per populated cell,
one column per dimension index (``i0..i{n-1}``) plus ``v``.  This is
the only representation that distributes: a 10^12-cell hypercube is
just a partitioned table, slicing is a Catalyst range filter
(partition-prunable), transposition is a column rename (zero data
movement — the reference's Transpose is likewise a view), and
axis reduction is a groupBy on the surviving dimensions with map-side
partial aggregation.  Dense blocks can always be re-materialized
per-tile by the raster operators; sparse stays sparse for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mdarray_slice(arr: DataFrame, axis: int, lo: int, hi: int) -> DataFrame:
    """GetView slice [lo, hi) along ``axis`` — indices re-based to 0
    (view semantics, GDALMDArray::GetView)."""
    c = f"i{axis}"
    return arr.filter((F.col(c) >= lo) & (F.col(c) < hi)).withColumn(
        c, F.col(c) - F.lit(lo)
    )


def mdarray_transpose(arr: DataFrame, perm: list[int]) -> DataFrame:
    """Axis permutation (GDALMDArray::Transpose): output axis j reads
    input axis perm[j].  Pure projection — no shuffle, no data copy."""
    cols = [F.col(f"i{p}").alias(f"i{j}") for j, p in enumerate(perm)]
    return arr.select(*cols, "v")


def mdarray_reduce(arr: DataFrame, axis: int, op: str = "mean") -> DataFrame:
    """Reduce along ``axis`` (mean/sum/min/max/count — the statistics
    family): groupBy the surviving dims, axes renumbered densely."""
    ndims = sum(1 for c in arr.columns if c.startswith("i"))
    keep = [a for a in range(ndims) if a != axis]
    agg = {
        "mean": F.avg("v"), "sum": F.sum("v"), "min": F.min("v"),
        "max": F.max("v"), "count": F.count("v"),
    }[op]
    out = arr.groupBy(*[f"i{a}" for a in keep]).agg(agg.alias("v"))
    return out.select(
        *[F.col(f"i{a}").alias(f"i{j}") for j, a in enumerate(keep)], "v"
    )
