"""gdal_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-creates the operator semantics of the reference geospatial library
(GDAL/OGR 3.14.0, surveyed in SURVEY.md) as idiomatic Spark: DataFrames
over partitioned parquet tables, vectorized pandas/Arrow UDFs wrapping
batched NumPy kernels, explicit partitioning / shuffle / skew handling,
and per-partition lineage checkpointing.

Layers
------
- ``gdal_spark.kernels``   pure-NumPy exact-semantics kernels (no Spark)
- ``gdal_spark.functions`` Spark SQL function registry (ST_*, text ops)
- ``gdal_spark.operators`` distributed operators (spatial join, kNN,
  rasterize, polygonize, zonal stats, pyramid, dedup, similarity, ...)
- ``gdal_spark.sources``   table synthesis + catalog (parquet-backed)
- ``gdal_spark.plans``     pipeline + manifest checkpoint/resume
"""

from gdal_spark.session import get_spark

__version__ = "0.1.0"
__all__ = ["get_spark", "__version__"]
