"""Spark SQL function surface.

- ``st``   — spatial ST_* functions (reference's SQLite-dialect spatial
  SQL surface, ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:1111-1240),
  pandas-UDF backed over WKB.
- ``text`` — web-text analysis expressions (token count, quality score,
  language guess, fingerprint) as pure Column expressions (JVM-side,
  whole-stage-codegen'd — no Python in the hot path).
"""

from gdal_spark.functions.st import register_st_functions

__all__ = ["register_st_functions"]
