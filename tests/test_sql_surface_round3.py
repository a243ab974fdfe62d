"""Round-3 additions to the SQL surface: ST_ClipGeom /
ST_GeodesicLength / ST_Area_Ellipsoid must work through spark.sql —
the SQLite-dialect registration path
(ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp)."""

import numpy as np

from gdal_spark.functions.st import register_st_functions
from gdal_spark.kernels import wkb as W


def test_st_clipgeom_and_geodesic_via_sql(spark):
    register_st_functions(spark)
    A = W.polygon_wkb(
        [np.array([[0, 0], [4, 0], [4, 3], [0, 3], [0, 0]], float)]
    )
    B = W.polygon_wkb(
        [np.array([[4, 0], [6, 0], [6, 3], [4, 3], [4, 0]], float)]
    )
    line = W.linestring_wkb(np.array([[0.0, 0.0], [10.0, 0.0]]))
    df = spark.createDataFrame([(A, B, line)], "a binary, b binary, l binary")
    df.createOrReplaceTempView("g3")
    row = spark.sql(
        "SELECT ST_ClipGeom(a, b, 'union') AS u, "
        "ST_GeodesicLength(l) AS glen, "
        "ST_Area_Ellipsoid(a) AS garea FROM g3"
    ).collect()[0]
    polys = W.polygon_rings(bytes(row["u"]))
    assert len(polys) == 1 and polys[0][0].shape[0] == 5  # merged ring
    # 10 degrees of equator, exactly a·Δλ
    assert row["glen"] == 6378137.0 * np.radians(10.0)
    assert row["garea"] > 0
