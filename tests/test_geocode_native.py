"""Native (Column-expression) geocode+encode is bitwise identical to
the Arrow-UDF path — the pinned md5-jitter spec has exactly one
meaning regardless of which engine tier computes it."""

import pyspark.sql.functions as F

from gdal_spark.sources.pages import geocode_encode, synth_pages


def test_native_matches_arrow_bitwise(spark):
    pages = synth_pages(spark, 20_000, 8).cache()
    a = geocode_encode(pages, res_list=(7, 9), native=True).select(
        "page_id", "lon", "lat", "cell7", "cell9"
    )
    b = geocode_encode(pages, res_list=(7, 9), native=False).select(
        "page_id",
        F.col("lon").alias("lon2"),
        F.col("lat").alias("lat2"),
        F.col("cell7").alias("c72"),
        F.col("cell9").alias("c92"),
    )
    j = a.join(b, "page_id")
    bad = j.filter(
        (F.col("lon") != F.col("lon2"))
        | (F.col("lat") != F.col("lat2"))
        | (F.col("cell7") != F.col("c72"))
        | (F.col("cell9") != F.col("c92"))
    ).count()
    assert j.count() == 20_000
    assert bad == 0


def test_native_plan_has_no_python_worker(spark):
    """The native path must stay JVM-side: no ArrowEvalPython /
    BatchEvalPython node anywhere in the physical plan."""
    pages = synth_pages(spark, 100, 2)
    plan = (
        geocode_encode(pages, res_list=(7, 9), native=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
