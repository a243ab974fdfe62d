"""Streaming tile sink: per-micro-batch partial burns committed as
snapshots; compaction equals the batch burn BITWISE regardless of
batch boundaries (ADD is associative/commutative)."""

import tempfile

import pyspark.sql.functions as F

from gdal_spark.operators.rasterize import rasterize_points
from gdal_spark.sources.pages import geocode_encode, synth_pages
from gdal_spark.streaming.tile_sink import compact_tiles, stream_density_tiles


def test_streamed_compaction_matches_batch(spark):
    pages_dir = tempfile.mkdtemp(prefix="gdal_spark_pages_")
    out_root = tempfile.mkdtemp(prefix="gdal_spark_tiles_")
    # 4 files → 4 micro-batches at maxFilesPerTrigger=1
    synth_pages(spark, 20_000, 4).write.mode("overwrite").parquet(pages_dir)

    snaps = stream_density_tiles(spark, pages_dir, out_root, z=8)
    assert len(snaps) >= 2  # several incremental commits happened

    streamed = (
        compact_tiles(spark, snaps)
        .select("tx", "ty", F.md5("data").alias("h"))
        .toPandas()
        .sort_values(["tx", "ty"])
        .reset_index(drop=True)
    )
    geo = geocode_encode(spark.read.parquet(pages_dir), res_list=(7,)).select(
        "page_id", "lon", "lat"
    )
    batch = (
        rasterize_points(geo, z=8)
        .select("tx", "ty", F.md5("data").alias("h"))
        .toPandas()
        .sort_values(["tx", "ty"])
        .reset_index(drop=True)
    )
    assert len(streamed) and streamed.equals(batch)
