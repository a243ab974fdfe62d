from gdal_spark.streaming.windowed import stream_hourly_agg  # noqa: F401
