"""SparkSession factory with scale-aware defaults.

Local mode is a stand-in for a multi-executor cluster: every knob below
is chosen so the same code runs unchanged under ``spark-submit
--py-files`` on 1000 executors — shuffle partitioning, AQE (runtime
coalesce + skew-join splitting), Arrow batching for pandas UDFs.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import SparkSession

# Arrow batch size mirrors the reference's own columnar fast path
# (ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp:2079 uses 65,536-row
# record batches as the default unit of transfer).
ARROW_BATCH_ROWS = 65_536


def get_spark(
    app_name: str = "gdal_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``cores`` honours $SPARK_GRAFT_CPUS; shuffle partitions default to
    2×cores locally (on a real cluster you would size this to
    2-3× total executor cores — set it via ``extra_conf``).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)

    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_BATCH_ROWS),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def local_df(spark, rows, schema):
    """Arrow-native creation of a small driver-side table.

    ``spark.createDataFrame(list_of_tuples, schema)`` routes through
    ``applySchemaToPythonRDD`` — a pickled Python RDD whose EVERY scan
    pays a Python-worker round-trip per upstream partition (measured
    4-9 s per job for a 6-row table on this host).  Routing the same
    rows through a pandas DataFrame instead converts once to Arrow
    record batches on the driver; all subsequent scans are JVM-side
    (measured 0.2 s for the identical plan).  At cluster scale the same
    reasoning holds: broadcast-sized dims should never drag a Python
    worker into every task that scans them.
    """
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    if isinstance(schema, str):
        # proper DDL parse — naive ','-splitting misparses types that
        # contain commas (decimal(10,2), map<...>, struct<...>)
        from pyspark.sql import types as T

        names = T._parse_datatype_string(schema).names
    else:
        names = schema.names
    pdf = pd.DataFrame(rows, columns=names)
    return spark.createDataFrame(pdf, schema=schema)
