"""Structured Streaming veneer over the same operator kernels.

The reference has no streaming model (SURVEY.md §2.9 — batch pull
iteration only); this module is the engine's incremental-ingest
extension: the events table consumed as a file stream, event-time
windowed aggregation with a watermark, results landing in the same
table shapes the batch operators produce.  ``trigger(availableNow)``
drains everything currently present and stops — which also makes the
streaming path *testable against the batch oracle*: same input, same
expected output, one of them computed incrementally with state.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_hourly_agg(
    spark: SparkSession,
    events_path: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Run the hourly (window, event_type) count/sum aggregation as a
    real Structured Streaming query (file source → stateful windowed
    agg → memory sink, availableNow) and return the drained result.

    At scale this is `readStream` from the landing bucket with a
    running trigger; the watermark bounds state: windows older than
    max(event time) − watermark are finalized and evicted.
    """
    batch_df = spark.read.parquet(events_path)
    name = "stream_hourly_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_ckpt_")
    # the file stream source wants a DIRECTORY to watch; stage the
    # table file behind a symlink dir (at scale this is the landing
    # prefix new files arrive into)
    src_dir = tempfile.mkdtemp(prefix="gdal_spark_stream_")
    os.symlink(os.path.abspath(events_path), os.path.join(src_dir, "part-0.parquet"))
    stream = (
        spark.readStream.schema(batch_df.schema).parquet(src_dir)
        # watermarks require TIMESTAMP (LTZ); parquet NTZ casts losslessly
        # under the fixed UTC session timezone and is cast back below
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col("window.start").cast("timestamp_ntz").alias("hour"),
        "event_type", "n", "sum_value",
    )


def stream_dedup(
    spark: SparkSession,
    events_path: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming EXACT dedup: the landing directory receives the same
    file twice (the classic at-least-once-delivery duplicate), and a
    watermarked ``dropDuplicates`` on the event key emits each event
    once — the streaming form of the batch exact-dedup operator.  The
    watermark bounds the dedup state exactly as it bounds window state:
    keys older than max(event time) − watermark are evicted.

    Returns the drained deduplicated rows (append mode)."""
    batch_df = spark.read.parquet(events_path)
    name = "stream_dedup_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_ckpt_")
    src_dir = tempfile.mkdtemp(prefix="gdal_spark_stream_")
    # duplicate delivery: the same data arrives as two files
    os.symlink(os.path.abspath(events_path), os.path.join(src_dir, "part-0.parquet"))
    os.symlink(os.path.abspath(events_path), os.path.join(src_dir, "part-1.parquet"))
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)  # the duplicate arrives in a LATER batch
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicates(["event_id"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_geocode_density(
    spark: SparkSession,
    documents_path: str,
    res: int = 9,
) -> DataFrame:
    """The north-star ingest pipeline as a REAL Structured Streaming
    query: pages stream in (file source), raw bytes → extracted text
    (the pinned tag-strip spec, a pandas UDF running inside the
    stream), extracted text → geocode + cell-encode (the JVM-native
    Column path — whole-stage codegen inside a streaming micro-batch),
    then an incremental per-cell density rollup (complete mode).
    ``availableNow`` drains the current files and stops, making the
    result batch-comparable; a deployment leaves the trigger running
    and gets the same tile table continuously.
    """
    from gdal_spark.functions.html import extract_text
    from gdal_spark.sources.pages import CITIES, geocode_encode

    batch_df = spark.read.parquet(documents_path)
    name = "stream_geo_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_ckpt_")
    src_dir = tempfile.mkdtemp(prefix="gdal_spark_stream_")
    os.symlink(
        os.path.abspath(documents_path), os.path.join(src_dir, "part-0.parquet")
    )

    name_arr = F.array(*[F.lit(c[0]) for c in CITIES])
    ci = (F.col("doc_id") % 15).cast("int")
    pages = (
        spark.readStream.schema(batch_df.schema).parquet(src_dir)
        .select(
            "doc_id",
            F.concat(
                F.lit("https://"), F.element_at(name_arr, ci + 1),
                F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
            ).alias("url"),
            # raw page bytes: the same markup wrap the synthesizer uses
            F.concat(
                F.lit("<html><body><p>"),
                F.concat(F.element_at(name_arr, ci + 1), F.lit(" x")),
                F.lit("</p></body></html>"),
            ).cast("binary").alias("html"),
        )
        .withColumn("text", extract_text(F.col("html")))
    )
    cells = geocode_encode(pages, res_list=(res,)).groupBy(f"cell{res}").count()
    q = (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.col(f"cell{res}").alias("cell"), F.col("count").alias("n")
    )


def stream_minhash_buckets(
    spark: SparkSession,
    documents_path: str,
    k: int = 3,
) -> DataFrame:
    """Streaming MinHash-LSH near-dup bucketing: documents arrive in
    two micro-batches (originals, then near-dup redeliveries under
    shifted ids), and the query maintains per-(band, bucket) state —
    keeper = min doc id, n_docs — incrementally.

    Structured Streaming allows only ONE stateful aggregation per
    query, so the signature step is STATELESS by construction: each
    row carries its whole text, shingles come from
    transform(sequence)/substring array ops, and sig_j =
    array_min(transform(shingles, s → md5(j‖s))) — the lexicographic
    min of md5 hex strings, portable to the DuckDB oracle verbatim.
    The single groupBy(band, bucket) agg is the stateful operator
    (complete mode, availableNow drain)."""
    batch_df = spark.read.parquet(documents_path)
    name = "stream_mh_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_ckpt_")
    src_dir = tempfile.mkdtemp(prefix="gdal_spark_stream_")
    os.symlink(
        os.path.abspath(documents_path), os.path.join(src_dir, "part-0.parquet")
    )
    # near-dup redelivery: the same texts return under ids +100000
    batch_df.select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, "dup"))
    import glob as _glob

    dup_file = _glob.glob(os.path.join(src_dir, "dup", "part-*.parquet"))[0]
    os.symlink(dup_file, os.path.join(src_dir, "part-1.parquet"))

    schema = "doc_id long, text string"
    shingles = (
        f"array_distinct(filter(transform("
        f"sequence(1, greatest(length(text) - {k - 1}, 1)), "
        f"i -> substring(text, i, {k})), s -> length(s) = {k}))"
    )

    def sig(j: int) -> str:
        return (
            f"array_min(transform({shingles}, s -> md5(concat('{j}', s))))"
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .selectExpr(
            "doc_id",
            f"md5(concat({sig(0)}, {sig(1)}, {sig(2)}, {sig(3)})) AS b0",
            f"md5(concat({sig(4)}, {sig(5)}, {sig(6)}, {sig(7)})) AS b1",
        )
        .selectExpr(
            "doc_id",
            "explode(map(0, b0, 1, b1)) AS (band, bucket)",
        )
        .groupBy("band", "bucket")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count("*").alias("n_docs"),
        )
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_capture_dedup(
    spark: SparkSession,
    captures: DataFrame,
    watermark: str = "2400 hours",
) -> DataFrame:
    """Streaming CDX revisit dedup: crawl captures arrive in
    micro-batches (with the same file delivered twice — at-least-once
    ingest); ``dropDuplicatesWithinWatermark`` on (url, digest) lets the
    FIRST capture of each content version through and absorbs every
    revisit and redelivery into state.  The WithinWatermark form is
    what actually lets the state store EVICT keys older than the
    watermark (a plain dropDuplicates without the event-time column in
    its keys would keep state forever); duplicates farther apart than
    the watermark may re-emit — the fixture's 90-day spread sits inside
    the 2400 h window, so the drained set equals the batch distinct.

    ``captures`` needs columns (url, ts timestamp-castable, digest).
    Returns the drained unique-content captures (append mode)."""
    name = "stream_cdx_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_ckpt_")
    src_dir = tempfile.mkdtemp(prefix="gdal_spark_stream_")
    data_dir = os.path.join(src_dir, "data")
    captures.write.parquet(data_dir)
    land_dir = tempfile.mkdtemp(prefix="gdal_spark_land_")
    for i, f in enumerate(sorted(os.listdir(data_dir))):
        if not f.endswith(".parquet"):
            continue
        src = os.path.join(data_dir, f)
        os.symlink(src, os.path.join(land_dir, f"a{i}.parquet"))
        os.symlink(src, os.path.join(land_dir, f"b{i}.parquet"))  # redelivery
    stream = (
        spark.readStream.schema(captures.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["url", "digest"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_robots_gate(
    spark: SparkSession,
    events: DataFrame,
    rules_by_set: DataFrame,
    watermark: str = "4 hours",
) -> DataFrame:
    """Streaming robots.txt gate: fetch events arrive as a file stream,
    the RFC 9309 longest-match decision is computed STATELESSLY per
    event against the broadcast pre-aggregated rules (static side =
    one row per ruleset with its rules ARRAY — the stream-static join
    adds no state; the per-event argmax is an array fold, not an
    aggregation), and ONE stateful windowed aggregation counts
    allowed/denied per (host, hour) with a watermark bounding state.

    ``events``: (host_id, path, ts epoch-seconds).
    ``rules_by_set``: (ruleset, rules array<struct<prefix,allow>>).
    Returns drained (win_start epoch, host_id, allowed, n).
    """
    name = "stream_robots_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_ckpt_")
    src_dir = tempfile.mkdtemp(prefix="gdal_spark_stream_")
    data_dir = os.path.join(src_dir, "data")
    events.write.parquet(data_dir)
    land_dir = tempfile.mkdtemp(prefix="gdal_spark_land_")
    for i, f in enumerate(sorted(os.listdir(data_dir))):
        if f.endswith(".parquet"):
            os.symlink(os.path.join(data_dir, f),
                       os.path.join(land_dir, f"p{i}.parquet"))
    decided = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land_dir)
        .join(F.broadcast(rules_by_set),
              F.col("host_id") % 4 == F.col("ruleset"), "left")
        .withColumn(
            "code",
            F.coalesce(
                F.expr(
                    "array_max(transform("
                    "filter(rules, r -> startswith(path, r.prefix)), "
                    "r -> length(r.prefix) * 2 + r.allow))"
                ),
                F.lit(1),
            ),
        )
        .withColumn("allowed", (F.col("code") % 2).cast("long"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "host_id", "allowed")
        .agg(F.count("*").alias("n"))
    )
    q = (
        decided.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).select(
        F.unix_timestamp(F.col("window.start")).cast("long")
            .alias("win_start"),
        F.col("host_id").cast("long").alias("host_id"),
        "allowed",
        F.col("n").cast("long").alias("n"),
    )
    return out.localCheckpoint(eager=True)


def stream_hll_registers(
    spark: SparkSession,
    docs_path: str,
) -> DataFrame:
    """Maintain per-host HyperLogLog registers (p=5) as a REAL
    Structured Streaming query: the per-row bucket/rho computation is
    stateless (md5-derived 32-bit hash, bin()-length leading-zero
    rank), and the SINGLE stateful operator is the (host, bucket)
    MAX — which is exactly why HLL suits streaming: registers are
    mergeable, monotone, and bounded (32 rows per host forever,
    independent of the URL volume).  complete-mode memory sink,
    availableNow trigger; the drained register table feeds the batch
    estimate exactly as the q279 batch path does.
    """
    batch_df = spark.read.parquet(docs_path)
    name = "stream_hll_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_ckpt_")
    src_dir = tempfile.mkdtemp(prefix="gdal_spark_stream_")
    os.symlink(os.path.abspath(docs_path), os.path.join(src_dir, "part-0.parquet"))
    rho = (
        spark.readStream.schema(batch_df.schema).parquet(src_dir)
        .select(
            (F.col("doc_id") % 25).alias("host"),
            F.concat(
                F.lit("https://h"), (F.col("doc_id") % 25).cast("string"),
                F.lit(".example.com/p"),
                ((F.col("doc_id") * 13) % 40).cast("string"),
            ).alias("url"),
        )
        .withColumn(
            "h32",
            F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast("long"),
        )
        .select(
            "host",
            (F.col("h32") % 32).alias("b"),
            F.when(F.expr("h32 div 32") == 0, F.lit(28))
            .otherwise(28 - F.length(F.bin(F.expr("h32 div 32"))))
            .alias("rho"),
        )
        .groupBy("host", "b")
        .agg(F.max("rho").alias("reg"))
    )
    q = (
        rho.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_countmin_cells(
    spark: SparkSession,
    docs_path: str,
) -> DataFrame:
    """Maintain the q278 Count-Min sketch cells as a REAL Structured
    Streaming query: tokenization and the 4-row hash explode are
    stateless; the SINGLE stateful operator is the (row, col) SUM —
    CMS state is 256 cells forever regardless of stream volume,
    which is why frequency sketches live in the stream tier.
    complete-mode memory sink, availableNow trigger.
    """
    batch_df = spark.read.parquet(docs_path)
    name = "stream_cms_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_ckpt_")
    src_dir = tempfile.mkdtemp(prefix="gdal_spark_stream_")
    os.symlink(os.path.abspath(docs_path), os.path.join(src_dir, "part-0.parquet"))
    cells = (
        spark.readStream.schema(batch_df.schema).parquet(src_dir)
        .select(F.explode(F.split("text", " ")).alias("word"))
        .select(
            "word",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r"),
        )
        .withColumn(
            "c",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("cm"), F.col("r").cast("string"),
                                   F.lit(":"), F.col("word"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long") % 64,
        )
        .groupBy("r", "c")
        .agg(F.count("*").alias("cell"))
    )
    q = (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_click_attribution(
    spark: SparkSession,
    events_path: str,
    window_s: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM interval join — the one Structured Streaming
    join shape the other streaming queries don't exercise: an
    impression stream joined to a click stream on user equality plus
    an event-time range (click within ``window_s`` after the
    impression), with watermarks on BOTH sides so the join state is
    bounded (impressions older than max(event time) − watermark −
    window are evicted; Spark derives the state-cleanup predicate
    from the time-range condition).  Both streams are carved from
    the same landing directory by key class — at scale these are two
    separate topics/prefixes.  availableNow drains everything in one
    pass; the returned DataFrame is the drained APPEND-mode sink
    aggregated in batch (keeping the stream itself to ONE stateful
    operator, the round-3 contract)."""
    batch_df = spark.read.parquet(events_path)
    name = "stream_attr_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_ckpt_")
    src_dir = tempfile.mkdtemp(prefix="gdal_spark_stream_")
    os.symlink(os.path.abspath(events_path), os.path.join(src_dir, "part-0.parquet"))

    def _side(pred: str, idcol: str) -> DataFrame:
        return (
            spark.readStream.schema(batch_df.schema).parquet(src_dir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .filter(pred)
            .selectExpr(f"event_id AS {idcol}", "user_id", "ts")
            .withWatermark("ts", watermark)
        )

    imps = _side("event_id % 3 != 0", "imp_id").withColumnRenamed(
        "user_id", "i_user").withColumnRenamed("ts", "i_ts")
    clicks = _side("event_id % 3 = 0", "click_id").withColumnRenamed(
        "user_id", "c_user").withColumnRenamed("ts", "c_ts")
    joined = imps.join(
        clicks,
        F.expr(
            f"i_user = c_user AND c_ts >= i_ts "
            f"AND c_ts <= i_ts + interval {window_s} seconds"
        ),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy((F.col("i_user") % 50).cast("long").alias("cohort"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.countDistinct("click_id").cast("long").alias("n_clicks"),
            F.countDistinct("imp_id").cast("long").alias("n_imps"),
        )
    )
