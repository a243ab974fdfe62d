"""Custom stateful streaming operator: incremental sessionization via
``applyInPandasWithState``.

The batch sessionizer (queries.q10) is a window + lag; the streaming
form keeps per-user state (last event second, session count, event
count) across micro-batches.  To make the state carry-over REAL in a
test (not a single all-data batch), the input table is staged as N
time-ordered files and consumed with ``maxFilesPerTrigger=1`` — the
query then runs N micro-batches and every user whose events span
files exercises the state path.

Event-order contract: a user's events must arrive time-ordered across
batches; time-range file splits guarantee it (equal timestamps can't
straddle a split).  Within a batch the operator sorts by (ts,
event_id) — the same total order as the batch oracle.
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_es", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _stage_time_split(spark: SparkSession, events_path: str, n_files: int) -> str:
    """Write the events table as n_files time-range parquet files with
    increasing mtimes so the file source replays them in order."""
    out = tempfile.mkdtemp(prefix="gdal_spark_sessions_")
    df = spark.read.parquet(events_path).withColumn(
        "_es", F.unix_timestamp(F.col("ts").cast("timestamp"))
    )
    bounds = df.approxQuantile("_es", [i / n_files for i in range(1, n_files)], 0.001)
    lo = None
    for i in range(n_files):
        hi = bounds[i] if i < len(bounds) else None
        part = df
        if lo is not None:
            part = part.filter(F.col("_es") >= lo)
        if hi is not None:
            part = part.filter(F.col("_es") < hi)
        part = part.drop("_es")
        path = os.path.join(out, f"chunk_{i:03d}")
        part.coalesce(1).write.mode("overwrite").parquet(path)
        lo = hi
    # one flat dir of files, mtimes strictly increasing in time order
    flat = tempfile.mkdtemp(prefix="gdal_spark_sessions_flat_")
    t0 = time.time() - n_files * 10
    for i in range(n_files):
        chunk = os.path.join(out, f"chunk_{i:03d}")
        for j, fn in enumerate(sorted(os.listdir(chunk))):
            if fn.endswith(".parquet"):
                dst = os.path.join(flat, f"f{i:03d}_{j}.parquet")
                os.link(os.path.join(chunk, fn), dst)
                os.utime(dst, (t0 + i * 10, t0 + i * 10))
    return flat


def stream_sessionize(
    spark: SparkSession, events_path: str, gap_s: int = 1800, n_files: int = 3
) -> DataFrame:
    """Run incremental sessionization over ``n_files`` micro-batches;
    returns the final (user_id, n_sessions, n_events)."""
    src_dir = _stage_time_split(spark, events_path, n_files)
    schema = spark.read.parquet(events_path).schema
    name = "stream_sessions_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_ckpt_")

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.exists:
            last_es, n_sessions, n_events = state.get
        else:
            last_es, n_sessions, n_events = None, 0, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            es = (pdf["ts"].astype("int64") // 10**9).to_numpy()
            for e in es:
                if last_es is None or e - last_es > gap_s:
                    n_sessions += 1
                last_es = int(e)
                n_events += 1
        state.update((last_es, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
        )
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink holds one row per (user, batch); event
    # counts are monotone, so the final state is the max row
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max_by("n_sessions", "n_events").alias("n_sessions"),
            F.max("n_events").alias("n_events"),
        )
    )


TB_OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.LongType()),
        T.StructField("rn", T.LongType()),
        T.StructField("gap", T.LongType()),
        T.StructField("avail", T.LongType()),
        T.StructField("admit", T.LongType()),
        T.StructField("tok", T.LongType()),
    ]
)

TB_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_es", T.LongType()),
        T.StructField("tok", T.LongType()),
        T.StructField("rn", T.LongType()),
    ]
)


def stream_token_bucket(
    spark: SparkSession,
    events_path: str,
    cap: int = 90000,
    cost: int = 18000,
    n_files: int = 3,
) -> DataFrame:
    """The q470 token-bucket admission recurrence as a REAL
    Structured Streaming stateful operator: per-host state
    (last event second, residual token-seconds, row counter) carried
    across ``n_files`` time-ordered micro-batches via
    ``applyInPandasWithState`` — the second arbitrary-stateful
    streaming op after sessionize, and the one whose per-event
    DECISIONS (not just rollups) must replay exactly: every emitted
    (host, rn) row carries the admit bit and the residual bucket,
    and the drained union over batches must equal the batch
    recurrence row-for-row.  Update-mode memory sink; each event row
    is yielded exactly once by its batch, so the sink union IS the
    full decision log."""
    src_dir = _stage_time_split(spark, events_path, n_files)
    schema = spark.read.parquet(events_path).schema
    name = "stream_tb_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="gdal_spark_ckpt_")

    def fold(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (host,) = key
        if state.exists:
            last_es, tok, rn = state.get
        else:
            last_es, tok, rn = None, 0, 0
        out = {k: [] for k in ("host", "rn", "gap", "avail", "admit",
                               "tok")}
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            es = (pdf["ts"].astype("int64") // 10**9).to_numpy()
            for e in es:
                rn += 1
                if last_es is None:
                    gap, avail = 0, cap
                else:
                    gap = int(e - last_es)
                    avail = min(cap, tok + gap)
                admit = 1 if avail >= cost else 0
                tok = avail - cost * admit
                last_es = int(e)
                out["host"].append(int(host))
                out["rn"].append(rn)
                out["gap"].append(gap)
                out["avail"].append(avail)
                out["admit"].append(admit)
                out["tok"].append(tok)
        state.update((last_es, tok, rn))
        yield pd.DataFrame(out)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select((F.col("user_id") % 5).alias("host"),
                F.col("ts").cast("timestamp").alias("ts"), "event_id")
        .groupBy("host")
        .applyInPandasWithState(
            fold, TB_OUT_SCHEMA, TB_STATE_SCHEMA, "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
