"""Structured Streaming operators.

The reference has no true streaming (SURVEY.md §2.9) — its
"incremental" is date-partitioned batch. This module is the
beyond-parity streaming surface a continuously-ingesting deployment
needs, built the idiomatic way: ``readStream`` → event-time tumbling
windows with a watermark → sink. In production the source is a
file-drop directory or Kafka; tests drive the same query with the
parquet testdata through a memory sink via ``processAllAvailable``.

Scale notes: watermark + append output keeps state bounded (windows
close and are evicted once the watermark passes); state lives in the
checkpoint store partitioned by group key, so throughput scales with
executors exactly like a batch groupBy.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # INT64 nanos (see queries/tables.py)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_window_counts(
    spark: SparkSession,
    source_path: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming tumbling-window counts per event_type (unstarted plan).

    Returns the streaming DataFrame; callers attach a sink. Event time
    is rebuilt from the nanos column exactly like the batch loader so
    batch and streaming agree on window boundaries.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Watermarks require TIMESTAMP (instant), not NTZ — keep event time
    # LTZ internally (session pinned to UTC so wall-clock == DuckDB
    # naive) and convert the window boundary to NTZ only on output.
    # The file stream source derives basePath from the path and requires
    # a directory or glob — a concrete file path fails. Turning the file
    # path into a (still-unique) glob makes the parent the basePath.
    if source_path.endswith(".parquet"):
        source_path = source_path[:-1] + "*"
    events = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .parquet(source_path)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_streaming_window_counts(
    spark: SparkSession, source_path: str, window: str = "5 minutes"
) -> DataFrame:
    """Drive the streaming query to completion over a static source and
    return the materialized result (memory sink + processAllAvailable —
    the local smoke pattern; swap the sink for kafka/files in prod).

    Complete output mode: every window is emitted once all source data
    is processed, which on a bounded source equals the batch answer —
    asserted against the DuckDB oracle (time_bucket) in the registry.
    """
    name = f"win_{uuid.uuid4().hex[:10]}"
    q = (
        streaming_window_counts(spark, source_path, window=window)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # The memory sink's table outlives the stopped query within the
    # session (driver-memory-bound: smoke/test path only).
    return spark.table(name)


def streaming_session_counts(
    spark: SparkSession,
    source_path: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dynamic session windows per user via the native
    ``session_window`` operator (unstarted plan).

    The engine merges overlapping [event, event+gap) windows per key in
    the state store and closes a session when the watermark passes its
    end — state is bounded by OPEN sessions per key, the property that
    makes gap sessionization feasible on an unbounded stream (a
    lag/sum window-function formulation needs the whole history).
    Batch twin: queries/reshape.py::session_window_builtin (same gap
    semantics, same oracle).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if source_path.endswith(".parquet"):
        source_path = source_path[:-1] + "*"
    events = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .parquet(source_path)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window(F.col("ts"), gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
    )


def run_streaming_session_counts(
    spark: SparkSession, source_path: str, gap: str = "30 minutes"
) -> DataFrame:
    """Drive the session-window stream over a bounded source (complete
    mode + memory sink); equals the batch session_window answer."""
    name = f"sess_{uuid.uuid4().hex[:10]}"
    q = (
        streaming_session_counts(spark, source_path, gap=gap)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
