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

from .source import events_stream


def streaming_window_counts(
    spark: SparkSession,
    source_path: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming tumbling-window counts per event_type (unstarted plan).

    Returns the streaming DataFrame; callers attach a sink. Event time
    is rebuilt exactly like the batch loader (streaming/source.py) so
    batch and streaming agree on window boundaries.
    """
    # Watermarks require TIMESTAMP (instant), not NTZ — event time stays
    # LTZ internally (session pinned to UTC so wall-clock == DuckDB
    # naive) and the window boundary converts to NTZ only on output.
    events = events_stream(spark, source_path)
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
    events = events_stream(spark, source_path)
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
