"""Stream-stream event-time join (click → purchase attribution).

Two live streams joined on key + an event-time range — the canonical
Structured Streaming interval join. The reference joins only static
tables (SURVEY.md §2.3); this is the streaming-native counterpart a
continuously-ingesting deployment needs (e.g. linking a metadata
update stream to a publication stream within a freshness horizon).

Scale design — what makes this shape survive unbounded input:
- **Both sides carry watermarks** and the join condition bounds the
  match window (`purchase_ts ∈ [click_ts, click_ts + horizon]`), so
  the engine derives a state-eviction bound per side: click state
  older than `watermark − horizon` and purchase state older than the
  watermark are dropped. Without the range condition the join would
  buffer both streams forever.
- State is shuffled by the join key (user_id) once per side; matching
  is local to each key's state partition thereafter — identical
  scaling to a batch shuffled hash join, plus O(horizon × rate) state.
- Inner joins emit eagerly on match (no watermark latency on output);
  the watermark only gates state cleanup, so a bounded source drained
  with ``processAllAvailable`` emits exactly the batch-join answer —
  which is what the DuckDB oracle checks.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .source import events_stream


def _typed_stream(
    spark: SparkSession, source_path: str, event_type: str, prefix: str
) -> DataFrame:
    """One watermark-ready stream of a single event_type, columns
    prefixed so the self-join is unambiguous."""
    return (
        events_stream(spark, source_path)
        .filter(F.col("event_type") == event_type)
        .select(
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("value").alias(f"{prefix}_value"),
            F.col("ts").alias(f"{prefix}_ts"),
        )
    )


def attribution_join_stream(
    spark: SparkSession,
    source_path: str,
    horizon_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Unstarted plan: clicks ⋈ purchases by user within the horizon."""
    clicks = _typed_stream(spark, source_path, "click", "click").withWatermark(
        "click_ts", watermark
    )
    purchases = _typed_stream(
        spark, source_path, "purchase", "purchase"
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return clicks.join(purchases, cond, "inner").select(
        "click_id",
        "purchase_id",
        F.col("click_user").alias("user_id"),
        F.unix_micros("click_ts").alias("click_ts_us"),
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        F.round("purchase_value", 4).alias("purchase_value"),
    )


def run_attribution_join_stream(
    spark: SparkSession,
    source_path: str,
    horizon_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drive the join over a bounded source; return all matched pairs
    (memory sink + processAllAvailable)."""
    name = f"attr_{uuid.uuid4().hex[:10]}"
    df = attribution_join_stream(
        spark, source_path, horizon_minutes=horizon_minutes, watermark=watermark
    )
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def run_stream_static_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Stream-static join driven over the bounded events source:
    streaming facts enriched against a STATIC dimension (customer),
    aggregated per segment.

    The static side is a plain batch DataFrame inside a streaming
    plan — Spark broadcasts it per micro-batch with no state at all
    (nothing to watermark: the dimension is re-resolved each trigger,
    so dimension updates between batches are picked up for free).
    This is the cheapest streaming join shape and the right one
    whenever one side is a slowly-changing lookup table — reach for
    stream-stream state only when BOTH sides are unbounded.
    """
    events = events_stream(spark, f"{sf_dir}/events.parquet")
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    joined = events.join(
        customers, events["user_id"] == customers["c_custkey"], "inner"
    )
    agg = joined.groupBy("c_mktsegment").agg(F.count("*").alias("n"))
    name = f"ss_{uuid.uuid4().hex[:10]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
