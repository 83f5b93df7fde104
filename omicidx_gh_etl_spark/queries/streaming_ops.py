"""Streaming query registrations.

Bounded-source streaming results equal their batch answers, so they
get full DuckDB oracles (time_bucket == Spark tumbling windows under
UTC — probed in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import run_streaming_window_counts
from .base import register


@register(
    "streaming_window_counts",
    """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           count(*) AS n,
           sum(CAST(value AS DECIMAL(18,2))) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def streaming_window_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling 5-minute windows per event_type,
    driven to completion over the bounded events source (watermark +
    event-time windows; memory sink smoke pattern)."""
    return run_streaming_window_counts(spark, f"{sf_dir}/events.parquet")
