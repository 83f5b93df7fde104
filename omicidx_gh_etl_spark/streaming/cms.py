"""Streaming Count-Min sketch: per-micro-batch counters merged by
addition in ``foreachBatch``.

The streaming face of ``operators/sketch.py::count_min_build`` and the
payoff of sketch mergeability: each micro-batch reduces to a
depth×width counter table (broadcast-sized REGARDLESS of batch size),
and batches combine by plain addition — so the driver-side merge state
is bounded by the sketch dimensions, never by the stream. This is the
standard shape for streaming frequency monitoring (per-key rates,
hot-key detection) where exact per-key state would grow with the key
space.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketch import count_min_build
from .source import events_stream


def run_streaming_count_min(
    spark: SparkSession,
    source_path: str,
    key_col: str = "user_id",
    depth: int = 4,
    width: int = 256,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive a bounded stream to completion, building the CMS
    incrementally: every micro-batch contributes its own counters
    (one map-side-combinable groupBy per batch), merged by ``+=`` into
    the running sketch. The collect is ≤ depth×width rows per batch —
    sketch-sized, not data-sized.

    Returns the merged counters as a (j, bucket, c) DataFrame — by
    CMS mergeability exactly equal to a batch build over the whole
    source (pinned in tests/test_scoring.py and by the shared oracle
    of ``sketch_count_min`` / ``streaming_count_min``)."""
    events = events_stream(spark, source_path, max_files_per_trigger)
    counters: dict[tuple[int, int], int] = defaultdict(int)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        for r in count_min_build(batch_df, key_col, depth, width).collect():
            counters[(r["j"], r["bucket"])] += r["c"]

    q = events.writeStream.foreachBatch(merge).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.createDataFrame(
        [(j, b, c) for (j, b), c in sorted(counters.items())],
        "j int, bucket bigint, c bigint",
    )
