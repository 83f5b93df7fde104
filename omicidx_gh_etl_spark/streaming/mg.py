"""Streaming Misra-Gries heavy hitters: per-micro-batch MG summaries
folded into one driver-side MG(k) state, then ONE exact batch recount.

The streaming face of ``operators/sketch.py::heavy_hitters`` and the
second payoff of sketch mergeability (after the CMS in ``cms.py``):
each micro-batch reduces to its per-partition MG(k) summaries
(≤ k × partitions rows REGARDLESS of batch size), and summaries merge
with the MG merge rule into a driver state bounded by ``k`` — never by
the stream's key cardinality. By the mergeable-summaries theorem
(Agarwal et al., PODS 2012) the final state provably contains every
key whose TOTAL stream frequency exceeds N/k, so — exactly like the
batch operator — a single exact recount over the source turns the
candidate set into exact counts with zero false positives/negatives.
That two-phase shape is what keeps the streaming operator
oracle-checkable (plain ``GROUP BY … HAVING``) instead of
approximate-only.

At 100 TB-scale ingestion the driver state is ~k counters and the
per-batch driver work is one ≤ k×P-row collect + a numpy merge; the
recount is the same one-scan fused count the batch operator uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketch import _keyed, _mg_summaries, exact_recount, mg_merge
from .source import events_stream


def run_streaming_heavy_hitters(
    spark: SparkSession,
    source_path: str,
    recount_df: DataFrame,
    key_col: str = "user_id",
    k: int = 120,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive a bounded event stream to completion accumulating one
    global MG(k) summary, then return the EXACT heavy hitters
    (count > total/k) by recounting ``recount_df`` — the caller's
    batch view of the SAME source (explicit because only the caller
    knows how to batch-read it; see queries/tables.py::load_events for
    the ts-encoding branch).

    The foreachBatch collect is the batch's per-partition MG
    summaries — ≤ k × partitions rows, sketch-sized, not data-sized;
    the driver fold is :func:`operators.sketch.mg_merge` on numpy
    arrays. Output equals ``operators.sketch.heavy_hitters`` over the
    same source exactly (both are exact; pinned in tests).
    """
    import numpy as np

    events = events_stream(spark, source_path, max_files_per_trigger)
    state_keys = np.empty(0, dtype=np.int64)
    state_counts = np.empty(0, dtype=np.int64)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal state_keys, state_counts
        hashed = _keyed(batch_df, key_col).selectExpr("xxhash64(key) AS h")
        rows = _mg_summaries(hashed, k).collect()
        if rows:
            # the batch's ≤ k×P partition summaries fold in one
            # vectorized merge — MG(k) ∘ MG(k) is again MG(k)
            state_keys, state_counts = mg_merge(
                state_keys, state_counts,
                np.asarray([r["h"] for r in rows], dtype=np.int64),
                np.asarray([r["c"] for r in rows], dtype=np.int64),
                k,
            )

    q = events.writeStream.foreachBatch(fold).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    candidates = spark.createDataFrame(
        [(int(h),) for h in state_keys], "h long"
    )
    return exact_recount(_keyed(recount_df, key_col), candidates, k)
