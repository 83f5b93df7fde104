"""Contiguous global row numbering at scale.

``row_number() OVER (ORDER BY …)`` with no PARTITION BY is the classic
scale trap: Spark plans it as a single-partition window, so the entire
dataset funnels through ONE task — the job that works at 1 GB and
never finishes at 100 TB. ``monotonically_increasing_id`` distributes
but is non-contiguous (it gaps by 2^33 between partitions).

``assign_contiguous_ids`` produces exactly the dense 1..N numbering of
the total order, distributed:

1. ``repartitionByRange(order_cols)`` + ``sortWithinPartitions`` —
   the ONE data-proportional shuffle; partition p holds a contiguous
   key range, sorted.
2. Per-partition row counts via a map-side ``groupBy(partition id)``
   (one row per task reaches the driver) → prefix-sum offsets — a
   driver-side loop over num_partitions integers, not data.
3. ``monotonically_increasing_id`` INSIDE the sorted partitions
   decomposes as ``pid·2^33 + local_index``; the dense id is
   ``offset[pid] + local_index + start``.

The input is persisted (MEMORY_AND_DISK) before step 2 because the
range partitioner SAMPLES its boundaries — two independent jobs over
the same plan may cut different ranges, and offsets computed against
one partitioning applied to another would silently corrupt every id.
The persisted partitioning is shared by both passes. Callers must
materialize (write/checkpoint) the result before releasing the input
via :func:`release`; on executor loss a MEMORY_AND_DISK block can be
recomputed, so production write-outs should land the result in one
job (exactly what ``sources/writers.py`` sinks do).

``order_cols`` must be a UNIQUE total order (add a tiebreak column if
needed): range boundaries may split equal keys across partitions, and
only uniqueness makes the numbering independent of where the cut
lands.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["assign_contiguous_ids", "release"]

_MONO_BITS = 33  # monotonically_increasing_id: pid << 33 | local index


def assign_contiguous_ids(
    df: DataFrame,
    order_cols: list[str],
    id_name: str = "global_id",
    num_partitions: int | None = None,
    start: int = 1,
) -> DataFrame:
    """``df`` + ``id_name`` column = dense ``start..start+N-1`` ids in
    ``ORDER BY order_cols`` order. See module docstring for the plan.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    if id_name in df.columns:
        raise ValueError(f"column {id_name!r} already exists")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    r = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        row["pid"]: row["cnt"]
        for row in r.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in range(max(counts, default=-1) + 1):
        offsets.append(acc)
        acc += counts.get(pid, 0)
    if not offsets:
        # empty input: array() with zero entries is array<void> and
        # cannot be indexed — a typed placeholder keeps the (empty)
        # result schema identical to the non-empty case
        offsets = [0]
    # Offsets as a literal ARRAY indexed by the dense pid (0..P-1):
    # element_at is an O(1) GetArrayItem in codegen. A create_map
    # literal here would be the linear-scan trap (Spark's GetMapValue
    # walks the entries) — O(rows × partitions) at the 10⁴–10⁵
    # partition counts this operator targets; see the same lesson in
    # blooms.py's bitmap assembly.
    off_arr = F.array(*[F.lit(off).cast("long") for off in offsets])
    mono = F.monotonically_increasing_id()
    out = r.withColumn("__mono", mono).select(
        "*",
        (
            F.element_at(
                off_arr, F.shiftright(F.col("__mono"), _MONO_BITS).cast("int") + 1
            )
            + F.col("__mono").bitwiseAND(F.lit((1 << _MONO_BITS) - 1))
            + F.lit(start)
        ).alias(id_name),
    ).drop("__mono")
    out._contiguous_ids_input = r  # for release(); see below
    return out


def release(ids_df: DataFrame) -> None:
    """Unpersist the cached input under an ``assign_contiguous_ids``
    result — call AFTER the result is materialized (written,
    checkpointed, or collected); before that, dropping the cache
    would let the range partitioner resample on recompute and
    corrupt the numbering.

    Must be handed the EXACT DataFrame ``assign_contiguous_ids``
    returned — the handle rides on that object, so a derived frame
    (``.select()``/``.filter()`` result) can't release it. A miss
    warns instead of silently leaking the persisted blocks.
    """
    src = getattr(ids_df, "_contiguous_ids_input", None)
    if src is not None:
        src.unpersist()
    else:
        import warnings

        warnings.warn(
            "release() got a DataFrame without a persisted-input handle "
            "— pass the exact assign_contiguous_ids() result, or the "
            "cached input stays pinned on the executors",
            stacklevel=2,
        )
