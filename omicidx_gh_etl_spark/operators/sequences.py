"""Sequence operators: interval coalescing and consecutive-run
(gaps-and-islands) detection, factored for reuse.

Both are one-shuffle plans: a single hash exchange on the key columns
feeds the ordering window AND every downstream aggregate (Spark reuses
the child partitioning), so skewed keys cost sort time, not extra
exchanges. Used by the registered queries `interval_coalesce_user_spans`
and `gaps_islands_active_days`; property-tested against brute-force
Python in tests/test_audits_and_properties.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def coalesce_intervals(
    df: DataFrame, key_cols: list[str], start_col: str, end_col: str
) -> DataFrame:
    """Merge overlapping/touching-at-a-point intervals per key.

    Two intervals [s1,e1], [s2,e2] (s1 ≤ s2) merge iff s2 ≤ max running
    end — i.e. strict gaps split, shared endpoints merge. Returns one
    row per merged span: key_cols + (ms, me).
    """
    order = W.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max_e = F.max(end_col).over(order.rowsBetween(W.unboundedPreceding, -1))
    flagged = df.withColumn(
        "__is_start",
        F.when(prev_max_e.isNull() | (F.col(start_col) > prev_max_e), 1).otherwise(0),
    )
    gid = F.sum("__is_start").over(
        order.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        flagged.withColumn("__gid", gid)
        .groupBy(*key_cols, "__gid")
        .agg(F.min(start_col).alias("ms"), F.max(end_col).alias("me"))
        .drop("__gid")
    )


def consecutive_islands(
    df: DataFrame, key_cols: list[str], seq_col: str
) -> DataFrame:
    """Group DISTINCT integer sequence values into runs of consecutive
    values per key. Returns one row per island: key_cols +
    (island_start, island_len).
    """
    # one exchange total: hash-partitioning on key_cols alone satisfies
    # BOTH the (key, seq) distinct's clustering requirement and the
    # window's — without this, the distinct shuffles on (key, seq) and
    # the window immediately re-shuffles on key
    distinct = df.select(*key_cols, seq_col).repartition(*key_cols).distinct()
    rn = F.row_number().over(W.partitionBy(*key_cols).orderBy(seq_col))
    return (
        distinct.withColumn("__grp", F.col(seq_col) - rn)
        .groupBy(*key_cols, "__grp")
        .agg(
            F.min(seq_col).alias("island_start"),
            F.count("*").alias("island_len"),
        )
        .drop("__grp")
    )
