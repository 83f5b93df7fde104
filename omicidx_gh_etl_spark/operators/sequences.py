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
    keys = ", ".join(f"`{c}`" for c in key_cols)
    over = f"PARTITION BY {keys} ORDER BY `{start_col}`, `{end_col}`"
    prev = (
        f"max(`{end_col}`) OVER ({over} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
    )
    # Both windows share one partition/order spec, so the second
    # Window reuses the first's sort — same plan the Column form made.
    return (
        df.selectExpr(
            "*",
            f"CASE WHEN {prev} IS NULL OR `{start_col}` > {prev} "
            "THEN 1 ELSE 0 END AS __is_start",
        )
        .selectExpr(
            "*",
            f"sum(__is_start) OVER ({over} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __gid",
        )
        .groupBy(*key_cols, "__gid")
        .agg(
            F.expr(f"min(`{start_col}`)").alias("ms"),
            F.expr(f"max(`{end_col}`)").alias("me"),
        )
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
