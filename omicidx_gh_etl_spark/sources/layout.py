"""Physical-layout operators: bucketed tables for shuffle-free joins,
and small-file compaction.

Two 100 TB problems the reference never hits at its <100 GB envelope
(WAREHOUSE_SUMMARY.md:17-32) but a Spark deployment does:

1. **Repeated joins on the same key.** The reference's whole bronze
   layer is detail×accessions joins on `accession`
   (sqlmesh/models/bronze/stg_sra_*.sql:19-24); at 30M rows DuckDB
   hash-joins in memory, at 30B rows every Spark run pays a full
   shuffle of both sides. Hive-bucketed tables (`bucketBy` on the join
   key) persist the partitioning: every later join or groupBy on that
   key reads co-located buckets and plans NO Exchange — the shuffle is
   paid once at write time, amortized over every downstream run.

2. **Small files.** The reference writes 1M-row chunks and thousands
   of daily incremental files (sra/extract.py:49,540-627); a
   naively-partitioned Spark job multiplies that by shuffle
   partitions. Footer-heavy directories slow every scan (driver-side
   listing + per-file open). `compact` rewrites a directory to
   size-targeted files.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .writers import write_parquet


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a Hive-bucketed (and optionally sorted)
    managed table keyed for shuffle-free joins/aggregations on
    ``bucket_cols``.

    ``num_buckets`` should be sized so one bucket of the LARGEST
    co-bucketed table fits an executor's memory at target scale
    (e.g. 30B-row accessions ≈ 3 TB → ≥ 4096 buckets); all tables
    joined together must use the same count and keys.
    """
    w = df.write.format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode(mode).saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog;
    a plain path read would lose it)."""
    return spark.table(table)


def zorder_write(
    df: DataFrame,
    dest_dir: str,
    cols: list[str],
    bits: int = 12,
    compression: str = "zstd",
    num_files: int | None = None,
) -> None:
    """Write ``df`` range-partitioned and sorted by the Z-order
    (Morton) interleaving of two numeric columns — multi-column data
    clustering for parquet min/max skipping.

    Sorting by one column makes its row-group stats selective but
    scrambles every other column; interleaving the columns' bits gives
    BOTH columns locality, so predicates on either prune row groups
    (the OPTIMIZE ZORDER BY technique, with plain open-source Spark).

    Plan shape — deliberately no global window: a rank-based
    normalization (ntile over an unpartitioned window) would funnel
    every row through ONE task. Instead each column is min/max-scaled
    to ``bits`` bits (one tiny distributed agg for the bounds,
    broadcast back as literals), bits are interleaved with shift
    arithmetic (map-side), and the single shuffle is the
    repartitionByRange on the Z-value. Min/max scaling is
    skew-sensitive (a heavy hitter crowds one cell) — for heavily
    skewed columns pre-transform (log, clamp) before calling.
    """
    assert len(cols) == 2, "z-order here interleaves exactly 2 columns"
    hi = (1 << bits) - 1
    bounds = df.agg(
        *[f(c).alias(f"{n}{i}") for i, c in enumerate(cols)
          for n, f in (("mn", F.min), ("mx", F.max))]
    ).collect()[0]
    d = df
    rank_cols = []
    for i, c in enumerate(cols):
        mn, mx = float(bounds[f"mn{i}"]), float(bounds[f"mx{i}"])
        span = (mx - mn) or 1.0
        rc = f"__r{i}"
        d = d.withColumn(
            rc,
            F.least(
                F.lit(hi),
                F.floor((F.col(c) - mn) / span * (hi + 1)).cast("long"),
            ),
        )
        rank_cols.append(rc)
    z = F.lit(0)
    for b in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(F.col(rank_cols[0]), b) % 2, 2 * b)
            + F.shiftleft(F.shiftright(F.col(rank_cols[1]), b) % 2, 2 * b + 1)
        )
    d = d.withColumn("__z", z)
    # explicit file count pins the range-partition count (AQE coalesces
    # an unspecified one); default sizes from spark.sql.shuffle.partitions
    ranged = (
        d.repartitionByRange(num_files, "__z")
        if num_files
        else d.repartitionByRange("__z")
    )
    (
        ranged.sortWithinPartitions("__z")
        .drop("__z", *rank_cols)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(dest_dir)
    )


def sorted_write(
    df: DataFrame,
    dest_dir: str,
    col: str,
    num_files: int,
    compression: str = "zstd",
) -> None:
    """Range-clustered write on one column: ``repartitionByRange``
    (sampled range boundaries, balanced files) + ``sortWithinPartitions``
    + parquet. Produces files whose ``col`` min/max ranges are pairwise
    disjoint, which is what makes the footer-stats catalog
    (engine/catalog.py::scan_column_stats → prune_files) actually
    prune: a point or range predicate on ``col`` touches O(1) of the
    files instead of all of them. The single-column complement of
    :func:`zorder_write` — stronger skipping on ONE column, none on
    the others. One shuffle; the sort is partition-local."""
    (
        df.repartitionByRange(num_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(dest_dir)
    )


def compact(
    spark: SparkSession,
    src_dir: str,
    dest_dir: str,
    target_file_mb: int = 512,
    compression: str = "zstd",
) -> int:
    """Rewrite a parquet directory into ≈``target_file_mb`` files
    (the OPTIMIZE-style maintenance job for incremental sinks).

    Sizing uses the source's on-disk bytes via the file index — no
    data scan; the rewrite itself is one column-preserving pass.
    Returns the number of output files requested. Coalesce (not
    repartition) avoids a shuffle: input splits are merged, never
    moved.
    """
    df = spark.read.parquet(src_dir)
    # on-disk size from the driver-side file listing
    jpaths = spark._jvm.org.apache.hadoop.fs.Path(src_dir)
    fs = jpaths.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpaths).getLength()
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    write_parquet(df.coalesce(n_files), dest_dir, compression=compression)
    return n_files
