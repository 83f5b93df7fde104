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
