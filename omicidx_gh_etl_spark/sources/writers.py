"""Writers — the engine's sink surface (SURVEY.md §2.1 S4-S5, S14-S15).

Reference behaviors:

- S4  chunked zstd parquet sink, ≤1M rows/file
      (omicidx_etl/sra/extract.py:540-627, SRA_BLOCK_SIZE at :49)
- S5  gzipped NDJSON sink (sra/extract.py:527-537)
- S14 partitioned parquet export with compression / row-group controls
      (WAREHOUSE.md:311-341, EXPORT_DEPLOYMENT.md:224-237)
- S15 object-store write — same API, s3a:// path + Hadoop creds.

Scale notes: ``maxRecordsPerFile`` is the Spark-native version of the
reference's 1M-row chunking and caps file size without an extra
shuffle. ``partitionBy`` gives partition-pruned reads downstream.
Dynamic partition overwrite makes incremental re-runs of a date window
idempotent (replaces only the touched partitions) — the Spark analogue
of sqlmesh INCREMENTAL_BY_TIME_RANGE re-materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "zstd",
    max_records_per_file: int = 1_000_000,
    partition_by: list[str] | None = None,
    dynamic_partition_overwrite: bool = False,
) -> None:
    """Parquet sink with the reference's chunking/compression defaults."""
    writer = (
        df.write.mode(mode)
        .option("compression", compression)
        .option("maxRecordsPerFile", str(max_records_per_file))
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if dynamic_partition_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def write_ndjson(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str = "gzip",
) -> None:
    """NDJSON.gz sink (S5)."""
    df.write.mode(mode).option("compression", compression).json(path)
