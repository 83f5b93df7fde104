"""Shared events file-stream source with ts-encoding normalization.

The synthetic ``events.parquet`` has shipped two physical encodings of
``ts`` (see queries/tables.py::load_events):

- INT64 TIMESTAMP(NANOS): Spark's parquet reader rejects it unless
  ``spark.sql.legacy.parquet.nanosAsLong=true``, under which it arrives
  as raw nanos LongType and ``ts div 1000`` rebuilds micros;
- plain ``timestamp[us]``: arrives as TimestampType/TimestampNTZType
  directly, and ``div 1000`` would silently produce *millis*.

A file stream needs an explicit schema (no inference), so the branch
must be decided before the stream starts: probe the batch schema ONCE
(driver-side footer read, no data scan) and declare the matching
streaming schema. Every streaming operator in this package goes through
:func:`events_stream` so the two encodings cannot drift apart again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Logical (post-normalization) event columns every consumer sees:
#   event_id, user_id, event_type, value, props,
#   ts    TIMESTAMP (instant; session pinned UTC so == DuckDB naive),
#   ts_us BIGINT epoch micros (hash-stable form).
_BASE_FIELDS = [
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
]


def source_glob(source_path: str) -> str:
    """File-stream sources derive basePath from the path and require a
    directory or glob — a concrete file path fails. Turning the file
    path into a (still-unique) glob makes the parent the basePath."""
    if source_path.endswith(".parquet"):
        return source_path[:-1] + "*"
    return source_path


def _probe_ts_type(spark: SparkSession, source_path: str) -> T.DataType:
    """Read the parquet footer (batch, schema-only) to learn how ``ts``
    physically arrives under the pinned session confs.

    A not-yet-populated source directory (the canonical file-drop
    deployment starts the stream BEFORE files land) cannot be probed —
    fall back to the historical INT64-nanos encoding so the stream
    still starts; a later timestamp[us] drop into a stream declared
    long would fail the batch read loudly rather than misread."""
    try:
        return spark.read.parquet(source_path).schema["ts"].dataType
    except Exception:  # [UNABLE_TO_INFER_SCHEMA] / PATH_NOT_FOUND
        return T.LongType()


def events_stream(
    spark: SparkSession,
    source_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Normalized streaming events source (unstarted plan).

    Handles both physical ``ts`` encodings; emits the logical schema
    documented above regardless. The probe is one driver-side footer
    read before the stream starts — no extra job.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_type = _probe_ts_type(spark, source_path)
    source_path = source_glob(source_path)
    if isinstance(ts_type, T.LongType):  # INT64 nanos under legacy conf
        ts_us = F.expr("ts div 1000")  # integer div == DuckDB's nanos→us
    elif isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    else:  # a third encoding must fail loudly, not get silently cast
        raise TypeError(f"unsupported events.ts parquet type: {ts_type}")
    schema = T.StructType(
        _BASE_FIELDS[:1] + [T.StructField("ts", ts_type)] + _BASE_FIELDS[1:]
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_path).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "props",
        F.timestamp_micros(ts_us).alias("ts"),
        ts_us.alias("ts_us"),
    )
