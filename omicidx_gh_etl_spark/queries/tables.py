"""Test-table loading with cross-engine semantic normalization.

The driver hands ``queries()`` builders an arbitrary SparkSession, so
every semantic-affecting conf is pinned here on the FIRST load against
each session object (one conf round trip per session, not per table —
a session whose timezone is externally changed BETWEEN loads is out of
contract; the pin guards the driver's fresh-session case, which is the
one that occurs):

- ``spark.sql.session.timeZone=UTC`` — DuckDB timestamps are UTC-naive;
  any LTZ↔NTZ cast must happen against UTC or values shift.
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — the generator has
  shipped ``events.parquet`` with two physical ``ts`` encodings: INT64
  TIMESTAMP(NANOS) (which Spark's parquet reader rejects outright,
  [PARQUET_TYPE_ILLEGAL], unless this conf makes it arrive as raw
  nanos LongType) and plain ``timestamp[us]`` (read natively). The
  loader branches on the arrived type; any third encoding raises.
  Streaming readers share the same branch via streaming/source.py.

``load_events`` exposes:
- ``ts``    TIMESTAMP_NTZ — micros precision, == DuckDB's read of the file
  (DuckDB truncates nanos → micros on read, and ``ts div 1000`` is the
  same truncation; integer ``div``, not ``/``, because float division
  loses exactness above 2^53).
- ``ts_us`` BIGINT epoch micros — the hash-stable form, == ``epoch_us(ts)``
  in DuckDB.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Plan-ASSEMBLY cost is product cost too: profiled at sf0.1, ~50% of
# the headline wall time was driver-side DataFrame construction, not
# execution — repeated conf RPCs, schema-inference footer reads, and
# parallelism-probe footer reads on every builder call. The three
# caches below remove the repeats; every entry is keyed on the file's
# (size, mtime) state so a rewritten input invalidates naturally.

_PINNED_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def _pin_session(spark: SparkSession) -> None:
    # one conf round trip per *session object*, not per table load —
    # the first load pins a borrowed session; later loads see the same
    # Python object and skip the RPCs. nanosAsLong is pinned here too
    # (it is a reader capability, not a semantic toggle: it only
    # affects TIMESTAMP(NANOS) files, which Spark refuses to read at
    # all without it; load_events still branches on the arrived type).
    if spark not in _PINNED_SESSIONS:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _PINNED_SESSIONS.add(spark)


def _file_state(path: str) -> tuple | None:
    """(path, size, mtime) for a regular file; None when ``path`` is a
    directory/glob (those layouts are not cached — their member files
    can change without touching the path's own stat)."""
    try:
        if os.path.isfile(path):
            st = os.stat(path)
            return (path, st.st_size, st.st_mtime_ns)
    except OSError:
        pass
    return None


_SCHEMA_CACHE: dict[tuple, T.StructType] = {}
_PROBE_CACHE: dict[tuple, tuple[int, int | None]] = {}
# Loaded-DataFrame cache, per session object (weak — a dropped session
# frees its plans). DataFrames are immutable plan handles: handing the
# SAME object to every caller is safe — each downstream transformation
# builds a new plan on top — and skips the ~6 py4j calls + JVM analyze
# a fresh reader costs per load (profiled: ~15-25 ms each, ~30 loads
# across the headline set). Self-joins of one cached object are the
# same shape as today's single-load-two-branches queries, which Spark
# resolves; the full-registry parity gate would catch a regression.
_DF_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _df_cached(spark: SparkSession, key: tuple, build) -> DataFrame:
    per_session = _DF_CACHE.setdefault(spark, {})
    df = per_session.get(key)
    if df is None:
        df = build()
        if len(per_session) >= 256:
            _evict_stale(per_session)
        per_session[key] = df
    return df


def _evict_stale(per_session: dict) -> None:
    """Drop only entries whose underlying file changed (stale
    (path, size, mtime) state) — a long-lived session over live paths
    must not thrash rebuilds of still-valid plans. Cache keys embed a
    ``_file_state`` tuple as their last path-bearing element; an entry
    is stale iff that file's CURRENT state differs. If nothing is stale
    (256 genuinely-live tables), fall back to clearing: the handles
    remain valid, we only lose memoization."""
    stale = []
    for key in per_session:
        state = next(
            (p for p in key if isinstance(p, tuple) and len(p) == 3), None
        )
        if state is not None and _file_state(state[0]) != state:
            stale.append(key)
    if stale:
        for key in stale:
            del per_session[key]
    else:
        per_session.clear()


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with the inferred schema memoized per
    file state: passing an explicit schema skips the JVM-side footer
    inference that otherwise runs on EVERY DataFrame construction."""
    key = _file_state(path)
    if key is not None and key in _SCHEMA_CACHE:
        return spark.read.schema(_SCHEMA_CACHE[key]).parquet(path)
    df = spark.read.parquet(path)
    if key is not None:
        if len(_SCHEMA_CACHE) >= 1024:  # stale (path, old-mtime) entries
            _SCHEMA_CACHE.clear()       # accumulate as files are rewritten
        _SCHEMA_CACHE[key] = df.schema
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, normalizing engine-specific quirks.

    Repeated loads of the same (session, path-state) return the SAME
    DataFrame object (plan-handle cache). Constraint for callers that
    load a table twice and join the loads: refer to join columns by
    renaming/aliasing first (``df.select(F.col(k).alias(...))`` or
    ``df.alias("l")``/``.alias("r")``), never ``dfA[k] == dfB[k]`` —
    on the identical object Spark raises its ambiguous-self-join
    error. Every current double-load query renames first; keep it so.
    """
    _pin_session(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    path = f"{sf_dir}/{name}.parquet"
    state = _file_state(path)
    if state is None:  # directory/glob layouts are never cached
        return _read_parquet(spark, path)
    return _df_cached(
        spark, ("table", state), lambda: _read_parquet(spark, path)
    )


def _scan_info(path: str, cap: int) -> tuple[int, int | None]:
    """(effective scan units, total rows) for a parquet path — how many
    partitions Spark's scan will actually KEEP BUSY, from the footers.
    ``rows`` is None when the probe bailed early (enough units proven
    without reading every footer) or when any footer was unreadable
    (row count unknowable — callers must not treat it as small).

    Two ways the PLANNED partition count lies:

    - a single file is byte-range-split into ``maxPartitionBytes``
      slices, but parquet is only readable at row-group boundaries —
      a 1-row-group file yields ONE non-empty partition however many
      splits the plan shows;
    - conversely many tiny row groups don't buy parallelism either:
      Spark packs input into splits of ``max(openCostInBytes=4MB,
      bytes/cores)``, so a 4 MB file with 8 row groups still plans as
      one split.

    Per file the effective unit count is therefore
    ``min(row_groups, ceil(bytes / 4MB))``. Footer reads stop as soon
    as ``cap`` units are proven (at a real many-file layout the file
    count alone clears the bar — no footers touched). Single-file
    results are memoized per (size, mtime) state — the probe runs on
    every plan ASSEMBLY, and re-reading an unchanged footer each time
    was a measurable share of builder latency.
    """
    import glob as _glob
    import math
    import os

    import pyarrow.parquet as _pq

    state = _file_state(path)
    cache_key = (state, cap) if state is not None else None
    if cache_key is not None and cache_key in _PROBE_CACHE:
        return _PROBE_CACHE[cache_key]

    def _probe() -> tuple[int, int | None]:
        open_cost = 4 * 1024 * 1024  # spark.sql.files.openCostInBytes default
        if os.path.isdir(path):
            files = _glob.glob(
                os.path.join(path, "**", "*.parquet"), recursive=True
            )
        elif any(ch in path for ch in "*?["):
            files = _glob.glob(path)
        else:
            files = [path]
        if len(files) >= cap:
            return len(files), None
        import warnings

        import pyarrow as _pa

        units, rows = 0, 0
        failed = False
        for f in files:
            try:
                meta = _pq.ParquetFile(f).metadata
                rg = max(1, meta.num_row_groups)
                by_size = max(1, math.ceil(os.path.getsize(f) / open_cost))
                units += min(rg, by_size)
                rows += meta.num_rows
            except (OSError, _pa.ArrowException) as exc:
                # An unreadable footer must not silently deflate the
                # probe: count the file by size (what Spark's split
                # planner would do) and mark rows unknown so callers
                # don't under-spread.
                warnings.warn(f"parquet footer probe failed for {f}: {exc}")
                try:
                    units += max(1, math.ceil(os.path.getsize(f) / open_cost))
                except OSError:
                    units += 1
                failed = True
            if units >= cap:
                return units, None
        return units, None if failed else rows

    result = _probe()
    if cache_key is not None:
        if len(_PROBE_CACHE) >= 1024:  # bound stale-entry growth
            _PROBE_CACHE.clear()
        _PROBE_CACHE[cache_key] = result
    return result


def load_spread(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> DataFrame:
    """Load a table and hash-repartition it across all cores.

    For compute-heavy operators (shingling, hashing, vector math) over
    tables that arrive as a few row groups: the scan yields few
    NON-EMPTY input partitions, serializing the expensive projection.
    One cheap shuffle of the narrow input buys full-cluster
    parallelism on the hot path. On a real 100 TB layout inputs are
    already many-files/many-row-groups and this is a no-op (decided
    from file counts alone — no footer reads); keying by the row id
    keeps downstream per-id aggregations co-partitioned.

    The decision reads the parquet FOOTERS, not the planned partition
    count: Spark splits even a single-row-group file into 32 planned
    partitions of which 31 are empty, so ``rdd.getNumPartitions()``
    reports full parallelism while the map runs on one core (measured:
    2× on the minhash headline at sf0.1).

    The spread WIDTH is row-aware, not blindly all-cores: a task needs
    enough rows to amortize its scheduling cost, so width =
    clamp(rows / 256, 1, cores) (measured on the minhash headline at
    sf0.1: 5k docs over 8-16 partitions beats 32 by ~25%; at larger
    row counts the clamp saturates at all cores, and at a real
    many-file layout the probe bails before counting rows and the
    spread is skipped entirely).
    """
    state = _file_state(f"{sf_dir}/{name}.parquet")
    if state is not None:
        return _df_cached(
            spark,
            ("spread", state, key),
            lambda: _load_spread_fresh(spark, sf_dir, name, key),
        )
    return _load_spread_fresh(spark, sf_dir, name, key)


def _load_spread_fresh(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> DataFrame:
    df = load_table(spark, sf_dir, name)
    want = spark.sparkContext.defaultParallelism
    units, rows = _scan_info(f"{sf_dir}/{name}.parquet", want)
    if units >= want:
        # already parallel enough (the real many-files layout): the
        # spread would be a pure-cost extra shuffle — skip it.
        return df
    # rows is None either on early bail (handled above: units >= want)
    # or when a footer probe failed — then rows are UNKNOWN, and the
    # safe choice is full width rather than under-parallelizing.
    width = want if rows is None else max(1, min(want, rows // 256))
    if width <= units:
        # the scan already yields that much effective parallelism
        return df
    return df.repartition(width, key)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` normalized to TIMESTAMP_NTZ + ``ts_us`` BIGINT.

    The generator has shipped two physical encodings of ``ts``:
    INT64 TIMESTAMP(NANOS) (Spark reads it as raw nanos LongType under
    the legacy conf) and plain ``timestamp[us]`` (Spark reads
    TIMESTAMP_NTZ directly). Branch on the arrived type so both load
    identically; DuckDB reads either as microsecond TIMESTAMP, so
    ``ts_us == epoch_us(ts)`` in the oracle in both cases.
    """
    _pin_session(spark)  # sets nanosAsLong too (see _pin_session)
    path = f"{sf_dir}/events.parquet"
    state = _file_state(path)
    if state is not None:
        return _df_cached(
            spark, ("events", state), lambda: _load_events_fresh(spark, path)
        )
    return _load_events_fresh(spark, path)


def _load_events_fresh(spark: SparkSession, path: str) -> DataFrame:
    raw = _read_parquet(spark, path)
    if isinstance(raw.schema["ts"].dataType, T.LongType):
        return (
            raw.withColumn("ts_us", F.expr("ts div 1000"))
            .withColumn(
                "ts",
                F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"),
            )
        )
    ts_type = raw.schema["ts"].dataType
    if not isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        # a third physical encoding must fail loudly, not silently cast
        raise TypeError(f"unsupported events.ts parquet type: {ts_type}")
    return raw.withColumns(
        {
            "ts_us": F.expr("unix_micros(cast(ts as timestamp))"),
            "ts": F.col("ts").cast("timestamp_ntz"),
        }
    )
