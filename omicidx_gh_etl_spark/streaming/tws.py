"""Session-gap aggregation on Spark 4's ``transformWithStateInPandas``.

Same operator semantics as ``stateful.sessionize_stream``
(applyInPandasWithState), re-expressed on the newer arbitrary-state
API (SPARK-49564, GA in Spark 4.x). The reference has no streaming
(SURVEY.md §2.5/§2.9); this exists because transformWithState is the
forward path for custom stateful operators and differs from the old
API in ways that matter at scale:

- **Typed state variables** (`getValueState`/`getListState`/
  `getMapState`) instead of one opaque tuple — state schema is
  engine-visible, enabling RocksDB range scans, per-variable TTL and
  state schema evolution.
- **First-class timers**: `registerTimer`/`deleteTimer` decoupled from
  state updates (the old API's single `setTimeoutTimestamp` is one
  implicit timer per key).
- **RocksDB state store required** — state lives off-heap, so open
  sessions scale to the store's disk, not executor heap.

**Environment gate**: the transformWithState Python worker talks to
the JVM state server over protobuf; environments without the
``protobuf`` package (like this test container) cannot run it. The
operator detects that at call time (``PROTOBUF_AVAILABLE``) and raises
``NotImplementedError`` with the reason; tests skip on the same flag.
The applyInPandasWithState twin (``stateful.py``) covers the runtime
semantics either way, and the two share their input plan, output
schema and state layout.

Scale shape is identical to the old-API operator: each micro-batch
shuffles only that batch's rows to their key's state partition; state
never moves; watermark-driven timers bound state to O(open sessions).
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .stateful import SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA
from .source import events_stream, source_glob

_OUT_COLS = [
    "user_id",
    "session_start_us",
    "session_end_us",
    "n_events",
    "total_value",
]

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

try:  # the tws state-server protocol needs protobuf
    from google.protobuf import descriptor as _descriptor  # noqa: F401

    PROTOBUF_AVAILABLE = True
except ImportError:
    PROTOBUF_AVAILABLE = False


class SessionizeProcessor(StatefulProcessor):
    """Per-user gap sessionizer: emit a session when a later event
    arrives past the gap, or when the event-time watermark passes
    session_end + gap (timer path)."""

    def __init__(self, gap_us: int, use_timers: bool) -> None:
        self._gap_us = gap_us
        self._use_timers = use_timers

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("session", SESSION_STATE_SCHEMA)

    def _expiry_ms(self, last_us: int) -> int:
        return (last_us + self._gap_us) // 1000 + 1

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        (user_id,) = key
        prev = self._state.get()
        if prev is not None:
            start, last, n, total = prev
        else:
            start = last = None
            n, total = 0, 0.0
        prev_last = last

        closed: list[tuple] = []
        # concat + ONE sort per key: the micro-batch arrives as
        # multiple Arrow chunks in arbitrary order — a per-chunk sort
        # would walk events out of time order (see stateful.py twin).
        batch = pd.concat(list(rows), ignore_index=True)
        if len(batch):
            pdf = batch.sort_values(["ts_us", "event_id"])
            for ts, v in zip(pdf["ts_us"].to_numpy(), pdf["value"].to_numpy()):
                ts = int(ts)
                if last is not None and ts - last > self._gap_us:
                    closed.append((user_id, start, last, n, total))
                    start, n, total = ts, 0, 0.0
                if start is None:
                    start = ts
                last = ts
                n += 1
                total += float(v)

        self._state.update((start, last, n, total))
        if self._use_timers and last != prev_last:
            if prev_last is not None:
                self._handle.deleteTimer(self._expiry_ms(prev_last))
            self._handle.registerTimer(self._expiry_ms(last))
        if closed:
            yield pd.DataFrame(closed, columns=_OUT_COLS)

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ):
        s = self._state.get()
        if s is not None:
            start, last, n, total = s
            # a stale timer (session extended meanwhile) never reaches
            # here — extension deletes it — but guard anyway
            if expiredTimerInfo.getExpiryTimeInMs() >= self._expiry_ms(last):
                self._state.clear()
                yield pd.DataFrame(
                    [(key[0], start, last, n, total)], columns=_OUT_COLS
                )

    def close(self) -> None:
        pass


def sessionize_stream_tws(
    spark: SparkSession,
    source_path: str,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
    timers: bool = True,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Unstarted transformWithStateInPandas sessionization plan.

    ``timers=False`` runs in ``timeMode="none"`` (sessions close only
    via a later event) — the deterministic bounded-source mode the
    oracle comparison uses; ``timers=True`` uses event-time timers for
    watermark eviction."""
    if not PROTOBUF_AVAILABLE:
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(its Python<->state-server protocol); not installed here. "
            "Use streaming.sessionize_stream (applyInPandasWithState) "
            "for the same semantics."
        )
    events = (
        events_stream(spark, source_path, max_files_per_trigger)
        .select("user_id", "event_id", "value", "ts_us", "ts")
        .withWatermark("ts", watermark)
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        SessionizeProcessor(gap_minutes * 60 * 1_000_000, timers),
        SESSION_OUT_SCHEMA,
        "append",
        "eventTime" if timers else "none",
    )


class _ReplayValueState:
    """Key-scoped ValueState view over the replay server's dict —
    the same get/update/clear surface the real state server exposes,
    scoped to the server's current grouping key (exactly how the
    engine scopes the handle implicitly per key)."""

    def __init__(self, server: "_ReplayStateServer") -> None:
        self._server = server

    def exists(self) -> bool:
        return self._server.state.get(self._server.current_key) is not None

    def get(self):
        return self._server.state.get(self._server.current_key)

    def update(self, v) -> None:
        self._server.state[self._server.current_key] = tuple(v)

    def clear(self) -> None:
        self._server.state.pop(self._server.current_key, None)


class _ReplayStateServer:
    """Single-process stand-in for the transformWithState state server
    (the JVM side the protobuf protocol talks to): per-key value
    state + per-key timer registry, with the handle surface
    (getValueState/registerTimer/deleteTimer) the processor calls."""

    def __init__(self) -> None:
        self.state: dict = {}
        self.timers: dict[tuple, set[int]] = {}
        self.current_key: tuple | None = None

    def getValueState(self, name, schema, ttlDurationMs=None):
        return _ReplayValueState(self)

    def registerTimer(self, ms: int) -> None:
        self.timers.setdefault(self.current_key, set()).add(int(ms))

    def deleteTimer(self, ms: int) -> None:
        self.timers.get(self.current_key, set()).discard(int(ms))

    def expired(self, wm_ms: int) -> list[tuple[tuple, int]]:
        out = []
        for key in sorted(self.timers):
            for ms in sorted(self.timers[key]):
                if ms <= wm_ms:
                    out.append((key, ms))
        return out


_WM_UNITS_US = {
    "microsecond": 1, "millisecond": 1_000, "second": 1_000_000,
    "minute": 60_000_000, "hour": 3_600_000_000, "day": 86_400_000_000,
}


def _watermark_us(delay: str) -> int:
    n, unit = delay.strip().split()
    return int(n) * _WM_UNITS_US[unit.rstrip("s")]


def replay_sessionize_tws(
    spark: SparkSession,
    source_path: str,
    gap_minutes: int = 30,
    timers: bool = False,
    watermark: str = "3650 days",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive the REAL ``SessionizeProcessor`` over a bounded source
    through a single-process replay of the transformWithState runtime
    contract — micro-batch sequencing (files ordered by mtime, split
    by ``max_files_per_trigger`` like the file source), per-key state
    scoping, watermark advancement (batch N's watermark derives from
    batches < N, one trailing no-data batch fires remaining timers —
    the engine's batch-execution rule), and timer expiry →
    ``handleExpiredTimer`` → eviction.

    This is the protobuf-less e2e path: the processor code under test
    is byte-for-byte the one ``sessionize_stream_tws`` ships to the
    engine; only the state-server transport is substituted
    (``_ReplayStateServer``). The equivalence pytest pins its output
    against the applyInPandasWithState twin AND the batch window
    formulation, timers on and off, single- and multi-batch."""
    import glob as _glob
    import os as _os

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    pattern = source_glob(source_path)
    if _os.path.isdir(pattern):
        pattern = f"{pattern}/*.parquet"
    files = sorted(_glob.glob(pattern), key=lambda p: _os.stat(p).st_mtime)
    per = max_files_per_trigger or len(files)
    batches = [files[i : i + per] for i in range(0, len(files), per)]

    proc = SessionizeProcessor(gap_minutes * 60 * 1_000_000, timers)
    server = _ReplayStateServer()
    proc.init(server)
    delay_us = _watermark_us(watermark)
    wm_us = None  # no watermark until data has been seen
    max_ts = None
    emitted: list[pd.DataFrame] = []

    def _fire(wm: int | None) -> None:
        if not timers or wm is None:
            return
        for key, ms in server.expired(wm // 1000):
            server.current_key = key
            server.deleteTimer(ms)
            emitted.extend(
                proc.handleExpiredTimer(key, None, _ReplayExpiredTimer(ms))
            )

    for batch_files in batches + [[]]:  # trailing no-data batch
        if batch_files:
            pdf = (
                _read_events_batch(spark, batch_files)
                .select("user_id", "event_id", "value", "ts_us")
                .toPandas()
            )
            if wm_us is not None:  # engine drops late rows pre-operator
                pdf = pdf[pdf["ts_us"] >= wm_us]
            for key, rows in sorted(pdf.groupby("user_id")):
                server.current_key = (key,)
                emitted.extend(
                    proc.handleInputRows((key,), iter([rows]), None)
                )
            if len(pdf):
                m = int(pdf["ts_us"].max())
                max_ts = m if max_ts is None else max(max_ts, m)
        _fire(wm_us)
        if max_ts is not None:
            wm_us = max_ts - delay_us  # next batch's watermark
    _fire(wm_us)  # timers unlocked by the final watermark advance

    out = (
        pd.concat(emitted, ignore_index=True)
        if emitted
        else pd.DataFrame(columns=_OUT_COLS)
    )
    return spark.createDataFrame(out, SESSION_OUT_SCHEMA)


class _ReplayExpiredTimer:
    def __init__(self, ms: int) -> None:
        self._ms = ms

    def getExpiryTimeInMs(self) -> int:
        return self._ms


def _read_events_batch(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Batch read of specific event files with the SAME ts
    normalization ``events_stream`` declares (both physical
    encodings)."""
    from pyspark.sql import types as T

    df = spark.read.parquet(*paths)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        ts_us = F.expr("ts div 1000")
    elif isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    else:
        raise TypeError(f"unsupported events.ts parquet type: {ts_type}")
    return df.select(
        "event_id", "user_id", "value", ts_us.alias("ts_us")
    )


def run_sessionize_stream_tws(
    spark: SparkSession,
    source_path: str,
    gap_minutes: int = 30,
    timers: bool = False,
    watermark: str = "3650 days",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive the transformWithState query over a bounded source and
    return closed sessions (memory sink + processAllAvailable).

    transformWithState requires the RocksDB state store provider; it
    is set on the session for the query's lifetime and restored after
    (other queries are provider-agnostic)."""
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    name = f"tws_{uuid.uuid4().hex[:10]}"
    try:
        q = (
            sessionize_stream_tws(
                spark,
                source_path,
                gap_minutes=gap_minutes,
                watermark=watermark,
                timers=timers,
                max_files_per_trigger=max_files_per_trigger,
            )
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    return spark.table(name)
