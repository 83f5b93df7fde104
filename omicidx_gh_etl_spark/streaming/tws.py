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
from .source import events_stream

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
