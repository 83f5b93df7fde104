"""Incremental interval planner — sqlmesh-style missing-interval
computation for INCREMENTAL_BY_TIME_RANGE models.

The reference delegates this to sqlmesh (MODEL kind + ``start
2001-01-01`` / ``cron '@daily'`` defaults in sqlmesh/config.yaml;
interval tracking described in SURVEY.md §3.3) and to ``.completed``
semaphore files in the extractors (sra/extract.py:407-458). Here:

- completed intervals are tracked in a parquet state table
  (model, interval_start, interval_end, recorded_at);
- ``missing_intervals`` computes the daily (or @monthly) gaps between
  a model's start and the requested end, minus what's recorded;
- re-running a completed interval is allowed (idempotent via dynamic
  partition overwrite) — the planner just skips it by default.

This is driver-side bookkeeping over tiny state — no Spark compute.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date, datetime, timedelta, timezone
from pathlib import Path

from pyspark.sql import SparkSession

STATE_SCHEMA = (
    "model string, interval_start date, interval_end date, recorded_at timestamp"
)


@dataclass(frozen=True)
class Interval:
    start: date  # inclusive
    end: date  # inclusive (matches BETWEEN @start_ds AND @end_ds)


def daily_intervals(start: date, end: date) -> list[Interval]:
    """One interval per day in [start, end] (cron '@daily')."""
    out = []
    d = start
    while d <= end:
        out.append(Interval(d, d))
        d += timedelta(days=1)
    return out


def monthly_intervals(start: date, end: date) -> list[Interval]:
    """Calendar-month tumbling windows clipped to [start, end]
    (the GEO extractor's monthly ranges, geo/extract.py:325-350)."""
    out = []
    d = date(start.year, start.month, 1)
    while d <= end:
        nxt = date(d.year + (d.month == 12), d.month % 12 + 1, 1)
        out.append(Interval(max(d, start), min(nxt - timedelta(days=1), end)))
        d = nxt
    return out


class IntervalStore:
    """Parquet-backed record of completed (model, interval) pairs."""

    def __init__(self, spark: SparkSession, state_root: str) -> None:
        self.spark = spark
        self.path = str(Path(state_root) / "intervals")

    def completed(self, model: str) -> set[tuple[date, date]]:
        if not Path(self.path).exists():
            return set()
        rows = (
            self.spark.read.parquet(self.path)
            .filter(f"model = '{model}'")
            .select("interval_start", "interval_end")
            .collect()
        )
        return {(r[0], r[1]) for r in rows}

    def record(self, model: str, intervals: list[Interval]) -> None:
        if not intervals:
            return
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        rows = [(model, i.start, i.end, now) for i in intervals]
        self.spark.createDataFrame(rows, STATE_SCHEMA).write.mode("append").parquet(
            self.path
        )

    def missing_intervals(
        self, model: str, start: date, end: date, cron: str = "@daily"
    ) -> list[Interval]:
        gen = daily_intervals if cron == "@daily" else monthly_intervals
        done = self.completed(model)
        return [i for i in gen(start, end) if (i.start, i.end) not in done]
