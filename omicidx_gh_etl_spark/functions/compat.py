"""Semantic-parity helpers for DuckDB↔Spark deltas (SURVEY.md §7.4).

The reference's SQL runs on DuckDB, whose semantics differ from Spark
in a few load-bearing ways:

1. **1-based array indexing** — ``channels[1]`` is the *first* channel
   (reference sqlmesh/models/geometadb/gsm.sql:16-31). Spark ``col[0]``
   is 0-based, but ``element_at(col, 1)`` is 1-based; use that.
2. **Permissive VARCHAR→TIMESTAMP casts** — DuckDB casts ISO-8601
   strings with trailing ``Z`` and milliseconds directly
   (bronze/stg_ebi_biosample.sql:15-18; golden expectation
   ``"2021-01-07T00:22:30.866Z"`` → ``2021-01-07 00:22:30.866``).
   Spark's ``to_timestamp`` handles ISO-8601 natively under a UTC
   session timezone.
3. **snake_case column normalization** — the reference lower-snake-cases
   source columns via ``re.sub(r"[^\\w\\d_]+", "_", x.lower())``
   (omicidx_etl/etl/scimago.py:24-28).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def array_get_1based(col: Column | str, index: int) -> Column:
    """1-based array element access matching DuckDB ``arr[i]``.

    ``try_element_at`` is 1-based and returns NULL for out-of-range,
    matching DuckDB list indexing. (Plain ``element_at`` THROWS
    out-of-range under Spark 4's default ANSI mode — a semantic trap on
    top of the 0-vs-1-based one.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.try_element_at(c, F.lit(index))


def iso8601_to_timestamp(col: Column | str) -> Column:
    """DuckDB-compatible ``CAST(x AS TIMESTAMP)`` for ISO-8601 strings.

    Handles ``2021-01-07T00:22:30.866Z``, offsets, and plain
    ``2001-01-09 00:00:00`` forms. Session timezone must be UTC so the
    ``Z`` suffix resolves to the same naive wall-clock as DuckDB.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c)


def iso8601_to_date(col: Column | str) -> Column:
    """DuckDB-compatible ``CAST(x AS DATE)`` for ISO-8601 strings."""
    return F.to_date(iso8601_to_timestamp(col))


_SNAKE_RE = re.compile(r"[^\w\d_]+")


def snake_case(name: str) -> str:
    """Reference column-name normalization (etl/scimago.py:24-28):
    lower, collapse non-word runs to ``_``, strip edge underscores.
    An all-symbol name must stay a usable identifier, not become ''."""
    return _SNAKE_RE.sub("_", name.lower()).strip("_") or "_"


def snake_case_columns(df: DataFrame) -> DataFrame:
    """Rename all columns to snake_case (driver-side, no shuffle)."""
    return df.withColumnsRenamed({c: snake_case(c) for c in df.columns})
