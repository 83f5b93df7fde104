"""As-of join: for each left row, the nearest right row at-or-before
(or at-or-after) its timestamp, per key.

The classic time-series operator Spark's join zoo lacks (DuckDB ships
it as ``ASOF JOIN`` — which is exactly what the oracle uses). The
reference has no time joins at all (SURVEY.md §2.3), but any
latest-metadata-version lookup ("which accession record was current
when this run was published?") is an as-of join.

Scale design — why this is NOT implemented as a range join:
a naive formulation (equi-join on key + ``r.ts <= l.ts`` + argmax per
left row) materializes every (left, earlier-right) pair before
reducing — O(n·m) per key. The union-interleave formulation here is
the canonical distributed shape:

1. tag both sides and union them (no join node at all);
2. ONE shuffle partitions by key, ONE sort orders by (ts, side);
3. a running ``last(payload, ignorenulls)`` window carries the most
   recent right payload forward into each left row — linear scan,
   whole-stage-codegen'd, zero row blowup.

Cost: one Exchange + one Sort over |L|+|R| rows, regardless of how
many right rows precede each left row. Window-function state is one
payload per partition-scan position, so memory is O(1) per task.

Determinism: right rows that tie on (key, ts) resolve to the payload
struct that compares greatest (the ORDER BY includes the payload), so
results are stable across runs and match a deterministic oracle that
dedups ties the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    right_prefix: str = "",
) -> DataFrame:
    """Left as-of join. Returns every ``left`` row plus the matched
    right-side ``payload_cols`` (null when no match), and
    ``{right_ts}`` of the match; ``right_prefix`` renames the carried
    right columns (required when the two sides share column names).

    ``direction="backward"`` matches the greatest ``right_ts`` ≤
    ``left_ts``; ``"forward"`` the smallest ``right_ts`` ≥ ``left_ts``.
    ``tolerance`` (same units as the ts columns) voids matches farther
    than that from the left timestamp.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    payload_cols = [c for c in (payload_cols or right.columns) if c not in by]
    if right_ts not in payload_cols:
        payload_cols = [right_ts, *payload_cols]

    l_tag = left.withColumn(_SIDE, F.lit(1)).withColumn(
        _PAYLOAD, F.lit(None).cast(_payload_type(right, payload_cols))
    )
    r_tag = right.select(
        *by,
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_SIDE),
        F.struct(*payload_cols).alias(_PAYLOAD),
    )
    l_tag = l_tag.withColumn("__asof_ts", F.col(left_ts))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    ts_ord: Column = F.col("__asof_ts")
    side_ord: Column = F.col(_SIDE)
    pay_ord: Column = F.col(_PAYLOAD)
    if direction == "backward":
        # right rows sort before left at equal ts → "at or before"
        order = [ts_ord.asc(), side_ord.asc(), pay_ord.asc_nulls_first()]
    else:
        # scan from the future backwards; right still first at ties
        order = [ts_ord.desc(), side_ord.asc(), pay_ord.desc_nulls_first()]
    w = (
        W.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = u.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == 1)

    if tolerance is not None:
        gap = (
            (F.col(left_ts) - F.col(f"{_PAYLOAD}.{right_ts}"))
            if direction == "backward"
            else (F.col(f"{_PAYLOAD}.{right_ts}") - F.col(left_ts))
        )
        matched = matched.withColumn(
            _PAYLOAD,
            F.when(gap <= F.lit(tolerance), F.col(_PAYLOAD)),
        )

    out_cols = [*left.columns] + [
        F.col(f"{_PAYLOAD}.{c}").alias(f"{right_prefix}{c}")
        for c in payload_cols
    ]
    return matched.select(*out_cols)


def _payload_type(right: DataFrame, payload_cols: list[str]) -> str:
    fields = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    inner = ", ".join(f"`{c}`: {fields[c]}" for c in payload_cols)
    return f"struct<{inner}>"
