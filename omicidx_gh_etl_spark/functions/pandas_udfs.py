"""Grouped Pandas-UDF surfaces: applyInPandas + GROUPED_AGG pandas_udf.

The two Arrow-batched grouped APIs the engine's UDF story needs beyond
``mapInPandas`` (sources/, multimodal) and Arrow UDTFs (functions/
udtfs.py). Both carry real per-group algorithms that Spark's built-in
expressions cannot state:

- EWMA is a per-row recursive state — no closed-form window expression
  without an O(n²) self-join (which is exactly how the DuckDB oracle
  verifies it at test scale);
- a trimmed mean needs the group's order statistics before it can
  aggregate.

Scale honesty: both shuffle on the group key and hold ONE GROUP per
Arrow batch in Python memory — correct for bounded per-key group sizes
(events per user, values per type), and the reason neither is used
where a built-in aggregate exists (tests/test_plans.py bans Python in
those hot paths).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EWMA_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def ewma_per_key(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, str] = ("ts_us", "event_id"),
    value_col: str = "value",
    decay: float = 0.5,
) -> DataFrame:
    """Per-key exponentially-weighted moving average of ``value_col``
    in event order (``adjust=True`` weighting:
    ewma_t = Σ decay^(t-i)·v_i / Σ decay^(t-i), i ≤ t).

    ``applyInPandas`` grouped-map: one shuffle on the key, then each
    group is one in-memory pandas frame — the recursive state that SQL
    windows can't express runs as a vectorized ``Series.ewm``."""

    def _ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        # pandas ewm(adjust=True, alpha=α) weights (1-α)^i — so α=1-decay
        pdf["ewma"] = (
            pdf[value_col].ewm(alpha=1.0 - decay, adjust=True).mean().round(4)
        )
        return pdf[[key_col, "event_id", *order_cols[:1], value_col, "ewma"]]

    cols = [key_col, "event_id", order_cols[0], value_col]
    return (
        df.select(*cols)
        .groupBy(key_col)
        .applyInPandas(_ewma, EWMA_SCHEMA)
    )


@F.pandas_udf("double")
def trimmed_mean_10(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: 10%-trimmed mean — drop the floor(n/10)
    smallest and largest values, average the rest (whole-group order
    statistics, not partial-aggregatable by construction)."""
    s = v.sort_values().reset_index(drop=True)
    k = len(s) // 10
    core = s.iloc[k : len(s) - k] if len(s) > 2 * k else s
    return float(core.mean())
