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

def ewma_per_key(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts_us", "event_id"),
    value_col: str = "value",
    decay: float = 0.5,
) -> DataFrame:
    """Per-key exponentially-weighted moving average of ``value_col``
    in ``order_cols`` order (``adjust=True`` weighting:
    ewma_t = Σ decay^(t-i)·v_i / Σ decay^(t-i), i ≤ t).

    ``applyInPandas`` grouped-map: one shuffle on the key, then each
    group is one in-memory pandas frame — the recursive state that SQL
    windows can't express runs as a vectorized ``Series.ewm``.

    Output: (key, *order_cols, value_col, ewma) — the schema is
    derived from the input's actual types, so any key/order/value
    column choice works."""
    if not 0.0 < decay < 1.0:
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    cols = [key_col, *order_cols, value_col]
    narrow = df.select(*cols)
    schema = T.StructType(
        [narrow.schema[c] for c in cols]
        + [T.StructField("ewma", T.DoubleType())]
    )

    def _ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(list(order_cols), kind="mergesort")
        # pandas ewm(adjust=True, alpha=α) weights (1-α)^i — so α=1-decay
        pdf["ewma"] = (
            pdf[value_col].ewm(alpha=1.0 - decay, adjust=True).mean().round(4)
        )
        return pdf[cols + ["ewma"]]

    return narrow.groupBy(key_col).applyInPandas(_ewma, schema)


@F.pandas_udf("double")
def trimmed_mean_10(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF: 10%-trimmed mean — drop the floor(n/10)
    smallest and largest values, average the rest (whole-group order
    statistics, not partial-aggregatable by construction)."""
    s = v.sort_values().reset_index(drop=True)
    k = len(s) // 10
    core = s.iloc[k : len(s) - k] if len(s) > 2 * k else s
    return float(core.mean())
