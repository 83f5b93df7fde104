"""Deterministic corpus samplers.

``weighted_sample_without_replacement`` — Efraimidis–Spirakis
priority sampling (Inf. Proc. Letters 97(5), 2006): draw k items with
probability proportional to a weight column, WITHOUT replacement, in
one pass. Each row gets key ``u^(1/w)`` (equivalently ``ln(u)/w``,
monotone-identical) for a uniform ``u``; the k largest keys are
exactly a weighted sample without replacement.

Two properties matter for a training pipeline:

- **Determinism.** ``u`` derives from md5 of the row id (same basis
  as every sampler in this repo — rand()/TABLESAMPLE are
  non-reproducible across runs/engines and therefore banned), so the
  sample is a pure function of the data: re-runnable, auditable, and
  reproducible in any engine (see the ``sample_weighted_priority``
  oracle). Keys are ROUNDED before ranking: libm ``ln`` differs in
  the last ulp across engines, and an id tiebreak makes the rounded
  ordering total.
- **Scale.** Key assignment is a map-only projection; selection is
  ``TakeOrderedAndProject`` (per-partition top-k, k-row merge on the
  driver) — no sort, no shuffle of the corpus. This is the
  one-pass distributed replacement for quota/reservoir samplers
  whose sequential state can't parallelize.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["weighted_sample_without_replacement"]

# 15 md5 hex digits = 60 uniformly-distributed bits
_U_BITS = 60


def _uniform01(id_col: Column) -> Column:
    """Deterministic u ∈ (0,1): (h + 0.5) / 2^60 for the 60-bit md5
    prefix of the id — half-offset keeps u strictly inside (0,1) so
    ln(u) is finite. DuckDB twin spelled in the query oracle."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return (h + F.lit(0.5)) / F.lit(float(1 << _U_BITS))


def weighted_sample_without_replacement(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    round_scale: int = 8,
) -> DataFrame:
    """The k rows of ``df`` sampled with probability ∝ ``weight_col``
    without replacement, plus their ``priority`` key and ``rk``.

    Rows with non-positive or null weight are excluded (a zero weight
    cannot be drawn; E-S keys are undefined for it). Ties on the
    rounded priority break on ``id_col`` ascending.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    pri = F.round(
        F.log(_uniform01(F.col(id_col))) / w, round_scale
    ).alias("priority")
    scored = df.filter(w > 0).select("*", pri)
    top = scored.orderBy(F.desc("priority"), F.asc(id_col)).limit(k)
    from pyspark.sql import Window as W

    return top.withColumn(
        "rk",
        F.row_number()
        .over(W.partitionBy().orderBy(F.desc("priority"), F.asc(id_col)))
        .cast("int"),
    )
