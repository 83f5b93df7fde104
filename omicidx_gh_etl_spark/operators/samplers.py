"""Deterministic corpus samplers.

``weighted_sample_without_replacement`` — Efraimidis–Spirakis
priority sampling (Inf. Proc. Letters 97(5), 2006): draw k items with
probability proportional to a weight column, WITHOUT replacement, in
one pass. E-S assigns each row key ``u^(1/w)`` for a uniform ``u``
and keeps the k largest. This implementation ranks on the LOG-DOMAIN
key ``ln(-ln u) − ln w`` (strictly monotone-decreasing in
``u^(1/w)``, so the k SMALLEST are the same k rows): ``-ln u`` lies
in a fixed band regardless of weight magnitude, and ``ln w`` only
SHIFTS the key, so rounding the key gives RELATIVE precision at any
weight scale. Rounding ``ln(u)/w`` directly (the naive key) at a
fixed decimal count collapses to one quantum once weights reach
~1e6 — realistic byte/token counts — silently degrading the sample
into id-ordered selection; the log-domain key does not.

Two properties matter for a training pipeline:

- **Determinism.** ``u`` derives from md5 of the row id
  (``operators/common.py::md5_bits64`` — the repo-wide reproducible
  basis; rand()/TABLESAMPLE are banned), so the sample is a pure
  function of the data: re-runnable, auditable, reproducible in any
  engine (see the ``sample_weighted_priority`` oracle). Keys are
  ROUNDED before ranking (libm ``ln`` differs in the last ulp across
  engines) and ties break on the id, making the order total.
- **Scale.** Key assignment is a map-only projection; selection is
  ``TakeOrderedAndProject`` (per-partition top-k, k-row merge on the
  driver) — no sort, no shuffle of the corpus. The one-pass
  distributed replacement for quota/reservoir samplers whose
  sequential state can't parallelize.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .common import md5_bits64, ranked_topk

__all__ = ["weighted_sample_without_replacement"]

_U_BITS = 60  # 15 md5 hex digits


def _uniform01(id_col: Column) -> Column:
    """Deterministic u ∈ (0,1): (h + 0.5) / 2^60 for the 60-bit md5
    prefix of the id — the half-offset keeps u strictly inside (0,1)
    so both ln(u) and ln(-ln(u)) are finite. DuckDB twin spelled in
    the query oracle."""
    return (md5_bits64(id_col) + F.lit(0.5)) / F.lit(float(1 << _U_BITS))


def weighted_sample_without_replacement(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    round_scale: int = 8,
) -> DataFrame:
    """The k rows of ``df`` sampled with probability ∝ ``weight_col``
    without replacement, plus their log-domain ``priority`` key
    (smaller = drawn earlier) and dense 1-based ``rk``.

    Rows with non-positive or null weight are excluded (a zero weight
    cannot be drawn; the E-S key is undefined for it). Ties on the
    rounded priority break on ``id_col`` ascending.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = F.col(weight_col).cast("double")
    u = _uniform01(F.col(id_col))
    pri = F.round(F.log(-F.log(u)) - F.log(w), round_scale).alias("priority")
    scored = df.filter(w > 0).select("*", pri)
    return ranked_topk(scored, "priority", id_col, k, ascending=True)


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    id_col: str,
    k: int,
    round_scale: int = 8,
) -> DataFrame:
    """Stratified E-S: k rows PER GROUP with probability ∝ weight
    within each group — the per-source/per-language quota shape of a
    mixture-curation pipeline (exact quotas, unlike the rate-based
    ``sample_hash_stratified``).

    Same log-domain priority as
    :func:`weighted_sample_without_replacement`; selection is a
    rank-k window per group (WindowGroupLimit pushes the cut into
    the shuffle — one exchange on the group key, per-group state of
    k rows). Groups with fewer than k positive-weight rows return
    all of them.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    from pyspark.sql import Window as W

    w = F.col(weight_col).cast("double")
    u = _uniform01(F.col(id_col))
    pri = F.round(F.log(-F.log(u)) - F.log(w), round_scale).alias("priority")
    scored = df.filter(w > 0).select("*", pri)
    win = W.partitionBy(*group_cols).orderBy(F.asc("priority"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(win).cast("int"))
        .filter(F.col("rk") <= k)
    )
