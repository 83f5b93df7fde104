"""Shared cross-engine determinism primitives.

Small, but each pins a contract that multiple operators must agree on
EXACTLY or their DuckDB oracles silently drift:

- ``md5_bits64`` — the deterministic 60-bit hash basis every sampler
  in this repo uses instead of rand()/TABLESAMPLE (reproducible
  across runs and engines). DuckDB twin:
  ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT``.
- ``ranked_topk`` — deterministic top-k: ORDER BY rounded score
  (direction per ``ascending``), id tiebreak, dense 1-based ``rk``.
  The plan is TakeOrderedAndProject (per-partition top-k, k-row
  driver merge — never a global sort) plus a k-row window for ``rk``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["md5_bits64", "ranked_topk"]


def md5_bits64(col: Column, hex_digits: int = 15) -> Column:
    """Uniform BIGINT in [0, 16^hex_digits) from the md5 hex prefix
    (≤ 15 digits = 60 bits, safely inside a signed 64-bit long)."""
    if not 1 <= hex_digits <= 15:
        raise ValueError("hex_digits must be in 1..15")
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, hex_digits), 16, 10
    ).cast("bigint")


def ranked_topk(
    df: DataFrame,
    score_col: str,
    id_col: str,
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """Top-k rows of ``df`` by ``score_col`` (already rounded by the
    caller — rounding is each operator's determinism contract) with
    ``id_col`` ascending as tiebreak, plus a dense 1-based ``rk``."""
    from pyspark.sql import Window as W

    score = F.asc(score_col) if ascending else F.desc(score_col)
    return (
        df.orderBy(score, F.asc(id_col))
        .limit(k)
        .withColumn(
            "rk",
            F.row_number()
            .over(W.partitionBy().orderBy(score, F.asc(id_col)))
            .cast("int"),
        )
    )
