"""Skew-mitigation operators: salted equi-join and two-stage salted
aggregation.

The reference delegates all join/agg planning to DuckDB (SURVEY.md §4)
and its accession keys are near-unique, but at 100 TB the interesting
keys ARE skewed (one organism, one mega-study, one hot user). Spark's
AQE skew-join handles the sort-merge-join case at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py); the two
cases AQE does NOT fix are

1. a skewed *aggregation* key — one reducer gets the hot group's
   entire input; and
2. a skewed join where the hot key's build side is too big to
   broadcast and AQE's partition-splitting is defeated (e.g. a single
   key larger than every split threshold).

Both have the classic salting answer, expressed here as plain
DataFrame compositions so Catalyst still sees ordinary equi-joins and
hash aggregates:

- ``salted_join``: fact rows get a content-derived salt in [0, n);
  the (small-ish but not broadcastable) other side is replicated n
  ways; join on (key, salt). Hot-key work is spread over n reducers
  at the cost of replicating the other side n×.
- ``two_stage_agg``: groupBy(key, salt) partial → groupBy(key) final.
  The hot key's input splits across n partial groups; the second
  stage merges n rows per key, not billions.

Salts are ``xxhash64`` of row content — deterministic under task
retry (``rand()`` is not, and nondeterministic shuffle keys can lose
or duplicate rows when a stage retries: the classic repartition(rand)
correctness bug).

Results are bit-identical to the unsalted formulation; the registered
queries' oracles are the PLAIN join / GROUP BY, which is the point —
salting must never change semantics, only the shuffle layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _salt_expr(df: DataFrame, n: int) -> Column:
    # xxhash64 over all columns: deterministic per row content, cheap,
    # and uniform. Collisions across identical rows are fine — they
    # only co-locate identical work.
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n)).cast("int")


def salted_join(
    fact: DataFrame,
    other: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and ``other`` replicated
    ``salt_buckets`` ways, spreading a hot join key over that many
    reducers.

    Output columns = fact columns + other's non-key columns (the usual
    ``join(on=[...])`` shape). Use when the hot key's matching rows on
    ``other`` are too many to broadcast and AQE cannot split the
    stragglers; otherwise prefer plain join + AQE.
    """
    salted_fact = fact.withColumn(SALT, _salt_expr(fact, salt_buckets))
    replicated = other.withColumn(
        SALT,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    return salted_fact.join(replicated, [*on, SALT], how).drop(SALT)


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe aggregation: groupBy(keys + salt) partial, then
    groupBy(keys) final merge.

    ``aggs`` maps output column → (input column, fn) with fn in
    {count, sum, min, max} (the decomposable aggregates; avg = sum +
    count composed by the caller). Spark's own partial aggregation
    already does map-side combine, but every partial for one key still
    lands on ONE reducer — the salt stage caps any reducer's input at
    |hot key| / salt_buckets.
    """
    first: list[Column] = []
    final: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            # col "*" → COUNT(*) (rows); a named col → COUNT(col)
            # (non-null) — callers matching a SQL count(*) oracle must
            # use "*" or nulls silently diverge.
            expr = F.lit(1) if col == "*" else F.col(col)
            first.append(F.count(expr).alias(out))
            final.append(F.sum(out).cast("long").alias(out))
        elif fn == "sum":
            first.append(F.sum(col).alias(out))
            final.append(F.sum(out).alias(out))
        elif fn == "min":
            first.append(F.min(col).alias(out))
            final.append(F.min(out).alias(out))
        elif fn == "max":
            first.append(F.max(col).alias(out))
            final.append(F.max(out).alias(out))
        else:  # pragma: no cover - guarded by tests
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salted = df.withColumn(SALT, _salt_expr(df, salt_buckets))
    partial = salted.groupBy(*keys, SALT).agg(*first)
    return partial.groupBy(*keys).agg(*final)
