"""Mergeable-summary operators: two-pass Misra-Gries heavy hitters.

The problem at 100 TB: "which tokens/keys occur more than n/k times"
normally needs a full groupBy over every distinct key — a shuffle whose
size is the *distinct-key* cardinality (billions for web-scale token
streams). The Misra-Gries summary bounds that: each partition keeps at
most k counters, and the union of per-partition candidates provably
contains every key with global frequency > n/k (averaging argument: if
freq(x) = Σ_p freq_p(x) > Σ_p n_p / k, then freq_p(x) > n_p/k in at
least one partition, and MG(k) on that partition retains x).

Pass 1  mapInPandas MG(k) per partition   → ≤ k·P candidate keys
Pass 2  broadcast candidates, exact count → exact frequencies, filter

The output is therefore EXACT (the sketch only prunes the candidate
space), which is what makes the operator oracle-checkable:
``SELECT key, count(*) FROM t GROUP BY key HAVING count(*) > n/k``.

This is the same candidates-then-verify shape as the dedup family
(block → exact verify): approximate machinery for pruning, exact
arithmetic for the answer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, key: str | Column, k: int) -> DataFrame:
    """Exact keys with count > n/k, found without a full-cardinality
    shuffle.

    Returns ``(key, n)`` for every key whose exact global count exceeds
    ``total_rows / k``. Candidate pruning is per-partition Misra-Gries
    (≤ k counters each); the exact recount shuffles only rows matching
    a broadcast candidate set of ≤ k × num_partitions keys.
    """
    keyed = df.select(F.col(key).cast("string").alias("key"))

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        # stream arrow batches through one MG state per partition
        for pdf in batches:
            for v in pdf["key"]:
                if v is None:
                    continue
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    counters = {c: n - 1 for c, n in counters.items() if n > 1}
        yield pd.DataFrame({"key": list(counters.keys())})

    candidates = keyed.mapInPandas(mg_partition, "key string").distinct()

    # threshold as an in-plan broadcast scalar (1 row), not a separate
    # driver-side count(): saves one full scan of the input
    total = keyed.where(F.col("key").isNotNull()).agg(
        F.count("*").alias("__total")
    )
    return (
        keyed.join(F.broadcast(candidates), "key", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(total))
        .where(F.col("n") > F.col("__total") / k)
        .drop("__total")
    )
