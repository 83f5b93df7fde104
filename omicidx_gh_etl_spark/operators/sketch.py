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


def mg_merge(ckeys, ccounts, add_keys, add_counts, k: int):
    """One vectorized Misra-Gries MERGE step: fold an exact (or MG)
    frequency summary ``(add_keys, add_counts)`` into the running
    k-bounded summary ``(ckeys, ccounts)`` — sum counts over the union
    of keys (np.unique + np.add.at, no Python-level key loop), then if
    more than ``k`` counters remain subtract the (k+1)-th largest and
    drop non-positives. Mergeable-summaries result (Agarwal et al.,
    PODS 2012): the merge of MG(k) summaries is again MG(k) with error
    ≤ N/(k+1) over the combined stream, so every key with combined
    frequency > N/k survives. Shared by the batch operator's
    per-partition pass and the streaming per-micro-batch fold."""
    import numpy as np

    merged = np.concatenate([ckeys, add_keys])
    weights = np.concatenate([ccounts, add_counts])
    keys, inv = np.unique(merged, return_inverse=True)
    counts = np.zeros(len(keys), dtype=np.int64)
    np.add.at(counts, inv, weights)
    if len(keys) > k:
        dec = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
        keep = counts > dec
        keys, counts = keys[keep], counts[keep] - dec
    return keys, counts


def _mg_summaries(hashed: DataFrame, k: int) -> DataFrame:
    """Per-partition MG(k) summaries of an ``(h: long)`` frame —
    ≤ k rows (h, c) per partition, Arrow-batched, vectorized merge."""

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Each Arrow batch's exact value_counts() (C speed) is a
        # trivially exact frequency summary, folded in with mg_merge.
        # Per-batch work is O(d log d) in distinct-in-batch — the
        # adversarial all-distinct tail runs at numpy sort speed, not
        # dict-insert speed.
        import numpy as np

        ckeys = np.empty(0, dtype=np.int64)
        ccounts = np.empty(0, dtype=np.int64)
        for pdf in batches:
            vc = pdf["h"].value_counts()
            ckeys, ccounts = mg_merge(
                ckeys, ccounts,
                vc.index.to_numpy(np.int64), vc.to_numpy(np.int64), k,
            )
        yield pd.DataFrame({"h": ckeys, "c": ccounts})

    return hashed.mapInPandas(mg_partition, "h long, c long")


def _keyed(df: DataFrame, key: str | Column) -> DataFrame:
    if isinstance(key, str):
        keyed = df.selectExpr(f"cast(`{key}` as string) AS key")
    else:
        keyed = df.select(key.cast("string").alias("key"))
    return keyed.filter("key IS NOT NULL")


def exact_recount(keyed: DataFrame, candidates: DataFrame,
                  k: int) -> DataFrame:
    """Exact ``(key, n)`` with ``n > total/k``, given a candidate-hash
    frame ``(h: long)`` guaranteed to contain every true heavy
    hitter's ``xxhash64(key)``.

    ONE scan produces both the exact candidate counts AND the
    total-row scalar: non-candidate rows collapse into a single NULL
    catch-all group (map-side partials absorb them), then the grouped
    rows — bounded by construction at ≤ candidates + 1 — are packed
    into a single collect_list row where the grand total is one HOF
    sum computed ONCE (below the Generate, so it is not re-evaluated
    per exploded row) before unpacking. No self-join, no plan-subtree
    duplication, and no unpartitioned window (the former
    ``sum(n) OVER ()`` logged WindowExec's "No Partition Defined"
    warning, which reads as a defect; this is the same single narrow
    shuffle to one reducer an empty-frame window costs)."""
    grouped = (
        keyed.join(
            F.broadcast(candidates),
            F.expr("xxhash64(key)") == F.col("h"),
            "left",
        )
        .groupBy(F.expr("CASE WHEN h IS NOT NULL THEN key END").alias("g"))
        .agg(F.expr("count(*)").alias("n"))
    )
    packed = grouped.agg(
        F.collect_list(F.struct("g", "n")).alias("rows")
    ).selectExpr(
        "rows",
        "aggregate(rows, cast(0 as bigint), (a, r) -> a + r.n) AS __total",
    )
    return (
        packed.select(F.explode("rows").alias("r"), "__total")
        .filter(f"r.g IS NOT NULL AND r.n > __total / {int(k)}")
        .selectExpr("r.g AS key", "r.n AS n")
    )


def exact_heavy_hitters(keyed: DataFrame, k: int) -> DataFrame:
    """Plain exact plan: full ``groupBy(key)`` + broadcast grand total,
    ``n > total/k``. Two scans of the input (counts + total), one
    shuffle whose size is the FULL distinct-key cardinality — the right
    plan when that cardinality is modest (it beats the MG path's
    second scan + Python summary work), and exactly the plan the
    DuckDB oracle runs.

    Measured rejection (round 10, do not re-try blindly): deriving the
    total as ``sum(n)`` OVER THE PER-KEY COUNTS ("one scan, the total
    subtree reuses the counts exchange") depends entirely on
    ReusedExchange firing. It does on a bare-scan input — but on a
    derived input (the bench's union of a round-robin-repartitioned
    replication and a range tail) the two subtrees do not canonicalize
    equal, reuse does NOT fire, and the FULL distinct-key aggregation
    executes twice: 11.3 s vs 8.9 s at 25M rows / 20M keys. The
    separate ``count(*)`` subtree is the robust form — it prunes to a
    zero-column scan (parquet batch row counts, no key decode), so the
    "second scan" is metadata-cheap at any scale, and it can never
    degrade into a second key-wide shuffle."""
    tot = keyed.agg(F.expr("count(*)").alias("__total"))
    return (
        keyed.groupBy("key")
        .agg(F.expr("count(*)").alias("n"))
        .join(F.broadcast(tot))
        .filter(f"n > __total / {int(k)}")
        .drop("__total")
    )


def heavy_hitters(
    df: DataFrame,
    key: str | Column,
    k: int,
    engine: str = "auto",
    ndv_hint: int | None = None,
) -> DataFrame:
    """Exact keys with count > n/k, found without a full-cardinality
    shuffle.

    Returns ``(key, n)`` for every key whose exact global count exceeds
    ``total_rows / k``. Candidate pruning is per-partition Misra-Gries
    (≤ k counters each); the exact recount shuffles only rows matching
    a broadcast candidate set of ≤ k × num_partitions keys.

    ``engine`` selects the plan (both produce the identical exact
    result — MG only prunes candidates):

    - ``"mg"``    — the sketch path above. Pays a second scan + the
      per-partition summary work; wins when the distinct-key
      cardinality is far too large to shuffle/hash in full (the
      unbounded-key / web-token regime the sketch exists for).
    - ``"exact"`` — plain groupBy + broadcast total
      (:func:`exact_heavy_hitters`). Wins whenever the full key
      shuffle is affordable; at bounded key counts the MG prune saves
      nothing and its second scan is pure overhead.
    - ``"auto"``  — a planning-time stats decision, the CBO pattern:
      use ``ndv_hint`` (caller-known distinct count — catalog stats)
      if given; else bound ndv by the raw row count (a zero-column
      ``count()`` job, far cheaper than a cardinality probe) and only
      run an ``approx_count_distinct`` job when the row count alone
      cannot rule MG out. On a CLUSTER master, pick MG when the estimated
      cardinality exceeds ``16 × k × defaultParallelism`` — the
      candidate prune then shrinks the key set crossing the NETWORK
      by more than an order of magnitude, which is what MG buys. On
      a ``local[*]`` master the "shuffle" never leaves the JVM, so
      the prune saves no network and the MG pass's second scan +
      per-partition summary work is pure overhead — exact wins until
      the full key hash table itself stops fitting (≳5×10⁸ keys ×
      ~40 B/entry ≈ 20 GB), which is the only local regime where MG
      is still the answer.

    The MG pass runs over xxhash64(key) int64s, not the key strings:
    the Arrow transfer ships 8 fixed bytes/row instead of a varlen
    string, and the summary work runs on machine ints. A hash
    COLLISION can only merge two keys' counters — the merged counter
    dominates each key's true count, so every true heavy hitter still
    survives MG (recall is preserved deterministically); the collider
    becomes a false candidate that the exact keyed recount prunes. No
    false positives survive, because the final filter is on exact
    per-KEY counts.
    """
    if engine not in ("auto", "mg", "exact"):
        raise ValueError(
            f"engine must be 'auto', 'mg' or 'exact', got {engine!r}"
        )
    keyed = _keyed(df, key)
    if engine == "auto":
        sc = df.sparkSession.sparkContext
        threshold = (
            500_000_000 if sc.master.startswith("local")
            else 16 * int(k) * sc.defaultParallelism
        )
        ndv = ndv_hint
        if ndv is None:
            # Cheap upper bound before the expensive probe: ndv can
            # never exceed the row count, and a bare count() is a
            # zero-column scan (parquet batch row counts, no key
            # decode + hash like approx_count_distinct pays). Only
            # when the row count alone can't rule MG out does the
            # real cardinality estimate run.
            if df.count() <= threshold:
                ndv = 0  # <= threshold by the row-count bound
            else:
                ndv = keyed.agg(
                    F.approx_count_distinct("key").alias("d")
                ).first()["d"]
        engine = "mg" if ndv > threshold else "exact"
    if engine == "exact":
        out = exact_heavy_hitters(keyed, k)
    else:
        hashed = keyed.selectExpr("xxhash64(key) AS h")
        candidates = _mg_summaries(hashed, k).select("h").distinct()
        out = exact_recount(keyed, candidates, k)
    # surface the resolved engine for benchmarks/diagnostics (plain
    # python attribute — DataFrames allow it; never load-bearing)
    out._hh_engine = engine
    return out


def _cms_bucket(j_col: Column, key_col: Column, width: int) -> Column:
    """Row j's hash bucket for a key: md5("j:key") -> [0, width)."""
    s = F.concat(
        j_col.cast("string"), F.lit(":"), key_col.cast("string")
    )
    return (
        F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")
        % F.lit(width)
    )


def count_min_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min sketch counters (Cormode & Muthukrishnan 2005) over a
    key column → (j, bucket, c): depth independent hash rows, each key
    incrementing one of ``width`` counters per row.

    The fixed-size mergeable frequency summary: ``depth × width``
    counters total regardless of input size, counters from different
    partitions/days/sources merge by addition (it's a sum-aggregate),
    and estimates never underestimate. At 100 TB the build is one
    map-side-combinable groupBy on (j, bucket) — uniform md5 keys, no
    skew — and the finished sketch is a broadcast-size table.

    Hashes are md5-derived so an external engine (the DuckDB oracle)
    reproduces the counters EXACTLY — unlike HLL/GK, the whole sketch
    is cross-engine value-checkable, not just bound-checkable."""
    j = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    hashed = df.select(F.col(key_col), j).select(
        "j", _cms_bucket(F.col("j"), F.col(key_col), width).alias("bucket")
    )
    return hashed.groupBy("j", "bucket").agg(F.count("*").alias("c"))


def count_min_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from Count-Min counters for a set of
    query keys → (key, n_cms): min over the key's depth counters.

    Plan: the counters table is depth × width rows — broadcast it;
    per query key this is a map-side lookup + tiny grouped min, no
    shuffle of anything corpus-sized."""
    j = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j")
    qh = keys.select(F.col(key_col), j).select(
        key_col,
        "j",
        _cms_bucket(F.col("j"), F.col(key_col), width).alias("bucket"),
    )
    return (
        qh.join(F.broadcast(counters), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("n_cms"))
    )


def count_min_inner_product(
    counters_a: DataFrame, counters_b: DataFrame
) -> DataFrame:
    """Join-size estimate from two Count-Min sketches (the AMS/CM
    inner-product estimator): for each hash row j, Σ_bucket
    cA(j,b)·cB(j,b) overestimates |A ⋈ B| on the sketched key; the
    MIN over rows is the estimate, still never below the true size.

    The planner's question at 100 TB — "how big is this join?" —
    answered from two broadcast-size summaries without executing the
    join: the multiply-join runs on depth×width rows. Collision
    inflation is ≤ ||A||₁·||B||₁/width per row; size width to the
    tolerance."""
    a = counters_a.select("j", "bucket", F.col("c").alias("ca"))
    b = counters_b.select("j", "bucket", F.col("c").alias("cb"))
    per_row = (
        a.join(b, ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
    )
    return per_row.agg(F.min("ip").alias("est_join_size"))
