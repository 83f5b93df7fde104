"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced with a count() action (no driver-side collect of
payload rows — the action measures full plan execution). A warmup run
of a trivial query absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from omicidx_gh_etl_spark.queries import REGISTRY
from omicidx_gh_etl_spark.session import get_spark

# Headline set: the reference-shaped heavy hitters + the scale-path
# training-data operators. (similarity_pairs_threshold is the n² exact
# baseline — excluded; dedup_minhash_lsh is its scale-path counterpart.)
HEADLINE = [
    "mart_denormalized",       # reference's 49.4M-row join+export analogue
    "join_fact_accession",     # bronze detail×accessions join
    "agg_multikey_pricing",    # TPC-H Q1-shape aggregation
    "dedup_latest_by_key",     # window dedup
    "explode_tokens_topk",     # unnest + top-k
    "dedup_exact",
    "dedup_minhash_lsh",       # sub-quadratic near-dup path
    "dedup_simhash",
    "similarity_topk",         # brute-force ANN baseline
    "similarity_ivf_assign",   # ANN scale path
    "similarity_ivf_search",   # full ANN search (probe + cell scan)
    "text_quality",
    "text_winnow_fingerprints",  # rolling-hash fingerprints
    "range_join_events_windows",  # bin-bucketed interval join
    "sessionize_events",
    "session_window_builtin",   # native dynamic session windows
    "sketch_heavy_hitters",     # MG candidates + exact verify
    "interval_coalesce_user_spans",  # one-shuffle span merge
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(app_name="bench")

    # Warmup: JVM + parquet reader + codegen paths.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Three iterations per query, report the warm (min) time: the first
    # run pays one-off JVM/JIT/codegen costs, and single-run timings on
    # a shared host show 2-3× jitter — min-of-3 is a stable estimator
    # of the plan's actual cost.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = q.builder(spark, sf_dir)
            df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # The reference's one concrete figure is build+EXPORT (49.4M rows →
    # zstd parquet in 6.9 s, EXPORT_DEPLOYMENT.md:247-252) — time the
    # same shape end-to-end: mart join + COPY TO parquet.
    import shutil
    import tempfile

    export_dir = tempfile.mkdtemp(prefix="bench_export_")
    try:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = REGISTRY["mart_denormalized"].builder(spark, sf_dir)
            df.write.mode("overwrite").option("compression", "zstd").parquet(
                f"{export_dir}/mart"
            )
            best = min(best, time.perf_counter() - t0)
        timings["mart_export_parquet"] = round(best, 3)
    finally:
        shutil.rmtree(export_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
