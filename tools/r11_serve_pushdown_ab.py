"""r11 experiment: does pushing the serve's term IN-list down to the
Parquet reader cut the postings scan?

The postings files are bucketed AND sorted by term
(``write_bucketed(sort_cols=["term", "doc_id"])``), and every file has
a Parquet column index over sorted term pages — but Spark only pushes
an IN list with <= ``spark.sql.parquet.pushdown.inFilterThreshold``
(default 10) values as a real IN filter; above that it degrades to a
``term >= min AND term <= max`` range, which prunes nothing for salted
bench terms that span the lexicographic range. The serve batches carry
200 / 2000 distinct terms, so the scan currently decodes every page of
every selected bucket and evaluates the IN in the JVM row filter.

A/B: the serve session with the threshold raised (so the IN reaches
parquet-mr and its page-level column-index pruning on the sorted term
pages) vs the default. Values must match exactly.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from omicidx_gh_etl_spark.operators.bm25_index import Bm25Index
from omicidx_gh_etl_spark.queries.llmops import _BM25_BATCH_Q
from omicidx_gh_etl_spark.queries.tables import load_table
from omicidx_gh_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("REP", "100"))
N_BUCKETS = int(os.environ.get("N_BUCKETS", "256"))


def main() -> None:
    spark = get_spark(app_name="r11-serve-pushdown")
    width = spark.sparkContext.defaultParallelism
    repx = F.explode(F.sequence(F.lit(1), F.lit(REP))).alias("__rep")
    d = load_table(spark, SF_DIR, "documents")
    d_rep = d.select("doc_id", "text", repx).select(
        (F.col("doc_id") * REP + F.col("__rep")).alias("doc_id"),
        F.expr(
            "CASE WHEN trim(text) = '' THEN '' ELSE"
            " concat(regexp_replace(trim(regexp_replace(text, ' +', ' ')),"
            " ' ', concat('_', __rep, ' ')), '_', __rep) END"
        ).alias("text"),
    ).repartition(width)
    idx = Bm25Index(spark, "pushdownab")
    t0 = time.perf_counter()
    idx.build(d_rep, "text", "doc_id", n_buckets=N_BUCKETS)
    print(f"build: {time.perf_counter() - t0:.1f}s", flush=True)

    def qbatch(n_reps):
        return spark.createDataFrame(
            [
                (r * 10 + i, f"{t}_{r}")
                for r in range(1, n_reps + 1)
                for i, t in _BM25_BATCH_Q
            ],
            "q_id int, term string",
        )

    s = idx._serve_spark()
    for label, n_reps in (("small(200q)", 10), ("big(2000q)", 100)):
        q = qbatch(n_reps)
        served = idx.serve(q, k=10)
        base = sorted(tuple(r) for r in served.collect())
        results = {}
        for thr in (10, 10000):
            s.conf.set(
                "spark.sql.parquet.pushdown.inFilterThreshold", str(thr)
            )
            got = sorted(tuple(r) for r in idx.serve(q, k=10).collect())
            print(f"{label} thr={thr}: values_match={got == base}",
                  flush=True)
            best, trace = float("inf"), []
            dfq = idx.serve(q, k=10)
            for _ in range(5):
                t0 = time.perf_counter()
                dfq.count()
                dt = time.perf_counter() - t0
                trace.append(round(dt, 3))
                best = min(best, dt)
            results[thr] = best
            print(f"{label} thr={thr}: min={best:.3f} trace={trace}",
                  flush=True)
        # decomposition: the pruned scan alone under each threshold
        terms = sorted({t for _, t in (
            (r["q_id"], r["term"]) for r in q.collect())})
        for thr in (10, 10000):
            s.conf.set(
                "spark.sql.parquet.pushdown.inFilterThreshold", str(thr)
            )
            pr = idx.pruned_postings(terms)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                pr.count()
                best = min(best, time.perf_counter() - t0)
            print(f"{label} pruned_scan thr={thr}: {best:.3f}s", flush=True)
        s.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "10")
    spark.stop()


if __name__ == "__main__":
    main()
