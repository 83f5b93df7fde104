"""r11 experiment: bm25 serve tail — can the two q_id-keyed exchanges
become one (repartition('q_id') below the score agg: hashpartitioning
on q_id satisfies ClusteredDistribution for BOTH the (q_id, doc) agg
and the q_id rank window)? And does 1024 buckets help the big batch?

Replicates the bench row shape (_bm25_index_scale_row): 2M salted docs,
N_BUCKETS buckets, 200-pair small batch / 10x big batch. Variants are
INTERLEAVED within the same window so host weather hits both equally.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from omicidx_gh_etl_spark.operators.bm25_index import Bm25Index
from omicidx_gh_etl_spark.queries.llmops import _BM25_BATCH_Q
from omicidx_gh_etl_spark.queries.tables import load_table
from omicidx_gh_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("REP", "400"))
N_BUCKETS = int(os.environ.get("N_BUCKETS", "256"))


def scored_variants(idx: Bm25Index, qvals, k=10, k1=1.2, b=0.75):
    """(current, single_shuffle) serve frames for the same workload —
    the scoring arithmetic is copied verbatim from
    text.bm25_score_pruned_postings; only the exchange layout differs."""
    s = idx._serve_spark()
    qpairs = sorted(set(qvals))
    terms = sorted({t for _, t in qpairs})
    missing = [t for t in terms if t not in idx._df_cache]
    if missing:
        for t in missing:
            idx._df_cache[t] = 0
        for r in (
            s.table(idx.dfreq_table)
            .filter(F.col("term").isin(missing))
            .collect()
        ):
            idx._df_cache[r["term"]] = r["df"]
    n_docs, avgdl = idx._stats
    df_by_term = {t: idx._df_cache[t] for t in terms}

    qids_by_term: dict = {}
    for q_id, t in qpairs:
        if t in df_by_term and df_by_term[t] > 0:
            qids_by_term.setdefault(t, []).append(q_id)
    terms = sorted(qids_by_term)
    df_entries: list = []
    q_entries: list = []
    for t in terms:
        df_entries += [F.lit(t), F.lit(int(df_by_term[t]))]
        q_entries += [F.lit(t), F.array(*[F.lit(q) for q in qids_by_term[t]])]
    dfm = F.create_map(*df_entries)
    qm = F.create_map(*q_entries)
    df_col = F.element_at(dfm, F.col("term"))
    idf = F.log(1.0 + (F.lit(int(n_docs)) - df_col + 0.5) / (df_col + 0.5))
    part = (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("__dl") / F.lit(float(avgdl)))
        )
    )
    postings = s.table(idx.postings_table).filter(F.col("term").isin(terms))
    contrib = postings.select(
        F.explode(F.element_at(qm, F.col("term"))).alias("q_id"),
        F.col("doc_id"),
        part.alias("part"),
    )
    win = W.partitionBy("q_id").orderBy(F.desc("score"), F.asc("doc_id"))

    def tail(c):
        return (
            c.groupBy("q_id", "doc_id")
            .agg(F.round(F.sum("part"), 4).alias("score"))
            .filter(F.col("score") > 0)
            .withColumn("rk", F.row_number().over(win).cast("int"))
            .filter(F.col("rk") <= k)
        )

    return tail(contrib), tail(contrib.repartition("q_id"))


def main() -> None:
    spark = get_spark(app_name="r11-bm25-ab")
    width = spark.sparkContext.defaultParallelism
    repx = F.explode(F.sequence(F.lit(1), F.lit(REP))).alias("__rep")
    d = load_table(spark, SF_DIR, "documents")
    tmpdir = "/root/repo/spark-warehouse/_r11_bm25_ab"
    os.makedirs(tmpdir, exist_ok=True)
    docs_path = f"{tmpdir}/docs_rep{REP}"
    if not os.path.exists(f"{docs_path}/_SUCCESS"):
        d.select("doc_id", "text", repx).select(
            (F.col("doc_id") * REP + F.col("__rep")).alias("doc_id"),
            F.expr(
                "CASE WHEN trim(text) = '' THEN '' ELSE"
                " concat(regexp_replace(trim(regexp_replace(text, ' +',"
                " ' ')), ' ', concat('_', __rep, ' ')), '_', __rep) END"
            ).alias("text"),
        ).repartition(width).write.mode("overwrite").parquet(docs_path)
    d_mat = spark.read.parquet(docs_path)

    idx = Bm25Index(spark, f"bm25ab{N_BUCKETS}")
    t0 = time.perf_counter()
    idx.build(d_mat, "text", "doc_id", n_buckets=N_BUCKETS)
    print(f"build({N_BUCKETS} buckets): {time.perf_counter()-t0:.2f}s",
          flush=True)

    def qbatch(n_reps: int):
        return [
            (r * 10 + i, f"{t}_{r}")
            for r in range(1, n_reps + 1)
            for i, t in _BM25_BATCH_Q
        ]

    for label, qvals, iters in (("small", qbatch(10), 5),
                                ("big", qbatch(100), 3)):
        cur, single = scored_variants(idx, qvals)
        # value check first (also warms codegen for both)
        a = sorted(tuple(r) for r in cur.collect())
        bvals = sorted(tuple(r) for r in single.collect())
        print(f"{label}: values_match={a == bvals} n={len(a)}", flush=True)
        best_a = best_b = float("inf")
        ta, tb = [], []
        for _ in range(iters):
            t0 = time.perf_counter()
            cur.count()
            one = time.perf_counter() - t0
            ta.append(round(one, 3)); best_a = min(best_a, one)
            t0 = time.perf_counter()
            single.count()
            one = time.perf_counter() - t0
            tb.append(round(one, 3)); best_b = min(best_b, one)
        for name, df_, best, tr in (("current", cur, best_a, ta),
                                    ("1shuffle", single, best_b, tb)):
            nex = df_._jdf.queryExecution().executedPlan().toString().count(
                "Exchange")
            print(f"  {label} {name}: {best:.3f}s trace={tr} "
                  f"exchanges={nex}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
