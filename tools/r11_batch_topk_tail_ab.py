"""r11 experiment: does the single-exchange rank tail (measured on the
persisted-index serve) also win for the one-shot bm25_batch_topk at
the rrf bench shape (500k salted docs, 20-pair query batch)?

RESULT (quiet host, interleaved min-of-5): NO — a wash. 1-exchange
tail 1.293 s vs default 2-exchange tail 1.270 s (values_match: True,
executed-plan Exchange count 19 vs 21). The one-shot path is
tokenize-scan-bound, and its contrib stream is corpus-scan-sized, so
repartition(q_id) would cap aggregate parallelism at the distinct-
query count and forgo the map-side partial agg + WindowGroupLimit
that bound shuffle traffic at scale. Decision: one-shot paths keep
the default tail (operators/text.py::_default_rank_tail); only the
workload-bounded pruned-postings serve keeps the 1-exchange tail."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from omicidx_gh_etl_spark.operators import text as text_ops
from omicidx_gh_etl_spark.queries.llmops import _BM25_BATCH_Q
from omicidx_gh_etl_spark.queries.tables import load_table
from omicidx_gh_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("REP", "100"))


def old_tail(contrib, id_col, k):
    scored = contrib.groupBy("q_id", id_col).agg(
        F.round(F.sum("part"), 4).alias("score")
    )
    win = W.partitionBy("q_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.filter(F.col("score") > 0)
        .withColumn("rk", F.row_number().over(win).cast("int"))
        .filter(F.col("rk") <= k)
    )


def main() -> None:
    spark = get_spark(app_name="r11-batchtopk-ab")
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
    ).repartition(width, "doc_id")
    qvals = [(r * 10 + i, f"{t}_{r}") for r in range(1, 2)
             for i, t in _BM25_BATCH_Q] + [
        (r * 10 + i, f"{t}_{r}") for r in range(2, 11)
        for i, t in _BM25_BATCH_Q
    ]
    queries = spark.createDataFrame(qvals, "q_id int, term string")

    import unittest.mock as mock

    with mock.patch.object(
        text_ops, "_default_rank_tail", text_ops._rank_scored_tail
    ):
        new = text_ops.bm25_batch_topk(d_rep, queries, "text", "doc_id", k=10)
    with mock.patch.object(text_ops, "_default_rank_tail", old_tail):
        old = text_ops.bm25_batch_topk(d_rep, queries, "text", "doc_id", k=10)
    a = sorted(tuple(r) for r in new.collect())
    b = sorted(tuple(r) for r in old.collect())
    print("values_match:", a == b, len(a), flush=True)
    tn, to = [], []
    for _ in range(5):
        t0 = time.perf_counter(); new.count(); tn.append(
            round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter(); old.count(); to.append(
            round(time.perf_counter() - t0, 3))
    print(f"new(1shuffle): min={min(tn)} trace={tn}")
    print(f"old(2shuffle): min={min(to)} trace={to}")
    for name, df_ in (("new", new), ("old", old)):
        print(name, "exchanges:",
              df_._jdf.queryExecution().executedPlan().toString().count(
                  "Exchange"))
    spark.stop()


if __name__ == "__main__":
    main()
