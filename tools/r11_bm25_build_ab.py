"""r11 experiment: Bm25Index.build restructure.

Current build (operators/bm25_index.py): bm25_build_index(materialize=
True) tokenizes the corpus TWICE (postings and dls are separate
lineages, each localCheckpoint'ed), then re-shuffles the checkpointed
postings for the bucketed write, and dfreq pays its own agg + another
repartition — 2 tokenize passes + checkpoint write/read + 5 exchanges.

v2: ONE tokenize pass; repartition(n_buckets, term) BELOW the
(id, term, dl) aggregate (hash(term) satisfies the agg's clustering —
guide §2.4 "two operations keyed the same way share one exchange"), so
the same exchange feeds the aggregate AND the bucketed layout; dfreq
derives from the WRITTEN postings table (bucketed scan → zero-shuffle
groupBy(term) → zero-shuffle bucketed write); stats from a narrow
distinct (doc_id, dl) projection + the corpus row count.

Verifies table content equality, then reports timings.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from omicidx_gh_etl_spark.operators.bm25_index import (
    Bm25Index,
    _drop_table_and_location,
)
from omicidx_gh_etl_spark.operators.text import tokens_sql
from omicidx_gh_etl_spark.queries.tables import load_table
from omicidx_gh_etl_spark.session import get_spark
from omicidx_gh_etl_spark.sources.layout import write_bucketed

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("REP", "400"))
N_BUCKETS = int(os.environ.get("N_BUCKETS", "256"))


def build_v2(spark, idx: Bm25Index, docs, text_col, id_col, n_buckets):
    for t in (idx.postings_table, idx.dfreq_table, idx.stats_table):
        _drop_table_and_location(spark, t)
    toks = tokens_sql(f"coalesce(`{text_col}`, '')")
    exploded = docs.selectExpr(
        f"`{id_col}`", f"{toks} AS __t"
    ).selectExpr(
        f"`{id_col}`", "size(__t) AS __dl", "__t"
    ).select(
        F.col(id_col), F.col("__dl"), F.explode_outer("__t").alias("term")
    )
    postings = (
        exploded.filter(F.col("term").isNotNull())
        .select(F.col(id_col).alias("doc_id"), "term", "__dl")
        .repartition(n_buckets, F.col("term"))
        .groupBy("doc_id", "term", "__dl")
        .agg(F.count("*").alias("tf"))
        .select("doc_id", "term", "__dl", "tf")
    )
    # write WITHOUT an extra repartition: the agg output partitioning
    # is the repartition's hash(term) % n_buckets — the same murmur3
    # pmod the bucket spec uses
    w = postings.write.format("parquet").bucketBy(n_buckets, "term")
    w = w.sortBy("term", "doc_id")
    w.mode("overwrite").saveAsTable(idx.postings_table)
    # dfreq from the WRITTEN postings: bucketed scan → no exchange on
    # groupBy(term), output stays term-bucketed → no exchange on write
    p = spark.table(idx.postings_table)
    dfreq = p.groupBy("term").agg(
        F.count(F.when(F.col("tf") > 0, True)).alias("df")
    )
    w = dfreq.write.format("parquet").bucketBy(n_buckets, "term")
    w = w.sortBy("term")
    w.mode("overwrite").saveAsTable(idx.dfreq_table)
    # stats: n counts ALL docs (token-less included); sum(dl) over the
    # narrow per-doc projection of the postings (token-less docs
    # contribute dl=0). Integer-valued doubles sum exactly, so
    # sum/count here is bit-identical to avg() over per-doc dl rows.
    n_total = docs.count()
    sum_dl = (
        p.select("doc_id", "__dl").distinct()
        .agg(F.sum("__dl")).collect()[0][0]
    ) or 0
    avgdl = float(sum_dl) / float(n_total) if n_total else None
    spark.createDataFrame(
        [(n_total, avgdl)], "__n long, __avgdl double"
    ).write.mode("overwrite").saveAsTable(idx.stats_table)
    idx._stats = (n_total, avgdl)
    idx._df_cache = {}


def table_hash(spark, table, cols):
    return spark.table(table).selectExpr(
        f"sum(cast(xxhash64({', '.join(cols)}) as decimal(38,0))) AS h",
        "count(*) AS c",
    ).collect()[0]


def main() -> None:
    spark = get_spark(app_name="r11-bm25-build-ab")
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

    idx_a = Bm25Index(spark, "bm25bldA")
    idx_b = Bm25Index(spark, "bm25bldB")
    times = {"current": [], "v2": []}
    for i in range(2):
        t0 = time.perf_counter()
        idx_a.build(d_mat, "text", "doc_id", n_buckets=N_BUCKETS)
        times["current"].append(round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        build_v2(spark, idx_b, d_mat, "text", "doc_id", N_BUCKETS)
        times["v2"].append(round(time.perf_counter() - t0, 2))
    print("times:", times, flush=True)

    for tbl, cols in (("postings", ["doc_id", "term", "__dl", "tf"]),
                      ("dfreq", ["term", "df"]),
                      ("stats", ["__n", "__avgdl"])):
        ha = table_hash(spark, getattr(idx_a, f"{tbl}_table"), cols)
        hb = table_hash(spark, getattr(idx_b, f"{tbl}_table"), cols)
        print(f"{tbl}: match={tuple(ha) == tuple(hb)} a={tuple(ha)} "
              f"b={tuple(hb)}", flush=True)
    # file layout: one file per bucket?
    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    for name in (idx_b.postings_table, idx_b.dfreq_table):
        name = name.lower()  # catalog lowercases managed-table dirs
        nfiles = len([f for f in os.listdir(f"{wh}/{name}")
                      if f.endswith(".parquet")])
        print(f"{name}: {nfiles} files for {N_BUCKETS} buckets")
    # serve equivalence on the v2 index
    from omicidx_gh_etl_spark.queries.llmops import _BM25_BATCH_Q
    qvals = [(r * 10 + i, f"{t}_{r}") for r in range(1, 11)
             for i, t in _BM25_BATCH_Q]
    queries = spark.createDataFrame(qvals, "q_id int, term string")
    a = sorted(tuple(r) for r in idx_a.serve(queries, k=10).collect())
    b = sorted(tuple(r) for r in idx_b.serve(queries, k=10).collect())
    print("serve match:", a == b, len(a))
    spark.stop()


if __name__ == "__main__":
    main()
