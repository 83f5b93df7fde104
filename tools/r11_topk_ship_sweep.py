"""r11 experiment: similarity_topk blocks-kernel Arrow boundary.

r10 measured the 10M x 64 blocks row as 1.379 s = 0.432 s JVM plan
floor + ~0.88 s Arrow boundary + ~0.07 s gemv kernel. The OUTPUT side
already ships <= k rows per batch (the kernel pre-selects before the
boundary); `arrow_ship_sec` is the INPUT direction — a pass-through
mapInArrow that reads every batch and returns one count row costs ~95%
of the full row. This sweep probes the remaining knobs: Arrow batch
rows, maxBytesPerBatch, and task-slice width (pipelining).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from omicidx_gh_etl_spark.operators import similarity
from omicidx_gh_etl_spark.queries.tables import load_table
from omicidx_gh_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP_E = 5000


def main() -> None:
    spark = get_spark(app_name="r11-topk-ship")
    width = spark.sparkContext.defaultParallelism
    e = load_table(spark, SF_DIR, "embeddings")
    base_rows = sorted(
        e.select("vec_id", "embedding").collect(), key=lambda r: r["vec_id"]
    )
    dims = len(base_rows[0]["embedding"])
    blk = []
    for lo in range(0, len(base_rows), 2048):
        chunk = base_rows[lo : lo + 2048]
        blk.append((
            bytearray(np.array(
                [r["vec_id"] for r in chunk], dtype="<i8").tobytes()),
            bytearray(np.array(
                [r["embedding"] for r in chunk], dtype="<f4").tobytes()),
        ))
    bb = spark.createDataFrame(blk, "ids binary, vecs binary")
    query = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    n_vec = len(base_rows) * REP_E
    print(f"n_vec={n_vec} dims={dims} bytes={n_vec*dims*4/1e9:.2f}GB",
          flush=True)

    def bb_rep(slices_mult):
        return (
            spark.range(0, REP_E, 1, slices_mult * width)
            .select((F.col("id") + 1).alias("__off"))
            .crossJoin(F.broadcast(bb))
        )

    def _ship_only(batches):
        import pyarrow as pa

        n = 0
        for batch in batches:
            n += batch.num_rows
        yield pa.RecordBatch.from_pydict({"n": pa.array([n], "int64")})

    def timed(df, iters=3):
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            df.agg(F.sum("n")).head()
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}
    for slices in (2, 4, 8):
        for rows_per_batch in (4, 8, 16, 32, 64):
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch",
                str(rows_per_batch),
            )
            sec = timed(bb_rep(slices).mapInArrow(_ship_only, "n long"))
            results[(slices, rows_per_batch)] = round(sec, 3)
            print(f"slices={slices}x rows/batch={rows_per_batch}: "
                  f"{sec:.3f}s", flush=True)
    # maxBytesPerBatch (Spark 4): rows bound loose, bytes bound active
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    for mb in (2, 8, 32):
        try:
            spark.conf.set(
                "spark.sql.execution.arrow.maxBytesPerBatch",
                str(mb * 1024 * 1024),
            )
        except Exception as exc:
            print(f"maxBytesPerBatch unsupported: {exc}")
            break
        sec = timed(bb_rep(2).mapInArrow(_ship_only, "n long"))
        print(f"maxBytesPerBatch={mb}MB: {sec:.3f}s", flush=True)
    spark.conf.unset("spark.sql.execution.arrow.maxBytesPerBatch")

    # best config → full kernel, vs the r10 default (2x, 16 rows)
    best_cfg = min(results, key=results.get)
    print(f"best ship cfg: {best_cfg} = {results[best_cfg]}s", flush=True)
    for label, (slices, rpb) in (("r10-default", (2, 16)),
                                 ("best", best_cfg)):
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(rpb)
        )
        df = similarity.cosine_topk_blocks(
            bb_rep(slices), query, k=10, dims=dims,
            id_scale=REP_E, id_offset_col="__off",
        )
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.count()
            best = min(best, time.perf_counter() - t0)
        print(f"full blocks row [{label} {slices}x/{rpb}]: {best:.3f}s",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
