"""Persisted IVF index: build-once / search-many ANN with versioned
index artifacts.

`similarity.ivf_search` recomputes cell assignments per query batch —
right for one-shot analytics, wrong for a serving-shaped workload where
the same corpus answers many query batches. This module splits the IVF
lifecycle the way disk-based ANN systems do (FAISS's IVF file dumps,
Lucene/Milvus segment indexes):

- **build**: train centroids (k-means), assign every vector to its
  cell, and persist BOTH as snapshot tables. The postings are written
  range-clustered on ``centroid_id``, so each parquet file covers a
  narrow centroid range → a probe's ``centroid_id IN (...)`` predicate
  prunes at file/row-group granularity (footer min/max), not by
  scanning the corpus.
- **search**: read the (tiny) centroid table, pick ``nprobe`` cells
  per query, then scan ONLY the probed cells' postings. The probed
  cell list is collected to the driver (≤ |queries| × nprobe ints) and
  inlined as a literal IN filter precisely so the pushdown is static —
  visible in the scan's PushedFilters, no runtime filter needed.
- **rebuild**: a new build commits new snapshot versions; readers
  pinned to the old version keep consistent results, and a bad rebuild
  is a metadata-only ``rollback()``.

Determinism matches `ivf_search` exactly (rounded cosine, id
tiebreaks), so the persisted path is verified by equality against the
in-memory operator.

At 100 TB: centroids stay driver/broadcast-sized by contract (√n cells
over billions of vectors is ~10⁵ × dims doubles); postings are the
corpus + one int column, written once per rebuild; per-batch search IO
is |corpus| × nprobe / n_cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..engine.snapshots import SnapshotTable
from .similarity import (
    _as_double,
    _collect_vec_rows,
    _dot_sql,
    _norm_sql,
    _probe_inline_sql,
    cosine_sim_expr,
    ivf_assign,
    kmeans_fit,
)


class AnnIndex:
    """IVF index persisted under ``index_dir`` as two snapshot tables:
    ``centroids`` (centroid_id, cv) and ``postings``
    (vec_id, centroid_id, v), range-clustered on centroid_id."""

    def __init__(self, index_dir: str) -> None:
        self.centroids = SnapshotTable(f"{index_dir}/centroids")
        self.postings = SnapshotTable(f"{index_dir}/postings")

    def build(
        self,
        emb: DataFrame,
        n_centroids: int,
        max_iter: int = 5,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        centroids: DataFrame | None = None,
        note: str = "",
    ) -> tuple[int, int]:
        """Train (or accept) centroids, assign the corpus, persist
        both. Returns (centroid_version, postings_version)."""
        if centroids is None:
            centroids = kmeans_fit(
                emb, k=n_centroids, max_iter=max_iter, id_col=id_col, vec_col=vec_col
            )
        e = emb.select(F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("v"))
        assigned = ivf_assign(e, centroids, id_col="vec_id", vec_col="v").select(
            "vec_id", "centroid_id"
        )
        postings = (
            e.join(assigned, "vec_id")
            .select("vec_id", "centroid_id", "v")
            .repartitionByRange(F.col("centroid_id"))
            .sortWithinPartitions("centroid_id", "vec_id")
        )
        cs = self.centroids.commit_overwrite(centroids, note=note or "ivf build")
        # cell-partitioned commit: probe-time reads prune at the
        # MANIFEST (only probed cells' files are even listed), and the
        # IN filter still prunes row groups within those files
        ps = self.postings.commit_overwrite(
            postings, note=note or "ivf build", partition_by="centroid_id"
        )
        return cs.version, ps.version

    def search(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 2,
        query_id_col: str = "q_id",
        query_vec_col: str = "qv",
        version: tuple[int | None, int | None] = (None, None),
    ) -> DataFrame:
        """Top-k by cosine per query over the probed cells of a pinned
        index version. Same ranking semantics as
        ``similarity.ivf_search``."""
        cent = self.centroids.read(spark, version[0])
        # Probe ranking inlined driver-side when the workload allows
        # (similarity._probe_inline_sql — the same driver already
        # collected the probed CELLS for manifest pruning, so inlining
        # the full ranking adds no job): the queries × centroids cross
        # join, its rank window and the probes broadcast all drop out
        # of the plan; candidates come from
        # explode(try_element_at(literal map, centroid_id)). Fallback
        # to the broadcast-probes join for any workload the driver
        # ranking does not replicate (NULL/ragged/non-finite vectors,
        # zero norms, non-integral ids, over-cap batch).
        collected = _collect_vec_rows(cent, "centroid_id", "cv")
        inl = (
            _probe_inline_sql(
                queries, query_id_col, query_vec_col,
                collected[0], collected[1], nprobe,
            )
            if collected is not None else None
        )
        if inl is not None:
            pm, cells = inl
            post = self.postings.read(
                spark, version[1], partition_filter={"centroid_id": cells}
            ).filter(F.col("centroid_id").isin(cells))
            post = post.repartition(spark.sparkContext.defaultParallelism)
            post = post.selectExpr("*", f"{_norm_sql('v')} AS __vn")
            cands = (
                post.selectExpr(
                    "vec_id", "v", "__vn",
                    f"explode(try_element_at({pm}, `centroid_id`)) AS __pr",
                )
                .filter("vec_id != __pr.q")
                .selectExpr(
                    "__pr.q AS q_id", "vec_id",
                    f"round(({_dot_sql('__pr.qvd', 'v')}"
                    " / (__pr.qn * __vn)), 4) AS cos_sim",
                )
            )
            topk_w = W.partitionBy("q_id").orderBy(
                F.desc("cos_sim"), F.asc("vec_id")
            )
            return (
                cands.withColumn("rn", F.row_number().over(topk_w))
                .filter(F.col("rn") <= k)
                .select("q_id", "vec_id", "cos_sim")
            )
        c = cent.select("centroid_id", _as_double("cv").alias("cvd"))
        q = queries.select(
            F.col(query_id_col).alias("q_id"), _as_double(query_vec_col).alias("qvd")
        ).selectExpr("*", f"{_norm_sql('qvd')} AS __qn")

        probe_sim = F.round(cosine_sim_expr(F.col("qvd"), F.col("cvd")), 4)
        probe_w = W.partitionBy("q_id").orderBy(F.desc("ps"), F.asc("centroid_id"))
        probes = (
            q.crossJoin(F.broadcast(c))
            .select("q_id", "qvd", "__qn", "centroid_id", probe_sim.alias("ps"))
            .withColumn("rn", F.row_number().over(probe_w))
            .filter(F.col("rn") <= nprobe)
            .select("q_id", "qvd", "__qn", "centroid_id")
        )
        # probed-cell list → manifest-level file pruning + in-file
        # static pushdown on the postings scan
        cells = sorted(
            r["centroid_id"] for r in probes.select("centroid_id").distinct().collect()
        )
        post = self.postings.read(
            spark, version[1], partition_filter={"centroid_id": cells}
        ).filter(F.col("centroid_id").isin(cells))
        # Spread the probed cells across all cores BEFORE the cosine
        # eval: the pruned read yields ~one file per probed cell (few
        # input partitions), and the per-candidate HOF cosine after the
        # broadcast-probes join is the expensive step — measured 8× on
        # a 500-probe batch at 200k vectors. The shuffle moves only the
        # probed postings (bytes the IO already paid), and the target
        # width is the cluster's total cores at any scale.
        post = post.repartition(spark.sparkContext.defaultParallelism)
        # posting/query norms hoisted (bit-identical — the hoisted norm
        # is the same expression evaluated once per posting / per
        # probe instead of per CANDIDATE PAIR; see similarity._cos_pre_sql)
        post = post.selectExpr("*", f"{_norm_sql('v')} AS __vn")
        cand_sim = F.round(
            F.expr(_dot_sql("qvd", "v")) / (F.col("__qn") * F.col("__vn")), 4
        ).alias("cos_sim")
        cands = (
            post.join(F.broadcast(probes), "centroid_id")
            .filter(F.col("vec_id") != F.col("q_id"))
            .select("q_id", "vec_id", cand_sim)
        )
        topk_w = W.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        return (
            cands.withColumn("rn", F.row_number().over(topk_w))
            .filter(F.col("rn") <= k)
            .select("q_id", "vec_id", "cos_sim")
        )
