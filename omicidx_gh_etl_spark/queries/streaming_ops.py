"""Streaming query registrations.

Bounded-source streaming results equal their batch answers, so they
get full DuckDB oracles (time_bucket == Spark tumbling windows under
UTC — probed in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..streaming import (
    run_dedup_stream,
    run_sessionize_stream,
    run_streaming_window_counts,
)
from .advanced import CMS_ORACLE_SQL
from .base import register
from .llmops import _COS, _MINHASH_BANDS_CTE, _SHINGLE_CTE
from .reshape import SESSION_WINDOW_ORACLE


@register(
    "streaming_window_counts",
    """
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           count(*) AS n,
           sum(CAST(value AS DECIMAL(18,2))) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def streaming_window_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling 5-minute windows per event_type,
    driven to completion over the bounded events source (watermark +
    event-time windows; memory sink smoke pattern)."""
    return run_streaming_window_counts(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_sessionize_stateful",
    """
    WITH gaps AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
             CASE WHEN ts - lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                  > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sess AS (
      SELECT user_id, ts_us, value,
             sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_num
      FROM gaps),
    agg AS (
      SELECT user_id, session_num,
             min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
             count(*) AS n_events, round(sum(value), 4) AS total_value
      FROM sess GROUP BY 1, 2)
    SELECT user_id, session_start_us, session_end_us, n_events, total_value
    FROM agg
    WHERE session_num < (SELECT max(session_num) FROM agg a2
                         WHERE a2.user_id = agg.user_id)
    """,
    tags=("streaming", "stateful"),
)
def streaming_sessionize_stateful_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user 30-min-gap session aggregation over the bounded events
    source. Emits CLOSED sessions — on a bounded single-batch source
    that is exactly "all sessions except each user's last", which the
    oracle reproduces in SQL."""
    out = run_sessionize_stream(spark, f"{sf_dir}/events.parquet")
    return out.select(
        "user_id",
        "session_start_us",
        "session_end_us",
        "n_events",
        F.round("total_value", 4).alias("total_value"),
    )


@register(
    "streaming_dedup_watermark",
    """
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
    FROM events
    """,
    tags=("streaming", "dedup"),
)
def streaming_dedup_watermark_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with watermark-bounded state
    (dropDuplicatesWithinWatermark): the bounded events source is
    unioned with itself (at-least-once delivery simulation) and
    deduped by event_id — one row per event, i.e. the plain table,
    which IS the oracle."""
    out = run_dedup_stream(spark, f"{sf_dir}/events.parquet", key_cols=["event_id"])
    return out.select("event_id", "user_id", "event_type", "ts_us")


@register(
    "streaming_join_attribution",
    """
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           epoch_us(c.ts) AS click_ts_us,
           epoch_us(p.ts) AS purchase_ts_us,
           round(p.value, 4) AS purchase_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    tags=("streaming", "join"),
)
def streaming_join_attribution_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream event-time interval join (click→purchase
    attribution within 30 min, both sides watermarked so join state is
    evictable). Inner joins emit eagerly on match, so draining the
    bounded source yields exactly the batch-join answer — the
    oracle."""
    from ..streaming import run_attribution_join_stream

    return run_attribution_join_stream(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_static_join",
    """
    SELECT c.c_mktsegment, count(*) AS n
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
    tags=("streaming", "join"),
)
def streaming_static_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: streaming events × broadcast
    static customer dimension, aggregated per market segment —
    stateless on the join (the dimension is re-resolved per
    micro-batch), so the only state is the complete-mode aggregate."""
    from ..streaming.join import run_stream_static_join

    return run_stream_static_join(spark, sf_dir)


@register(
    "streaming_session_window",
    SESSION_WINDOW_ORACLE,  # shared with session_window_builtin
    tags=("streaming", "windows"),
)
def streaming_session_window_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` under a watermark on a real stream:
    the state-store formulation of gap sessionization (state = open
    sessions only — the unbounded-stream answer to the lag/sum batch
    plan). Bounded source + complete mode ⇒ equals the batch
    session_window_builtin answer, pinned by the same lag/sum oracle."""
    from ..streaming.windows import run_streaming_session_counts

    return run_streaming_session_counts(spark, f"{sf_dir}/events.parquet")


@register(
    "streaming_neardup_lsh",
    _SHINGLE_CTE
    + _MINHASH_BANDS_CTE
    + """
SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
FROM bands a
JOIN bands b ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
    """,
    tags=("streaming", "dedup"),
)
def streaming_neardup_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup ingestion: each micro-batch of documents is
    checked against the accumulated corpus band index (SnapshotTable)
    via incremental_lsh_candidates, then its bands are appended for
    later batches — the continuous-crawl dedup shape. The pair set is
    ingestion-order-invariant (pinned by test_streaming_neardup), so
    the bounded run equals one-shot batch LSH, which IS the oracle."""
    import shutil
    import tempfile

    from ..engine.snapshots import SnapshotTable
    from ..streaming.neardup import run_neardup_stream

    tmp = tempfile.mkdtemp(prefix="neardup_q_")
    try:
        pairs = run_neardup_stream(
            spark,
            f"{sf_dir}/documents.parquet",
            "doc_id long, text string, source string, lang string, n_chars long",
            SnapshotTable(f"{tmp}/index"),
            SnapshotTable(f"{tmp}/pairs"),
        )
        # materialize BEFORE returning: the lazy snapshot read is the
        # only thing pinning the temp index/pairs dirs —
        # localCheckpoint(eager) cuts the lineage so the tmpdir can be
        # deleted here instead of leaking per invocation (same
        # treatment as streaming_ann_ingest below)
        return pairs.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "streaming_count_min",
    CMS_ORACLE_SQL,
    tags=("streaming", "sketch"),
)
def streaming_count_min_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch built INCREMENTALLY over the event stream
    (foreachBatch: per-batch counters merged by addition — the driver
    state is sketch-sized, never data-sized), then probed exactly like
    the batch `sketch_count_min` via the SHARED cms_probe_compare /
    CMS_ORACLE_SQL: CMS mergeability makes the streamed counters
    bit-identical to a batch build, and hashing both queries against
    one oracle string enforces it."""
    from ..streaming.cms import run_streaming_count_min
    from .advanced import CMS_DEPTH, CMS_WIDTH, cms_probe_compare

    counters = run_streaming_count_min(
        spark, f"{sf_dir}/events.parquet", "user_id",
        depth=CMS_DEPTH, width=CMS_WIDTH,
    )
    return cms_probe_compare(spark, sf_dir, counters)


def _cov_oracle():
    from .advanced import COV_ORACLE_SQL

    return COV_ORACLE_SQL


@register(
    "streaming_covariance",
    # moment additivity: the streamed state must equal the one-shot
    # covariance over the whole table — the SAME oracle string as the
    # batch embedding_covariance pins both (queries/advanced.py)
    _cov_oracle(),
    tags=("streaming", "similarity", "pca"),
)
def streaming_covariance_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance moment state maintained INCREMENTALLY over an
    embedding stream (foreachBatch: per-batch gemm-partial moment rows
    merged by addition — driver state is dim²+dim+1 floats, never
    data-sized; streaming/moments.py), then derived to (i, j, cov)
    exactly like the batch embedding_covariance. The PCA/whitening
    model can be re-fit after any batch without rescanning history —
    the streaming face of covariance_from_state's O(delta) refresh."""
    import shutil
    import tempfile

    from ..streaming.moments import run_streaming_covariance
    from .tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    tmp = tempfile.mkdtemp(prefix="cov_stream_q_")
    try:
        e.repartition(4).write.mode("overwrite").parquet(tmp)
        # the returned frame is built from driver-held state
        # (createDataFrame), so nothing lazy pins the tmp dir
        return run_streaming_covariance(
            spark, tmp, e.schema, "embedding", max_files_per_trigger=1
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "streaming_heavy_hitters",
    """
    SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY user_id
    HAVING count(*) > (SELECT count(user_id) FROM events) / 120.0
    """,
    tags=("streaming", "sketch"),
)
def streaming_heavy_hitters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over the event STREAM: per-micro-batch Misra-Gries
    summaries (≤ k×partitions rows each) folded into one k-bounded
    driver state, then ONE exact batch recount of the candidates —
    the streaming face of `sketch_heavy_hitters`, sharing its exact
    GROUP BY/HAVING oracle because MG mergeability guarantees the
    streamed candidate set still contains every key above n/k
    (operators/sketch.py::mg_merge; streaming/mg.py)."""
    from ..streaming.mg import run_streaming_heavy_hitters
    from .tables import load_events

    return run_streaming_heavy_hitters(
        spark, f"{sf_dir}/events.parquet", load_events(spark, sf_dir),
        "user_id", k=120,
    )


@register(
    "streaming_ann_ingest",
    # the oracle is the one-shot cell assignment over the FULL corpus:
    # ingestion split must never change where a vector lands (same
    # argmax SQL as similarity_ivf_assign via the shared _COS macro,
    # projected to assignments)
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 10)
    SELECT e.vec_id, c.centroid_id
    FROM e CROSS JOIN c
    QUALIFY row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY round(<COS>, 4) DESC, centroid_id) = 1
    """.replace("<COS>", _COS.format(a="v", b="cv")),
    tags=("streaming", "similarity"),
)
def streaming_ann_ingest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN index maintenance: even-id vectors are the initial
    `AnnIndex.build`; odd-id vectors arrive as a micro-batch stream
    (file source → foreachBatch cell assignment → partition-scoped
    exactly-once merge into the postings snapshot). The final index
    holds every vector in the same cell a one-shot build would put it
    — which IS the oracle (streaming/ann_ingest.py)."""
    import shutil
    import tempfile

    from ..operators.ann_index import AnnIndex
    from ..streaming.ann_ingest import stream_ann_ingest
    from .tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    tmp = tempfile.mkdtemp(prefix="ann_ingest_q_")
    idx = AnnIndex(f"{tmp}/index")
    idx.build(e.filter(F.col("vec_id") % 2 == 0), n_centroids=10,
              centroids=centroids)
    delta_dir = f"{tmp}/delta"
    e.filter(F.col("vec_id") % 2 == 1).write.mode("overwrite").parquet(delta_dir)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(delta_dir)
    )
    q = stream_ann_ingest(stream, idx, txn_id="ann-ingest-query")
    try:
        q.processAllAvailable()
        # materialize the result BEFORE returning: the postings read is
        # lazy, and it is the only thing pinning the temp index/delta
        # dirs — localCheckpoint(eager) cuts that lineage so the whole
        # tree can be deleted here instead of leaking per invocation
        return (
            idx.postings.read(spark)
            .select("vec_id", "centroid_id")
            .localCheckpoint(eager=True)
        )
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
