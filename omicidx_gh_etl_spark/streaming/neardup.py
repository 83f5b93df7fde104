"""Streaming near-dup detection against a growing corpus band index.

The production ingest shape: documents arrive continuously; each
micro-batch must be checked for near-duplicates against EVERYTHING
ingested so far — without recomputing signatures for the accumulated
corpus. ``foreachBatch`` composes the incremental batch operator
(:func:`~..operators.dedup.incremental_lsh_candidates`) with a
versioned :class:`~..engine.snapshots.SnapshotTable` band index:

per micro-batch
1. compute the batch's OWN minhash band signatures (O(|batch|)),
2. candidate pairs = batch bands ⋈ persisted index on (band, bsig)
   + batch-internal bucket pairs,
3. append pairs to the pairs table, then append the batch's bands to
   the index — so later batches dedup against this one.

Invariant (pinned by test): for ANY partitioning of the corpus into
micro-batches, the union of emitted pairs equals the one-shot batch
``minhash_lsh_candidates`` output — streaming ingestion order never
changes what counts as a duplicate.

Exactly-once: both tables carry the (txn_id, epoch_id) replay guard
from ``upsert_sink`` — each table skips a replayed epoch it already
committed, so a crash between the two appends replays into a
pairs-skip + index-commit, never a duplicate. Work per batch is
O(|batch| + index matches); the index read is manifest-driven and at
scale would be partitioned by ``band`` for pruned reads.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import (
    incremental_lsh_candidates,
    lsh_pairs_from_bands,
    minhash_band_signatures,
    shingles,
)
from .source import source_glob
from .upsert_sink import _should_skip


def make_neardup_batch_fn(
    index_table,
    pairs_table,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    max_bucket_size: int | None = None,
    txn_id: str | None = None,
):
    """Build the ``foreachBatch`` function. ``index_table`` holds
    (id, band, bsig) rows for every prior batch; ``pairs_table``
    accumulates (d1, d2) candidate pairs."""
    txn_id = txn_id or f"txn_{uuid.uuid4().hex[:12]}"

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        delta_bands = minhash_band_signatures(
            shingles(batch, text_col, id_col, n=n, distinct=False),
            id_col,
            num_hashes,
            bands,
        ).localCheckpoint(eager=True)  # used twice: join + append
        if not _should_skip(pairs_table, txn_id, epoch_id):
            if index_table.latest_version() is None:
                pairs = lsh_pairs_from_bands(
                    delta_bands, id_col, max_bucket_size
                )
            else:
                pairs = incremental_lsh_candidates(
                    index_table.read(spark),
                    delta_bands,
                    id_col,
                    max_bucket_size=max_bucket_size,
                )
            pairs_table.commit_append(
                pairs,
                note=f"stream epoch {epoch_id}",
                meta={"epoch_id": epoch_id, "txn_id": txn_id},
            )
        if not _should_skip(index_table, txn_id, epoch_id):
            index_table.commit_append(
                delta_bands,
                note=f"stream epoch {epoch_id}",
                meta={"epoch_id": epoch_id, "txn_id": txn_id},
            )

    return _apply


def run_neardup_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    index_table,
    pairs_table,
    max_files_per_trigger: int = 1,
    **kwargs,
) -> DataFrame:
    """Drive the near-dup stream over a bounded parquet directory
    (one file per micro-batch by default — each file plays 'today's
    crawl'); returns the accumulated distinct pairs."""
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_glob(source_dir))  # single-file paths → glob
    )
    q = (
        src.writeStream.outputMode("append")
        .queryName(f"neardup_{uuid.uuid4().hex[:10]}")
        .foreachBatch(make_neardup_batch_fn(index_table, pairs_table, **kwargs))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return pairs_table.read(spark).distinct()
