"""Corpus curation pipeline — materialize a curated training corpus.

Composes the repo's own curation operators into ONE write job:

    quality rules (Gopher length/diversity, map-only)
  ∧ repetition rules (top-2-gram / duplicate-5-gram coverage)
  ∧ exact-duplicate keeper (content-hash argmin)
  ∧ near-duplicate keeper (MinHash LSH → star connected components →
    keep each cluster's min doc id)
  → deterministic train/val/test split (md5 id hash, append-stable)
  → zstd parquet partitioned by split.

Scale design:
- Every stage emits per-doc FLAGS joined on doc_id (uniform key), and
  the final write filters on their conjunction — no stage materializes
  an intermediate corpus copy.
- Funnel metrics ride the write job via ``DataFrame.observe`` placed
  BEFORE the keep-filter: one pass computes counts of all docs, each
  stage's survivors, and curated token totals — no second scan of the
  corpus for stats (the cost the round-1 review flagged in tf-idf).
- The near-dup component step is the only iterative part
  (``connected_components_star`` — O(log² n) rounds on any topology);
  its input is the LSH candidate edge list, corpus-size-sublinear.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..operators import dedup, text


def split_expr(id_col: str = "doc_id") -> F.Column:
    """Deterministic append-stable 80/10/10 split on the md5 of the id
    (same construction as the ``split_train_val_test`` query)."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 10
    )
    return (
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    )


def label_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    min_distinct_ratio: float = 0.2,
    max_top2gram: float = 0.20,
    max_dup5gram: float = 0.15,
) -> DataFrame:
    """Source docs → per-doc decision columns (nothing dropped):
    quality_ok, rep_ok, exact_keeper, neardup_keeper, split, n_tokens,
    keep = conjunction. The auditable decision table a production
    pipeline persists alongside the curated corpus."""
    q = text.quality_flag(
        df,
        text_col,
        [id_col],
        min_tokens=min_tokens,
        min_distinct_ratio=min_distinct_ratio,
    ).select(id_col, "n_tokens", (F.col("quality") == "ok").alias("quality_ok"))
    rep = text.repetition_stats(df, text_col, id_col).select(
        id_col,
        (
            (F.col("top2gram_frac") <= max_top2gram)
            & (F.col("dup5gram_frac") <= max_dup5gram)
        ).alias("rep_ok"),
    )
    exact_keepers = dedup.exact_dedup(df, text_col, id_col).select(
        F.col("keeper").alias(id_col), F.lit(True).alias("exact_keeper")
    )
    pairs = dedup.minhash_lsh_candidates(
        dedup.shingles(df, text_col, id_col, n=3, distinct=False), id_col
    )
    near_drop = (
        dedup.connected_components_star(pairs)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col), F.lit(False).alias("neardup_keeper"))
    )
    labeled = (
        df.join(q, id_col, "left")
        .join(rep, id_col, "left")
        .join(exact_keepers, id_col, "left")
        .join(near_drop, id_col, "left")
        .select(
            "*",
            split_expr(id_col).alias("split"),
        )
        .fillna(
            {"quality_ok": False, "rep_ok": False, "exact_keeper": False,
             "neardup_keeper": True}
        )
    )
    return labeled.withColumn(
        "keep",
        F.col("quality_ok")
        & F.col("rep_ok")
        & F.col("exact_keeper")
        & F.col("neardup_keeper"),
    )


def curate_corpus(
    df: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    **label_kwargs,
) -> dict:
    """Run the full pipeline and write the curated corpus to
    ``out_dir`` partitioned by split (zstd). Returns the funnel stats
    dict — computed by ``observe`` during the write itself."""
    labeled = label_corpus(df, text_col, id_col, **label_kwargs)
    obs = Observation("curate_funnel")
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).alias(c)  # noqa: E731
    watched = labeled.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        cnt("quality_ok"),
        cnt("rep_ok"),
        cnt("exact_keeper"),
        cnt("neardup_keeper"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_curated"),
        F.sum(
            F.when(F.col("keep"), F.col("n_tokens").cast("bigint")).otherwise(0)
        ).alias("curated_tokens"),
        *[
            F.sum(
                F.when(F.col("keep") & (F.col("split") == s), 1).otherwise(0)
            ).alias(f"n_{s}")
            for s in ("train", "val", "test")
        ],
    )
    (
        watched.filter(F.col("keep"))
        .drop("quality_ok", "rep_ok", "exact_keeper", "neardup_keeper", "keep")
        .write.mode("overwrite")
        .partitionBy("split")
        .option("compression", "zstd")
        .parquet(out_dir)
    )
    stats = {k: int(v) for k, v in obs.get.items()}
    stats["output"] = out_dir
    return stats


def format_stats(stats: dict) -> str:
    return json.dumps(stats, sort_keys=True)


def token_budget_select(
    df: DataFrame,
    score_col: str,
    tokens_col: str,
    id_col: str,
    budget_frac: float = 0.3,
) -> DataFrame:
    """Select the highest-scoring documents whose cumulative token
    count fits a budget (``budget_frac`` of the corpus total) — the
    rank-and-cut step that turns per-doc quality scores into a fixed
    token-count training mix.

    Semantics: exactly the greedy scan in (score DESC, id ASC) order,
    stopping when the running token total would exceed the budget.
    Zero-token docs are excluded up front (unselectable content, and
    they would make the greedy frontier ambiguous).

    Scale: the naive formulation is a single global-order running sum —
    one partition does all the work. This computes the same set with
    parallel stages only:

    1. per-SCORE prefix sums over an aggregated (score, bucket_tokens)
       table — the only global-ordered window, sized by |distinct
       scores| (bounded by the score range, not the corpus);
    2. fully-kept / boundary buckets decided from that tiny table,
       broadcast back onto the docs;
    3. a within-bucket running sum PARTITIONED BY score (parallel,
       balanced) resolves the one boundary bucket's partial take.
    """
    from pyspark.sql import Window as W

    d = df.filter(F.col(tokens_col) > 0)
    total = d.agg(
        (F.sum(tokens_col) * F.lit(budget_frac)).alias("__B")
    )
    b = d.groupBy(score_col).agg(F.sum(tokens_col).alias("__btok"))
    wb = W.orderBy(F.desc(score_col)).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    b = (
        b.withColumn("__cum", F.sum("__btok").over(wb))
        .crossJoin(F.broadcast(total))
        .select(score_col, "__btok", "__cum", "__B")
    )
    j = d.join(F.broadcast(b), score_col)
    wd = W.partitionBy(score_col).orderBy(id_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    # running total as the greedy scan would see it at this doc:
    # tokens of all strictly-better buckets + in-bucket prefix.
    run = F.col("__cum") - F.col("__btok") + F.sum(tokens_col).over(wd)
    return (
        j.withColumn("__run", run)
        .filter(F.col("__run") <= F.col("__B"))
        .drop("__btok", "__cum", "__B", "__run")
    )
