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
    return split_key_expr(F.col(id_col))


def split_key_expr(key: F.Column) -> F.Column:
    """80/10/10 split on the md5 of an arbitrary key column — pass the
    near-dup component for a leakage-free split (same arithmetic as
    the ``split_leakage_free`` query)."""
    bucket = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
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
    use_classifier: bool = False,
    leakage_free_split: bool = False,
) -> DataFrame:
    """Source docs → per-doc decision columns (nothing dropped):
    quality_ok, rep_ok, exact_keeper, neardup_keeper, split, n_tokens,
    keep = conjunction. The auditable decision table a production
    pipeline persists alongside the curated corpus.

    ``use_classifier`` adds the hashed-linear model gate (``clf_ok`` +
    ``score_int`` columns; see operators/text.py::hashed_linear_score).
    ``leakage_free_split`` hashes the near-dup COMPONENT instead of the
    doc id for the split, so near-duplicates never straddle train/test
    — reusing the components the near-dup keeper stage already
    computed, no extra lineage."""
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
    comp = dedup.connected_components_star(pairs)
    near_drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col), F.lit(False).alias("neardup_keeper")
    )
    labeled = (
        df.join(q, id_col, "left")
        .join(rep, id_col, "left")
        .join(exact_keepers, id_col, "left")
        .join(near_drop, id_col, "left")
    )
    if leakage_free_split:
        # No broadcast hint: the component map has one row per document
        # appearing in ANY near-dup pair — corpus-proportional on a
        # crawl, so it must shuffle-join on the (uniform) id key and
        # let AQE broadcast only when the runtime size says it's safe.
        labeled = (
            labeled.join(
                comp.select(F.col("node").alias(id_col), "component"),
                id_col,
                "left",
            )
            .withColumn(
                "split",
                split_key_expr(
                    F.coalesce(F.col("component"), F.col(id_col))
                ),
            )
            .drop("component")
        )
    else:
        labeled = labeled.withColumn("split", split_expr(id_col))
    labeled = labeled.fillna(
        {"quality_ok": False, "rep_ok": False, "exact_keeper": False,
         "neardup_keeper": True}
    )
    keep = (
        F.col("quality_ok")
        & F.col("rep_ok")
        & F.col("exact_keeper")
        & F.col("neardup_keeper")
    )
    if use_classifier:
        clf = text.hashed_linear_score(df, text_col, [id_col]).select(
            id_col,
            "score_int",
            (F.col("label") == "keep").alias("clf_ok"),
        )
        labeled = labeled.join(clf, id_col, "left").fillna({"clf_ok": False})
        keep = keep & F.col("clf_ok")
    return labeled.withColumn("keep", keep)


def curate_corpus(
    df: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_budget_frac: float | None = None,
    **label_kwargs,
) -> dict:
    """Run the full pipeline and write the curated corpus to
    ``out_dir`` partitioned by split (zstd). Returns the funnel stats
    dict — computed by ``observe`` during the write itself.

    ``token_budget_frac`` caps the curated output at that fraction of
    the SURVIVORS' total tokens, keeping the best classifier-scored
    docs first (forces the classifier stage on; see
    :func:`token_budget_select` for the no-global-window plan)."""
    if token_budget_frac is not None:
        label_kwargs["use_classifier"] = True
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
    flag_cols = ["quality_ok", "rep_ok", "exact_keeper", "neardup_keeper",
                 "keep"]
    if label_kwargs.get("use_classifier"):
        flag_cols.append("clf_ok")
    out = watched.filter(F.col("keep")).drop(*flag_cols)
    budget_obs = None
    if token_budget_frac is not None:
        out = token_budget_select(
            out, "score_int", "n_tokens", id_col,
            budget_frac=token_budget_frac,
        )
        budget_obs = Observation("curate_budget")
        out = out.observe(
            budget_obs,
            F.count(F.lit(1)).alias("budget_docs"),
            F.sum(F.col("n_tokens").cast("bigint")).alias("budget_tokens"),
        )
    (
        out.write.mode("overwrite")
        .partitionBy("split")
        .option("compression", "zstd")
        .parquet(out_dir)
    )
    # sum() over an empty frame observes as None (e.g. a budget so
    # tight the prefix greedy selects nothing) — report 0, not a crash.
    stats = {k: int(v or 0) for k, v in obs.get.items()}
    if budget_obs is not None:
        stats.update({k: int(v or 0) for k, v in budget_obs.get.items()})
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
    coarse: int = 1024,
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
    bounded-size serial work regardless of corpus size:

    1. scores are QUANTIZED into ≤ ``coarse`` order-preserving buckets
       (step derived from the observed score range — raw scores can be
       near-unique per doc, so grouping by the raw score would just
       rebuild a corpus-sized table);
    2. per-bucket prefix sums over the aggregated (bucket, tokens)
       table — the only global-ordered window, ≤ ``coarse`` rows;
    3. fully-kept / boundary buckets decided from that tiny broadcast
       table; a running sum PARTITIONED BY bucket, ordered by
       (score DESC, id), resolves every bucket's partial take in
       parallel. The greedy's running total at any doc is exactly
       (tokens of all strictly-better buckets) + (in-bucket prefix),
       so the kept set equals the naive scan's (hypothesis-pinned in
       tests). The boundary bucket is the one serial region —
       ~corpus/coarse docs for non-degenerate score distributions
       (an all-one-score corpus degrades to the naive scan, which is
       inherent to that tie order, not to this plan).
    """
    from pyspark.sql import Window as W

    d = df.filter(F.col(tokens_col) > 0)
    # order-preserving quantization step from the observed range; the
    # range agg is a full-reduce (no shuffle of rows, one tiny result)
    rng = d.agg(
        F.min(score_col).alias("__lo"),
        F.max(score_col).alias("__hi"),
        (F.sum(tokens_col) * F.lit(budget_frac)).alias("__B"),
    )
    step = F.greatest(
        F.lit(1),
        F.ceil((F.col("__hi") - F.col("__lo") + 1) / F.lit(coarse)),
    )
    d = d.crossJoin(F.broadcast(rng)).withColumn(
        "__qb", F.floor(F.col(score_col) / step)
    )
    b = d.groupBy("__qb").agg(F.sum(tokens_col).alias("__btok"))
    wb = W.orderBy(F.desc("__qb")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    b = b.withColumn("__cum", F.sum("__btok").over(wb))
    j = d.join(F.broadcast(b), "__qb")
    wd = W.partitionBy("__qb").orderBy(
        F.desc(score_col), F.asc(id_col)
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    # running total as the greedy scan would see it at this doc:
    # tokens of all strictly-better buckets + in-bucket prefix.
    run = F.col("__cum") - F.col("__btok") + F.sum(tokens_col).over(wd)
    return (
        j.withColumn("__run", run)
        .filter(F.col("__run") <= F.col("__B"))
        .drop("__qb", "__btok", "__cum", "__B", "__lo", "__hi", "__run")
    )
