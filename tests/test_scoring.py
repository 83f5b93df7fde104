"""Semantic properties of the round-3 scoring/selection queries —
beyond the oracle hash: the *invariants* each operator promises."""

from __future__ import annotations

import pytest

from omicidx_gh_etl_spark.operators import dedup
from omicidx_gh_etl_spark.queries import REGISTRY


def test_leakage_free_split_property(spark, sf_dir):
    """THE property: no LSH candidate pair straddles two splits."""
    splits = {
        r["doc_id"]: r["split"]
        for r in REGISTRY["split_leakage_free"].builder(spark, sf_dir).collect()
    }
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = dedup.shingles(d, "text", "doc_id", n=3, distinct=False)
    pairs = dedup.minhash_lsh_candidates(
        sh, "doc_id", num_hashes=12, bands=4
    ).collect()
    assert pairs, "smoke corpus should contain planted near-dups"
    for p in pairs:
        assert splits[p["d1"]] == splits[p["d2"]], (
            f"pair ({p['d1']}, {p['d2']}) straddles splits "
            f"{splits[p['d1']]}/{splits[p['d2']]}"
        )
    # all docs assigned, and all three splits materialize
    assert len(splits) == d.count()
    assert set(splits.values()) == {"train", "val", "test"}


def test_quality_classifier_is_deterministic_and_consistent(spark, sf_dir):
    q = REGISTRY["text_quality_classifier"]
    a = {r["doc_id"]: r for r in q.builder(spark, sf_dir).collect()}
    b = {r["doc_id"]: r for r in q.builder(spark, sf_dir).collect()}
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        assert a[k] == b[k]
        # label must agree with the integer score's sign
        assert (a[k]["label"] == "keep") == (a[k]["score_int"] >= 0)
        assert 0.0 <= a[k]["prob_keep"] <= 1.0
        # sigmoid midpoint consistency
        if a[k]["score_int"] >= 0:
            assert a[k]["prob_keep"] >= 0.5


def test_late_materialization_matches_direct_topk(spark, sf_dir):
    """The late-materialized result must equal the straightforward
    wide ORDER BY ... LIMIT k (same rows, same values)."""
    from pyspark.sql import functions as F

    got = {
        r["o_orderkey"]: r
        for r in REGISTRY["late_materialization_topk"]
        .builder(spark, sf_dir)
        .collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    want_keys = [
        r["o_orderkey"]
        for r in o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .collect()
    ]
    assert set(got) == set(want_keys)
    assert len(got) == min(100, o.count())


def test_frame_sample_buffer_math(spark, sf_dir):
    """Every sampled frame is exactly frame_bytes long, indices step by
    every_n, and the partial tail frame is dropped."""
    rows = REGISTRY["multimodal_frame_sample"].builder(spark, sf_dir).collect()
    assert rows
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n_bytes = {r["doc_id"]: len(r["text"].encode("utf-8")) for r in docs}
    seen: dict[int, list[int]] = {}
    for r in rows:
        assert len(r["frame_hex"]) == 32  # 16 bytes hex-encoded
        assert r["frame_idx"] % 2 == 0
        seen.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for did, idxs in seen.items():
        n_frames = n_bytes[did] // 16
        assert sorted(idxs) == list(range(0, n_frames, 2))


@pytest.mark.parametrize(
    "name",
    [
        "text_quality_classifier",
        "split_leakage_free",
        "late_materialization_topk",
    ],
)
def test_no_python_udf_in_plan(spark, sf_dir, name):
    """The JVM-side queries must stay JVM-side (frame sampling is the
    one deliberate Arrow/mapInPandas surface)."""
    plan = (
        REGISTRY[name]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_token_budget_select_equals_naive_greedy(spark, sf_dir):
    """The parallel bucket formulation must equal the naive global
    running-sum greedy, and spend within the budget."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from omicidx_gh_etl_spark.engine.curate import token_budget_select
    from omicidx_gh_etl_spark.operators import text as text_ops

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = text_ops.hashed_linear_score(
        d, "text", ["doc_id"], include_n_tokens=True
    ).select("doc_id", "score_int", "n_tokens")

    got = token_budget_select(
        scored, "score_int", "n_tokens", "doc_id", budget_frac=0.3
    )
    total = scored.agg(F.sum("n_tokens")).collect()[0][0]
    budget = 0.3 * total

    naive = (
        scored.filter(F.col("n_tokens") > 0)
        .withColumn(
            "cum",
            F.sum("n_tokens").over(
                W.orderBy(F.desc("score_int"), F.asc("doc_id")).rowsBetween(
                    W.unboundedPreceding, W.currentRow
                )
            ),
        )
        .filter(F.col("cum") <= budget)
    )
    got_ids = {r["doc_id"] for r in got.collect()}
    naive_ids = {r["doc_id"] for r in naive.collect()}
    assert got_ids == naive_ids and got_ids
    spent = (
        got.agg(F.sum("n_tokens")).collect()[0][0]
    )
    assert spent <= budget
    # greedy maximality: the best-scoring excluded doc would overflow
    assert spent > 0


def test_token_budget_no_global_doc_window(spark, sf_dir):
    """The doc-level window must be PARTITIONED (by the quantized
    score bucket) — a global empty-partition window over doc rows is
    the 1-core trap. Exactly ONE unpartitioned window may exist: the
    prefix sum over the aggregated (bucket, tokens) table, which is
    bounded at `coarse` rows by construction, and its input must be an
    aggregate (not raw doc rows)."""
    import re

    from omicidx_gh_etl_spark.queries import REGISTRY

    plan = (
        REGISTRY["curation_token_budget"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Window [funcs], [partitionSpec], [orderSpec]
    wins = re.findall(r"Window(?:GroupLimit)? \[[^\]]*\], \[([^\]]*)\]", plan)
    assert wins, "expected window operators in the plan"
    partitioned = [w for w in wins if "__qb" in w]
    unpartitioned = [w for w in wins if not w.strip()]
    assert partitioned, (
        "doc-level window lost its PARTITION BY __qb:\n" + plan
    )
    # the only global-ordered window is the bucket prefix sum — its
    # lineage must flow through the bucket aggregate, never raw docs
    assert len(unpartitioned) <= 1, plan
    assert plan.count("Window ") <= 2, plan


def test_count_min_merge_and_bounds(spark, sf_dir):
    """CMS counters built on two halves and summed == counters built on
    the whole (mergeability — the property that makes it a sketch),
    and every estimate >= the exact count (one-sided error)."""
    from pyspark.sql import functions as F

    from omicidx_gh_etl_spark.operators import sketch
    from omicidx_gh_etl_spark.queries.tables import load_events

    ev = load_events(spark, sf_dir)
    whole = sketch.count_min_build(ev, "user_id")
    halves = [
        sketch.count_min_build(ev.filter(F.col("event_id") % 2 == i), "user_id")
        for i in (0, 1)
    ]
    merged = (
        halves[0].unionByName(halves[1])
        .groupBy("j", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    w = {(r["j"], r["bucket"]): r["c"] for r in whole.collect()}
    m = {(r["j"], r["bucket"]): r["c"] for r in merged.collect()}
    assert w == m and w

    keys = ev.select("user_id").distinct().limit(30)
    est = {
        r["user_id"]: r["n_cms"]
        for r in sketch.count_min_estimate(whole, keys, "user_id").collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert est
    for uid, e in est.items():
        assert e >= exact[uid]


def test_streaming_count_min_multibatch(spark, sf_dir, tmp_path):
    """Streamed CMS over MULTIPLE micro-batches (one file each) must
    equal the batch build — additive merge across real batch
    boundaries, not just the single-batch smoke the registry runs."""
    from pyspark.sql import functions as F

    from omicidx_gh_etl_spark.operators import sketch
    from omicidx_gh_etl_spark.queries.tables import load_events
    from omicidx_gh_etl_spark.streaming.cms import run_streaming_count_min

    ev = load_events(spark, sf_dir)
    src = str(tmp_path / "ev_parts")
    # 4 files -> 4 micro-batches under maxFilesPerTrigger=1
    ev.select("event_id", "user_id", "event_type", "value", "props", "ts") \
        .repartition(4).write.parquet(src)

    streamed = run_streaming_count_min(
        spark, src, "user_id", max_files_per_trigger=1
    )
    batch = sketch.count_min_build(ev, "user_id")
    s = {(r["j"], r["bucket"]): r["c"] for r in streamed.collect()}
    b = {(r["j"], r["bucket"]): r["c"] for r in batch.collect()}
    assert s == b and len(s) > 0


def test_streaming_heavy_hitters_multibatch(spark, sf_dir, tmp_path):
    """Streamed MG heavy hitters over MULTIPLE micro-batches must
    equal the batch operator exactly — both are exact (candidates +
    recount), and MG-merge across real batch boundaries must not lose
    a key above n/k. Includes a planted hitter diluted by a sea of
    near-distinct keys so eviction pressure crosses batches."""
    from pyspark.sql import functions as F

    from omicidx_gh_etl_spark.operators.sketch import heavy_hitters
    from omicidx_gh_etl_spark.queries.tables import load_events
    from omicidx_gh_etl_spark.streaming.mg import run_streaming_heavy_hitters

    ev = load_events(spark, sf_dir)
    src = str(tmp_path / "ev_parts")
    ev.select("event_id", "user_id", "event_type", "value", "props", "ts") \
        .repartition(4).write.parquet(src)

    streamed = run_streaming_heavy_hitters(
        spark, src, ev, "user_id", k=120, max_files_per_trigger=1
    )
    batch = heavy_hitters(ev, "user_id", 120)
    s = {(r["key"], r["n"]) for r in streamed.collect()}
    b = {(r["key"], r["n"]) for r in batch.collect()}
    assert s == b

    # planted hitter under eviction pressure across 4 micro-batches
    n = 20_000
    planted = spark.range(n).selectExpr(
        "id AS event_id",
        "CASE WHEN id % 9 = 0 THEN 77 ELSE 1000 + id END AS user_id",
        "'t' AS event_type", "0.0 AS value", "'{}' AS props",
        "timestamp'2024-01-01' AS ts",
    )
    src2 = str(tmp_path / "planted")
    planted.repartition(4).write.parquet(src2)
    got = {r["key"]: r["n"] for r in run_streaming_heavy_hitters(
        spark, src2, spark.read.parquet(src2), "user_id", k=10,
        max_files_per_trigger=1,
    ).collect()}
    assert set(got) == {"77"}
    assert got["77"] == len([1 for i in range(n) if i % 9 == 0])


def test_perceptual_hash_properties(spark):
    """Identical buffers share a phash, a locally-edited buffer stays
    CLOSE in Hamming distance (the property pHash exists for), an
    unrelated buffer is far, and short payloads are skipped."""
    from omicidx_gh_etl_spark.operators import multimodal

    base = bytes(range(256)) * 4                      # 1024 bytes
    edited = bytearray(base)
    edited[100:104] = b"\xff\xff\xff\xff"             # local edit
    other = bytes((i * 37 + 11) % 251 for i in range(1024))
    rows = [
        (1, bytes(base)),
        (2, bytes(base)),
        (3, bytes(edited)),
        (4, other),
        (5, b"short"),                                # < 64 bytes
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r["phash"]
        for r in multimodal.perceptual_hash(df).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert all(len(h) == 64 for h in got.values())
    assert got[1] == got[2]
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))  # noqa: E731
    assert ham(got[1], got[3]) <= 8                    # local edit: near
    assert ham(got[1], got[4]) > 8                     # unrelated: far


def test_temporal_join_exactly_one_state_per_probe(spark, sf_dir):
    """Validity ranges partition the timeline: every purchase matches
    EXACTLY one dimension version, and it's the version in effect at
    the purchase's timestamp (never a later one — no future leakage)."""
    from pyspark.sql import functions as F

    from omicidx_gh_etl_spark.queries.tables import load_events

    rows = REGISTRY["temporal_join_scd2"].builder(spark, sf_dir).collect()
    assert rows
    ev = load_events(spark, sf_dir)
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert len(rows) == n_purchases              # one match per probe
    assert len({r["event_id"] for r in rows}) == n_purchases
    assert all(r["state_at_purchase"] is not None for r in rows)
