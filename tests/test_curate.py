"""Curation pipeline: label semantics, one-pass funnel stats, and the
CLI curate verb."""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from omicidx_gh_etl_spark import cli
from omicidx_gh_etl_spark.engine.curate import curate_corpus, label_corpus

GOOD = ("the quick brown fox jumps over a lazy dog while seventeen "
        "other animals watch from beneath the tall green trees nearby "
        "and nobody expects this particular sentence anywhere")
LOOP = ("click here click here click here click here click here click "
        "here click here click here click here click here click here")
SHORT = "too short"


def _docs(spark):
    rows = [
        (1, GOOD),                       # survives everything
        (2, GOOD),                       # exact dup of 1 -> dropped
        (3, GOOD + " trailing extras appended for near dup effect"),
        #                                 ^ near-dup of 1 -> dropped
        (4, LOOP),                       # repetition reject
        (5, SHORT),                      # quality reject
        (6, ("completely unrelated second document with plenty of "
             "distinct vocabulary items spread across many unique "
             "tokens forming an acceptable training sample easily")),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_label_corpus_flags(spark):
    lab = {r["doc_id"]: r for r in label_corpus(_docs(spark)).collect()}
    assert lab[1]["keep"] is True
    assert lab[2]["exact_keeper"] is False          # dup of keeper 1
    assert lab[3]["neardup_keeper"] is False        # LSH cluster, 1 is min
    assert lab[4]["rep_ok"] is False  # repetition loop caught
    assert lab[5]["quality_ok"] is False
    assert lab[6]["keep"] is True
    assert all(r["split"] in ("train", "val", "test") for r in lab.values())


def test_curate_corpus_writes_and_counts(spark, tmp_path):
    out = str(tmp_path / "curated")
    stats = curate_corpus(_docs(spark), out)
    assert stats["n_docs"] == 6
    assert stats["n_curated"] == 2                  # docs 1 and 6
    assert stats["n_train"] + stats["n_val"] + stats["n_test"] == 2
    assert stats["curated_tokens"] > 0
    back = spark.read.parquet(out)
    assert {r["doc_id"] for r in back.select("doc_id").collect()} == {1, 6}
    assert "split" in back.columns                  # partition column survives


def test_cli_curate(spark, tmp_path, capsys):
    src = str(tmp_path / "docs")
    _docs(spark).write.parquet(src)
    ns = argparse.Namespace(
        cmd="curate", cpus=8, input=src, output=str(tmp_path / "out"),
        min_tokens=10, min_distinct_ratio=0.2,
        classifier=False, leakage_free_split=False, token_budget_frac=None,
    )
    assert cli.cmd_curate(ns) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_curated"] == 2 and stats["n_docs"] == 6


def test_label_corpus_leakage_free_split(spark):
    """Docs 1/2/3 form one dup cluster — under leakage_free_split they
    must all carry the SAME split label (hashed on the component)."""
    lab = {
        r["doc_id"]: r
        for r in label_corpus(_docs(spark), leakage_free_split=True).collect()
    }
    assert lab[1]["split"] == lab[2]["split"] == lab[3]["split"]
    assert all(r["split"] in ("train", "val", "test") for r in lab.values())


def test_label_corpus_classifier_gate(spark):
    lab = {
        r["doc_id"]: r
        for r in label_corpus(_docs(spark), use_classifier=True).collect()
    }
    for r in lab.values():
        assert r["clf_ok"] == (r["score_int"] >= 0)
        if r["keep"]:
            assert r["clf_ok"]


def test_curate_corpus_token_budget(spark, tmp_path):
    """budget_frac=1.0 keeps every survivor; a small budget keeps a
    strict best-scoring subset, and the stats record the spend."""
    full = curate_corpus(
        _docs(spark), str(tmp_path / "full"), token_budget_frac=1.0
    )
    assert full["budget_docs"] == full["n_curated"]
    # survivors: doc1 (28 tokens, score 2316) then doc6 (21, 1984);
    # frac=0.6 -> budget 29.4 of 49: prefix greedy keeps exactly doc1
    part = curate_corpus(
        _docs(spark), str(tmp_path / "part"), token_budget_frac=0.6
    )
    assert part["budget_docs"] == 1
    assert part["budget_tokens"] == 28
    back = spark.read.parquet(str(tmp_path / "part"))
    assert [r["doc_id"] for r in back.collect()] == [1]


def test_curate_full_corpus_with_all_stages(spark, sf_dir, tmp_path):
    """The whole pipeline on the synthetic corpus (planted near-dups,
    varied quality) with every round-3 stage on: classifier gate,
    leakage-free split, token budget. Checks the budget arithmetic and
    that the written corpus matches the reported stats."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "full_corpus")
    stats = curate_corpus(
        docs,
        out,
        leakage_free_split=True,
        token_budget_frac=0.5,
    )
    assert stats["n_docs"] == docs.count()
    assert 0 < stats["n_curated"] <= stats["n_docs"]
    assert 0 < stats["budget_docs"] <= stats["n_curated"]
    # budget is a fraction of SURVIVOR tokens (prefix greedy, <= cap)
    assert stats["budget_tokens"] <= 0.5 * stats["curated_tokens"]
    back = spark.read.parquet(out)
    assert back.count() == stats["budget_docs"]
    assert set(back.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test"
    }
