"""Per-round recorded QUALITY evidence beyond the value-hash gate.

As of round 8 every registered query is oracle-backed (the last four
rows-only queries were converted: frozen seeds for
`similarity_kmeans_fit` / `dedup_semantic_clusters`, a frozen codebook
for `similarity_pq_search`, and an unrolled fixed-round SQL replay for
`text_bpe_learn_merges`). This test remains because a value hash can't
express QUALITY floors — "the refinement didn't collapse", "ADC recall
clears the floor", "the clusters partition the corpus", "the span
fixpoint converged" — so it computes those deterministic
sub-properties at the driver's comparison scale each round, asserts
the floors, and appends the measured values (keyed by round number)
to ROWS_ONLY_EVIDENCE.json — recorded evidence every round, not a
one-time pin. (`remove_duplicate_spans_fixpoint` stays postcondition-
pinned here; it is an operator, not a registered query.)
"""

from __future__ import annotations

import importlib.util
import json
import math
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_GATE = "/root/testdata/sf0.01"
EVIDENCE = os.path.join(REPO, "ROWS_ONLY_EVIDENCE.json")

spec = importlib.util.spec_from_file_location(
    "parity_strict", os.path.join(REPO, "tools", "parity_strict.py")
)
_ps = importlib.util.module_from_spec(spec)
sys.modules.setdefault("parity_strict", _ps)
spec.loader.exec_module(_ps)

from omicidx_gh_etl_spark.queries import REGISTRY  # noqa: E402


def _record(props: dict) -> None:
    data = {}
    if os.path.exists(EVIDENCE):
        with open(EVIDENCE) as fh:
            data = json.load(fh)
    key = f"r{_ps.current_round(REPO):02d}"
    data.setdefault(key, {}).update(props)
    with open(EVIDENCE, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)


@pytest.mark.skipif(not os.path.isdir(SF_GATE), reason="testdata absent")
def test_kmeans_fit_centroid_count_and_separation(spark):
    """k=8 distinct centroids, full dimensionality, and non-degenerate
    pairwise separation (no two centroids collapse)."""
    rows = REGISTRY["similarity_kmeans_fit"].builder(spark, SF_GATE).collect()
    cents: dict[int, dict[int, float]] = {}
    for r in rows:
        cents.setdefault(r["centroid_id"], {})[r["pos"]] = r["v"]
    assert len(cents) == 8
    dims = {len(v) for v in cents.values()}
    assert len(dims) == 1
    mat = np.array([
        [cents[c][p] for p in sorted(cents[c])] for c in sorted(cents)
    ])
    # min pairwise cosine separation: 1 - max off-diagonal cosine
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = norm @ norm.T
    np.fill_diagonal(cos, -1.0)
    min_sep = float(1.0 - cos.max())
    assert min_sep > 1e-4, "two centroids collapsed"
    _record({
        "similarity_kmeans_fit": {
            "n_centroids": len(cents),
            "dims": dims.pop(),
            "min_pairwise_cosine_separation": round(min_sep, 6),
        }
    })


@pytest.mark.skipif(not os.path.isdir(SF_GATE), reason="testdata absent")
def test_pq_search_recall_floor_vs_exact_l2(spark):
    """ADC top-5 recall against the exact L2 top-5 (numpy ground truth
    over the same parquet) must clear the floor — PQ with m=4, k=16
    codebooks measured 0.33 on the near-random synthetic sf0.01
    embeddings (recorded per round in ROWS_ONLY_EVIDENCE.json); 0.15
    is the regression alarm in case the driver reseeds the corpus."""
    got = REGISTRY["similarity_pq_search"].builder(spark, SF_GATE).collect()
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(r["q_id"], set()).add(r["vec_id"])
    assert set(by_q) == {0, 1, 2}
    assert all(len(v) == 5 for v in by_q.values())

    import pyarrow.parquet as pq  # ground truth straight off the file

    t = pq.read_table(os.path.join(SF_GATE, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"])
    vecs = np.stack(t["embedding"].to_pylist()).astype("float64")
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    recalls = []
    for q in (0, 1, 2):
        qv = vecs[ids == q][0]
        d2 = ((vecs - qv) ** 2).sum(axis=1)
        true5 = set(ids[np.lexsort((ids, d2))][:5].tolist())
        recalls.append(len(true5 & by_q[q]) / 5.0)
    mean_recall = float(np.mean(recalls))
    assert mean_recall >= 0.15, recalls
    _record({
        "similarity_pq_search": {
            "recall_at_5_vs_exact_l2": round(mean_recall, 4),
            "per_query": [round(r, 2) for r in recalls],
        }
    })


@pytest.mark.skipif(not os.path.isdir(SF_GATE), reason="testdata absent")
def test_semantic_clusters_partition_and_drop_bounds(spark):
    """The cluster summary must PARTITION the corpus (sizes sum to the
    table count), never drop more than size-1 per cluster, and keep at
    least one vector per cluster."""
    rows = REGISTRY["dedup_semantic_clusters"].builder(spark, SF_GATE).collect()
    n_corpus = spark.read.parquet(
        os.path.join(SF_GATE, "embeddings.parquet")
    ).count()
    assert sum(r["n_vectors"] for r in rows) == n_corpus
    assert all(0 <= r["n_dropped"] <= r["n_vectors"] - 1 for r in rows)
    _record({
        "dedup_semantic_clusters": {
            "n_clusters": len(rows),
            "n_corpus": n_corpus,
            "total_dropped": int(sum(r["n_dropped"] for r in rows)),
        }
    })


@pytest.mark.skipif(not os.path.isdir(SF_GATE), reason="testdata absent")
def test_span_fixpoint_postcondition_recorded(spark):
    """remove_duplicate_spans_fixpoint's postcondition on the real
    corpus sample: zero >=min_len duplicated spans remain."""
    from pyspark.sql import functions as F

    from omicidx_gh_etl_spark.operators import dedup
    from omicidx_gh_etl_spark.queries.tables import load_table

    d = load_table(spark, SF_GATE, "documents").filter(F.col("doc_id") < 120)
    out = dedup.remove_duplicate_spans_fixpoint(
        d, "text", "doc_id", n=8, min_len=12, max_iters=5
    ).localCheckpoint(eager=True)
    remaining = dedup.duplicate_span_runs(
        dedup.positional_shingles(out, "text", "doc_id", n=8),
        "doc_id", n=8, min_len=12, max_shingle_df=50,
    ).count()
    assert remaining == 0
    docs_out = out.count()
    assert math.isfinite(docs_out) and docs_out > 0
    _record({
        "remove_duplicate_spans_fixpoint": {
            "docs_in": 120, "docs_out": docs_out,
            "spans_remaining": int(remaining),
        }
    })


@pytest.mark.skipif(not os.path.isdir(SF_GATE), reason="testdata absent")
def test_bpe_learn_merges_table_recorded(spark):
    """The learned merge table is fully deterministic (exact integer
    pair counts, total-order argmax) even though it has no SQL oracle
    — record it verbatim each round so any drift is visible in the
    diff, and assert the structural floors: 8 rounds completed on
    this corpus, counts non-increasing is NOT required (later merges
    can create new frequent pairs) but every count is positive and
    orders are 1..8."""
    rows = sorted(
        REGISTRY["text_bpe_learn_merges"].builder(spark, SF_GATE).collect(),
        key=lambda r: r["merge_order"],
    )
    assert [r["merge_order"] for r in rows] == list(range(1, 9))
    assert all(r["pair_count"] > 0 for r in rows)
    assert all(len(r["left"]) >= 1 and len(r["right"]) >= 1 for r in rows)
    _record(
        {
            "bpe_merges": [
                [r["merge_order"], r["left"], r["right"], r["pair_count"]]
                for r in rows
            ]
        }
    )
