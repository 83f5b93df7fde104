"""bench.py's driver contract. The round driver keeps only the final
~2000 chars of stdout and parses a JSON line out of that window —
round 4's single detail line outgrew the window and recorded
"parsed": null. The contract is now TWO JSON lines: full detail first
(for head-reading parsers + BENCH_DETAIL.json), compact line LAST and
guaranteed to fit the tail window whole. A NaN, a missing key, or a
compact line over the window silently breaks the recorded
BENCH_r{N}.json, so all of it is pinned here at the smallest SF."""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMOKE = "/root/testdata/sf0.001"
TAIL_WINDOW = 2000  # the driver's stdout capture, measured from BENCH_r04


def _assert_compact_contract(line: str, require_sf: float) -> dict:
    """The invariants the round driver's tail parser relies on."""
    compact = json.loads(line)
    assert compact["metric"] == "headline_queries_total"
    assert compact["unit"] == "sec"
    v = compact["value"]
    assert isinstance(v, (int, float)) and math.isfinite(v)
    assert compact["sf"] == require_sf
    for name, sec in compact["queries"].items():
        assert math.isfinite(sec), f"{name} non-finite"
    assert len(line) + 1 < TAIL_WINDOW, len(line)
    return compact


@pytest.mark.skipif(not os.path.isdir(SF_SMOKE), reason="testdata absent")
def test_bench_headline_contract_fast(tmp_path):
    """FAST contract test (default suite): the full main() path with
    the optional-section deadline set to 0, so only the headline and
    export children run. Proves the r11 protocol end-to-end: an EARLY
    compact line flushed before the optional sections (the insurance
    that was missing when the r10 driver run died rc=124 mid-scale with
    an empty tail), skipped sections recorded in `sections_skipped`,
    and a final compact line inside the driver's tail window."""
    detail_path = str(tmp_path / "BENCH_DETAIL.json")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_SMOKE,
             "SPARK_GRAFT_DETAIL_PATH": detail_path,
             "SPARK_GRAFT_BENCH_ATTEMPTS": "1",
             "SPARK_GRAFT_BENCH_DEADLINE_SEC": "0"},
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 3, f"expected early+detail+compact, got {len(lines)}"

    # line 1: the EARLY headline+export contract line — parseable on
    # its own, so a driver timeout during any optional section still
    # leaves a record in the final ~2000 chars of stdout
    early = _assert_compact_contract(lines[0], 0.001)
    assert "partial" in early
    assert "mart_export_parquet" in early["queries"]

    # line 2: full detail; with deadline 0 the scale section is skipped
    detail = json.loads(lines[1])
    assert detail["metric"] == "headline_queries_total"
    assert detail["sections_skipped"] == ["scale"]
    assert detail["scale"].get("skipped"), detail["scale"]
    with open(detail_path) as fh:
        assert json.load(fh) == detail

    # last line: the compact contract line the tail-window driver parses
    compact = _assert_compact_contract(lines[-1], 0.001)
    assert compact["sections_skipped"] == ["scale"]
    tail = proc.stdout[-TAIL_WINDOW:]
    recovered = [
        ln for ln in tail.splitlines()
        if ln.startswith("{") and ln.endswith("}")
    ]
    assert recovered, "no complete JSON line inside the tail window"
    assert json.loads(recovered[-1]) == compact


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(SF_SMOKE), reason="testdata absent")
def test_bench_emits_parseable_json_contract(tmp_path):
    # Budget: the bench runs SIX fresh child JVMs (headline/export/
    # scale/floor/serve/extract — each pays boot + two host signatures)
    # and the scale child alone is ~10 min of job-floor-bound paired
    # rows even at smoke SF (measured ~17-22 min end-to-end on a quiet
    # 32-core host). Marked `slow` (excluded from the default run) per
    # the r10 verdict: the suite's wall-clock outgrew the round
    # driver's budget on this one test.
    detail_path = str(tmp_path / "BENCH_DETAIL.json")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_SMOKE,
             "SPARK_GRAFT_DETAIL_PATH": detail_path,
             # weather retries are runtime-only behavior; at smoke SF
             # they just multiply the budget (children re-run whole)
             "SPARK_GRAFT_BENCH_ATTEMPTS": "1"},
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 3, f"expected early+detail+compact, got {len(lines)}"

    # line 1: the early headline+export contract line (timeout insurance)
    _assert_compact_contract(lines[0], 0.001)

    # line 2: full detail (head-reading parsers; also BENCH_DETAIL.json)
    detail = json.loads(lines[1])
    assert detail["metric"] == "headline_queries_total"
    exp = detail["export"]
    assert {"rows", "sec", "bytes", "rows_per_sec", "duckdb_copy"} <= set(exp)
    assert "error" not in detail["scale"], detail["scale"]
    assert "mart_export_parquet" in detail["scale"]
    assert detail["sections_skipped"] == []
    with open(detail_path) as fh:
        assert json.load(fh) == detail

    # last line: the compact contract line the tail-window driver parses
    compact = _assert_compact_contract(lines[-1], 0.001)
    # the whole parse path: the compact line + newline must survive
    # inside the driver's tail window REGARDLESS of what precedes it
    tail = proc.stdout[-TAIL_WINDOW:]
    recovered = [
        ln for ln in tail.splitlines()
        if ln.startswith("{") and ln.endswith("}")
    ]
    assert recovered, "no complete JSON line inside the tail window"
    assert json.loads(recovered[-1]) == compact


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(SF_SMOKE), reason="testdata absent")
def test_floor_child_recovers_from_context_killing_row_fault():
    """The r9 driver run lost TWO scale rows to one fault: a /tmp
    parquet read failure inside bm25_index_serve stopped the
    SparkContext, and ann_recall_curve then died on the stopped
    context. The recovery contract (bench._isolated_row): the faulted
    row is retried once from scratch on a rebuilt session, and no
    later row inherits the dead context. SPARK_GRAFT_BENCH_INJECT_FAULT
    reproduces exactly that failure mode (stop the context, raise) on
    the named row's first attempt — this test is the proof the verdict
    asked for, not a simulation of a gentler error.

    The ``:jvm`` variant is the strictly harder shape that actually
    bit in round 10: the context dies JVM-side only, so Python's
    `_jsc` and active-context registries stay populated and a naive
    getOrCreate returns the SAME dead session — the rebuild must
    force-clear them (bench._ensure_spark)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--serve-only"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_SMOKE,
             "SPARK_GRAFT_BENCH_ATTEMPTS": "1",
             "SPARK_GRAFT_BENCH_INJECT_FAULT": "bm25_index_serve:jvm"},
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    line = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ][-1]
    out = json.loads(line)
    errors = {
        k: v["error"] for k, v in out.items()
        if isinstance(v, dict) and "error" in v
    }
    assert errors == {}, errors
    # the faulted row recovered on its second, from-scratch attempt...
    assert out["bm25_index_serve"].get("row_attempts") == 2
    assert math.isfinite(out["bm25_index_serve"]["sec"])
    # ...and the rows AFTER the context kill still ran
    assert "ivf" in out["ann_recall_curve"]
