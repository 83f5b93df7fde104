"""bench.py's driver contract: exactly ONE JSON line on stdout with the
documented keys, at any SF. The driver parses the last stdout line per
round — a second line, a NaN, or a missing key silently breaks the
recorded BENCH_r{N}.json, so the contract is pinned here at the
smallest SF (~1 min)."""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_SMOKE), reason="testdata absent")
def test_bench_emits_one_valid_json_line():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_SMOKE},
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE stdout line, got {len(lines)}"
    d = json.loads(lines[0])  # strict=True by default: NaN would raise? no —
    # json.loads accepts NaN by default; assert finiteness explicitly:
    assert d["metric"] == "headline_queries_total"
    assert d["unit"] == "sec"
    assert isinstance(d["value"], (int, float)) and math.isfinite(d["value"])
    assert d["sf"] == 0.001
    for name, sec in d["queries"].items():
        assert math.isfinite(sec), f"{name} non-finite"
    # export detail: falsifiability keys (rows/bytes/rows_per_sec) and
    # the paired DuckDB control must be present on the success path
    exp = d["export"]
    assert {"rows", "sec", "bytes", "rows_per_sec", "duckdb_copy"} <= set(exp)
    # scale child ran (error key only on crash)
    assert "error" not in d["scale"], d["scale"]
    assert "mart_export_parquet" in d["scale"]
