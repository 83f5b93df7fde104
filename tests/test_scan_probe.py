"""The load_spread parallelism probe — footer-derived scan units.

Load-bearing for every heavy query's parallelism (a wrong probe either
serializes md5-heavy maps onto one core or pays pure-cost shuffles);
pin each documented behavior on synthetic parquet layouts."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from omicidx_gh_etl_spark.queries.tables import _scan_info


def _write(path, rows: int, row_group_size: int | None = None) -> None:
    t = pa.table({"x": list(range(rows)), "s": ["p" * 100] * rows})
    pq.write_table(t, path, row_group_size=row_group_size or rows)


def test_single_row_group_is_one_unit(tmp_path):
    f = str(tmp_path / "one.parquet")
    _write(f, 5000)
    units, rows = _scan_info(f, 32)
    assert units == 1          # byte-range splits don't count
    assert rows == 5000


def test_many_tiny_row_groups_pack_to_one_unit(tmp_path):
    # 8 row groups in a << 4MB file: Spark packs them into ONE split
    f = str(tmp_path / "tiny.parquet")
    _write(f, 800, row_group_size=100)
    units, _rows = _scan_info(f, 32)
    assert units == 1


def test_many_files_bail_early_without_footers(tmp_path):
    d = tmp_path / "many"
    d.mkdir()
    for i in range(40):
        _write(str(d / f"p{i}.parquet"), 10)
    units, rows = _scan_info(str(d), 32)
    assert units >= 32
    assert rows is None        # bailed before counting rows


def test_partitioned_dir_globs_recursively(tmp_path):
    d = tmp_path / "part"
    for split in ("a", "b"):
        (d / f"split={split}").mkdir(parents=True)
        _write(str(d / f"split={split}" / "part0.parquet"), 100)
    units, rows = _scan_info(str(d), 32)
    assert units == 2
    assert rows == 200


def test_corrupt_footer_warns_and_marks_rows_unknown(tmp_path):
    """An unreadable footer must be loud (warning) and must not deflate
    the probe: units counted by size, rows reported unknown (None) so
    load_spread falls back to full width instead of width 1."""
    import warnings

    d = tmp_path / "mix"
    d.mkdir()
    _write(str(d / "good.parquet"), 1000)
    (d / "bad.parquet").write_bytes(b"not a parquet file")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        units, rows = _scan_info(str(d), 32)
    assert units == 2          # good: 1 row group; bad: 1 by size
    assert rows is None        # rows unknowable -> not understated
    assert any("footer probe failed" in str(w.message) for w in caught)


def test_load_spread_width_is_row_aware(spark, tmp_path, monkeypatch):
    """5k-row single-row-group table spreads to rows//256 partitions,
    not all cores; a tiny table is not spread at all."""
    import omicidx_gh_etl_spark.queries.tables as T

    big = str(tmp_path / "documents.parquet")
    _write(big, 5000)
    df = T.load_spread(spark, str(tmp_path), "documents", "x")
    want = spark.sparkContext.defaultParallelism
    assert df.rdd.getNumPartitions() == min(want, 5000 // 256)

    small_dir = tmp_path / "small"
    small_dir.mkdir()
    _write(str(small_dir / "documents.parquet"), 100)
    df2 = T.load_spread(spark, str(small_dir), "documents", "x")
    # width = max(1, 100//256) = 1 <= units -> untouched scan
    plan = df2._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
