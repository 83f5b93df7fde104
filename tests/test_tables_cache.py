"""DF-handle cache behavior: identity reuse, cross-sf-dir isolation,
and stale-only eviction (round-6 verdict item: `clear()` at 256 entries
thrashed live handles; eviction must drop only stale-mtime keys)."""

from __future__ import annotations

import os
import shutil

from omicidx_gh_etl_spark.queries import tables as tb

SF = "/root/testdata/sf0.001"


def test_same_state_returns_same_handle(spark):
    a = tb.load_table(spark, SF, "region")
    b = tb.load_table(spark, SF, "region")
    assert a is b


def test_two_sf_dirs_do_not_cross_contaminate(spark, tmp_path):
    """Loading the same table name from two sf dirs must yield distinct
    plans reading distinct files — a cache keyed only on table name
    would silently serve sf-A data to an sf-B query."""
    alt = tmp_path / "alt_sf"
    alt.mkdir()
    shutil.copy(f"{SF}/region.parquet", alt / "region.parquet")
    # halve the alt copy so row counts differ observably
    import duckdb

    duckdb.execute(
        f"COPY (SELECT * FROM read_parquet('{SF}/region.parquet') LIMIT 2) "
        f"TO '{alt}/region.parquet' (FORMAT PARQUET)"
    )
    a = tb.load_table(spark, SF, "region")
    b = tb.load_table(spark, str(alt), "region")
    assert a is not b
    assert b.count() == 2
    assert a.count() > 2
    # and a rewrite of the alt file invalidates only ITS entry
    duckdb.execute(
        f"COPY (SELECT * FROM read_parquet('{SF}/region.parquet') LIMIT 3) "
        f"TO '{alt}/region.parquet' (FORMAT PARQUET)"
    )
    os.utime(alt / "region.parquet")  # ensure mtime_ns moves
    b2 = tb.load_table(spark, str(alt), "region")
    assert b2 is not b
    assert b2.count() == 3
    assert tb.load_table(spark, SF, "region") is a


def test_evict_stale_drops_only_stale_keys(spark, tmp_path):
    live_path = tmp_path / "live.parquet"
    dead_path = tmp_path / "dead.parquet"
    shutil.copy(f"{SF}/region.parquet", live_path)
    shutil.copy(f"{SF}/region.parquet", dead_path)
    live_key = ("table", tb._file_state(str(live_path)))
    dead_key = ("table", tb._file_state(str(dead_path)))
    per_session = {live_key: "live-df", dead_key: "dead-df"}
    # rewrite dead so its recorded state goes stale
    with open(dead_path, "ab") as fh:
        fh.write(b"x")
    os.utime(dead_path)
    tb._evict_stale(per_session)
    assert live_key in per_session, "live entry must survive eviction"
    assert dead_key not in per_session, "stale entry must be evicted"


def test_evict_stale_all_live_falls_back_to_clear(tmp_path):
    p = tmp_path / "t.parquet"
    shutil.copy(f"{SF}/region.parquet", p)
    key = ("table", tb._file_state(str(p)))
    per_session = {key: "df"}
    tb._evict_stale(per_session)
    assert per_session == {}, "no stale entries -> bounded fallback clear"
