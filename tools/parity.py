"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every registered query's Spark builder AND its DuckDB oracle at a
given scale factor, then compares row count + column names + values
(order-insensitive, columns sorted by name) — the same contract as
CORRECTNESS_r{N}.json. Run before committing new queries:

    python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

from omicidx_gh_etl_spark.queries import REGISTRY  # noqa: E402
from omicidx_gh_etl_spark.session import get_spark  # noqa: E402

from omicidx_gh_etl_spark.queries.base import ORACLE_TABLES as TABLES  # noqa: E402


def _norm(v):
    """Normalize a cell so logically-equal values compare equal."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        # registered builders cast final DECIMAL outputs to double
        # (queries/base.py::hash_safe_output) while DuckDB's fetchall
        # still yields Decimal — normalize both to the float tag so
        # value-equal cells compare equal across the dtype gap.
        return ("f", repr(round(float(v), 10)))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(round(v, 10)))
    if isinstance(v, datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, int):
        return ("i", v)
    return v


def compare(name: str, spark_df, duck_rows, duck_cols) -> list[str]:
    errors: list[str] = []
    s_cols = spark_df.columns
    if sorted(s_cols) != sorted(duck_cols):
        errors.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(duck_cols)}")
        return errors
    order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_rows = [tuple(_norm(r[i]) for i in s_order) for r in spark_df.collect()]
    d_rows = [tuple(_norm(r[i]) for i in order) for r in duck_rows]
    if len(s_rows) != len(d_rows):
        errors.append(f"row count: spark={len(s_rows)} duck={len(d_rows)}")
    s_sorted, d_sorted = sorted(s_rows, key=repr), sorted(d_rows, key=repr)
    if s_sorted != d_sorted:
        mism = 0
        for a, b in zip(s_sorted, d_sorted):
            if a != b:
                mism += 1
                if mism <= 3:
                    errors.append(f"  row diff:\n    spark={a}\n    duck ={b}")
        extra = abs(len(s_sorted) - len(d_sorted))
        errors.insert(0, f"value mismatch ({mism} differing rows, {extra} extra)")
    return errors


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failed, passed, skipped = [], [], []
    for name, q in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        if q.oracle is None:
            skipped.append(name)
            print(f"  SKIP (no oracle)  {name}")
            continue
        try:
            sdf = q.builder(spark, sf_dir)
            rel = con.execute(q.oracle)
            duck_cols = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
            errors = compare(name, sdf, duck_rows, duck_cols)
        except Exception as e:  # noqa: BLE001
            errors = [f"EXCEPTION: {type(e).__name__}: {e}"]
        if errors:
            failed.append(name)
            print(f"  FAIL  {name}")
            for e in errors[:5]:
                print(f"        {e}")
        else:
            passed.append(name)
            print(f"  ok    {name}")
    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(skipped)} rows-only")
    if failed:
        print("failed:", " ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
