from .catalog import (
    build_catalog_json,
    build_remote_views_db,
    catalog_global_stats,
    catalog_per_table_stats,
    scan_parquet_metadata,
    write_catalog,
    write_catalog_json,
)
from .dag import DagCycleError, downstream_closure, topo_sort, upstream_closure
from .intervals import Interval, IntervalStore, daily_intervals, monthly_intervals
from .runner import RunResult, WarehouseRunner

__all__ = [
    "topo_sort",
    "upstream_closure",
    "downstream_closure",
    "DagCycleError",
    "WarehouseRunner",
    "RunResult",
    "scan_parquet_metadata",
    "catalog_global_stats",
    "catalog_per_table_stats",
    "write_catalog",
    "build_catalog_json",
    "build_remote_views_db",
    "write_catalog_json",
    "Interval",
    "IntervalStore",
    "daily_intervals",
    "monthly_intervals",
]
