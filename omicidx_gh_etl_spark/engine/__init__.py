from .dag import DagCycleError, downstream_closure, topo_sort, upstream_closure
from .runner import RunResult, WarehouseRunner

__all__ = [
    "topo_sort",
    "upstream_closure",
    "downstream_closure",
    "DagCycleError",
    "WarehouseRunner",
    "RunResult",
]
