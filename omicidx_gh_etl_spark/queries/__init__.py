"""Query registry — import all query modules to populate REGISTRY."""

from . import advanced, core, llmops, streaming_ops, tpch  # noqa: F401  (registration)
from .base import REGISTRY, Query, oracle_queries, register, spark_queries

__all__ = [
    "REGISTRY",
    "Query",
    "register",
    "spark_queries",
    "oracle_queries",
]
