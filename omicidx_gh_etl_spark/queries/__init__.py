"""Query registry — import all query modules to populate REGISTRY."""

from . import (  # noqa: F401  (registration)
    advanced,
    core,
    llmops,
    parsers,
    reshape,
    scoring,
    streaming_ops,
    tpch,
)
from .base import REGISTRY, Query, oracle_queries, register, spark_queries

__all__ = [
    "REGISTRY",
    "Query",
    "register",
    "spark_queries",
    "oracle_queries",
]
