"""Warehouse model definitions (reference sqlmesh/models re-expressed)."""

from . import genomics  # noqa: F401  (registration side effects)
from .registry import REGISTRY, ExportConfig, Model, ModelContext, ModelRegistry, model

__all__ = [
    "REGISTRY",
    "Model",
    "ModelContext",
    "ModelRegistry",
    "ExportConfig",
    "model",
]
