"""Relational plans: SURVEY.md §2 operators + training-data ops, each as a
native Catalyst query with a DuckDB oracle."""

from __future__ import annotations


def full_registry():
    """Import every plan module and return the central registry (one dict
    in registry_core — import-order independent by construction)."""
    from . import (  # noqa: F401 (register into registry_core on import)
        multimodal_plans,
        relational,
        training_data,
        webgraph,
    )
    from .registry_core import registry

    return registry()


def curated_registry():
    """Driver-facing ≤50-entry registry (see curated.py)."""
    from .curated import curated_registry as _cur

    return _cur()
