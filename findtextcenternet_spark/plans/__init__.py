"""Relational plans: SURVEY.md §2 operators + training-data ops, each as a
native Catalyst query with a DuckDB oracle."""

from __future__ import annotations


def full_registry():
    """Import every plan module and return the merged registry."""
    from . import (  # noqa: F401 (register on import)
        multimodal_plans,
        relational,
        training_data,
    )

    return relational.registry()
