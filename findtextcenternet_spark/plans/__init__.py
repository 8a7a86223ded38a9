"""Relational plans: SURVEY.md §2 operators + training-data ops, each as a
native Catalyst query with a DuckDB oracle."""

from __future__ import annotations


def full_registry():
    """Import every plan module and return the merged registry."""
    from . import relational, training_data  # noqa: F401 (register on import)

    return relational.registry()
