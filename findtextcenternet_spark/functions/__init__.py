"""Scalar / vectorized functions (SURVEY.md §2.8).

Each module exposes (a) a pure NumPy/pandas kernel shared with the golden
reference, and (b) where the semantics are SQL-expressible, a native Spark
Column expression so Catalyst keeps the hot path JVM-side.
"""
