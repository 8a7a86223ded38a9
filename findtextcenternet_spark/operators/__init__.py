"""Pipeline operators (SURVEY.md §2): detect, group, decode, assemble,
dedup, similarity — each a pure NumPy kernel plus a Spark UDF wrapper."""
