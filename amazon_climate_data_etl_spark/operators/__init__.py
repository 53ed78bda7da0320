"""Query/operator builders.

Each module exposes:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` — named
  DataFrame-API query builders over the testdata catalog, and
- ``ORACLE: dict[str, str]`` — the ANSI-SQL twin of each query, runnable by
  DuckDB on the same parquet tables (driver correctness gate).

``__spark_entry__.py`` at the repo root merges them all.
"""
