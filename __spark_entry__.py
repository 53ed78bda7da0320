"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2 + extensions),
keyed by name; each callable is ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-runnable ANSI-SQL twin for each query (omitted
only for genuinely non-SQL-expressible ops, which get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from amazon_climate_data_etl_spark.operators import (
    climate,
    dedup,
    events,
    joins,
    relational,
    similarity,
    textops,
)
from amazon_climate_data_etl_spark.operators._portable import portable_sql_rounds
from amazon_climate_data_etl_spark.sources import multimodal

# Registry order is load-bearing: the driver's correctness gate checks the
# FIRST 50 registered queries. Rounds 1-2 verified relational/joins/climate
# (two rounds of green driver rows); round 3 front-loads the families that
# have never been through the driver's hash gate — dedup, similarity,
# events, multimodal — so they get CORRECTNESS rows, with the longest-green
# relational family absorbing the tail cut.
_MODULES = (dedup, similarity, events, multimodal, textops, climate, joins, relational)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-shaped pricing
    summary — scan → pushed filter → 2-phase hash agg → sort (the
    reference's annual-pipeline spine, SURVEY.md §3)."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        # rewrite round(x, n) into the decimal-stable form so the DuckDB
        # oracle rounds bit-identically to the Spark side (_portable.py)
        out.update({k: portable_sql_rounds(v) for k, v in mod.ORACLE.items()})
    return out
