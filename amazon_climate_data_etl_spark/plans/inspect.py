"""Physical-plan introspection: the feedback loop for scale design.

The reference hand-optimizes (clip-before-extract, file-per-variable column
pruning, thread fan-out — SURVEY.md §4); on Spark those properties live in
the physical plan Catalyst picks, so they can regress silently when a query
is edited. These helpers turn `.explain()` output into assertable facts —
shuffle count, broadcast-join usage, parquet-pushed filters, scanned
columns — and tests/test_plan_quality.py pins them for the flagship
queries. A plan assertion failing is the 100 TB incident caught at sf0.001:
e.g. "filter no longer reaches the scan" costs nothing locally and a full
table read at scale.

Mode notes: "simple" explain inlines operator arguments (``Exchange
hashpartitioning(...)``, ``BroadcastHashJoin ...``) so join/shuffle facts
parse from it; "formatted" explain carries per-scan ``PushedFilters`` /
``ReadSchema`` details. Counts read the AQE *initial* plan — the
conservative upper bound (AQE only removes/rewrites exchanges at runtime).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The query's physical plan as text (explain output)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def _simple(df_or_plan: DataFrame | str) -> str:
    return (
        df_or_plan
        if isinstance(df_or_plan, str)
        else plan_string(df_or_plan, "simple")
    )


def _formatted(df_or_plan: DataFrame | str) -> str:
    return (
        df_or_plan
        if isinstance(df_or_plan, str)
        else plan_string(df_or_plan, "formatted")
    )


def shuffle_count(df_or_plan: DataFrame | str) -> int:
    """Number of shuffle exchanges (hash/range/single/rebalance
    partitioning). Excludes BroadcastExchange — a broadcast is not a
    shuffle of the fact stream."""
    plan = _simple(df_or_plan)
    return len(
        re.findall(
            r"\bExchange (?:hash|range|single|rebalance|RoundRobin)",
            plan,
            re.IGNORECASE,
        )
    )


def broadcast_join_count(df_or_plan: DataFrame | str) -> int:
    plan = _simple(df_or_plan)
    return len(
        re.findall(r"\b(?:BroadcastHashJoin|BroadcastNestedLoopJoin)\b", plan)
    )


def sort_merge_join_count(df_or_plan: DataFrame | str) -> int:
    return len(re.findall(r"\bSortMergeJoin\b", _simple(df_or_plan)))


def pushed_filters(df_or_plan: DataFrame | str) -> list[str]:
    """Every parquet-pushed predicate across all scans, flattened."""
    plan = _formatted(df_or_plan)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df_or_plan: DataFrame | str) -> list[str]:
    """ReadSchema struct strings, one per file scan — the columns that
    actually hit storage (column-pruning check)."""
    plan = _formatted(df_or_plan)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def scanned_columns(df_or_plan: DataFrame | str) -> set[str]:
    """Union of column names read from storage across all scans."""
    cols: set[str] = set()
    for schema in read_schemas(df_or_plan):
        inner = schema[len("struct<"):].rstrip(">")
        for field in inner.split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def exchange_count(df_or_plan: DataFrame | str) -> int:
    """All Exchange operators, broadcast included."""
    plan = _simple(df_or_plan)
    return len(re.findall(r"\b(?:Exchange|BroadcastExchange)\b", plan))


def wholestage_codegen_count(df_or_plan: DataFrame | str) -> int:
    """Distinct WholeStageCodegen spans (``*(N)`` markers). Only present
    once AQE has finalized (execute the DataFrame first), or with AQE off."""
    plan = _simple(df_or_plan)
    return len(set(re.findall(r"\*\((\d+)\)", plan)))
