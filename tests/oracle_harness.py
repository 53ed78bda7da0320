"""Local mirror of the driver's correctness gate: run a Spark query and its
DuckDB oracle SQL side by side, compare row count, column names, and
order-insensitive values (floats with tight tolerance)."""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return conn


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            non_null = df[c].dropna()
            if len(non_null) and all(
                isinstance(v, (dt.date, dt.datetime)) for v in non_null
            ):
                # canonicalize date/datetime objects the same way as
                # datetime64 columns so "2024-01-01" == "2024-01-01 00:00:00"
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]").astype(str)
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype family. The driver's gate hashes raw values, so an int64
    Spark column against a float64 oracle column (DuckDB sum(BIGINT) →
    HUGEINT → float64) hash-mismatches even when every value is numerically
    equal — exactly the failure mode this classifier surfaces locally."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if s.dtype == object:
        # Spark DateType arrives in pandas as object-of-datetime.date; that
        # is the datetime family, same as DuckDB's DATE → datetime64[us]
        non_null = s.dropna()
        if len(non_null) and all(isinstance(v, (dt.date, dt.datetime)) for v in non_null):
            return "datetime"
    return "other"


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}")
        return problems
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
        )
        return problems
    # dtype-family strictness BEFORE value comparison: mirror the driver's
    # hash gate, which does not forgive int-vs-float even at equal values
    for c in sorted(spark_pdf.columns):
        ca, cb = _dtype_class(spark_pdf[c]), _dtype_class(oracle_pdf[c])
        if ca != cb:
            problems.append(
                f"{name}.{c}: dtype family mismatch: spark {spark_pdf[c].dtype}"
                f" ({ca}) vs oracle {oracle_pdf[c].dtype} ({cb})"
            )
    if problems:
        return problems
    a, b = _normalize(spark_pdf.copy()), _normalize(oracle_pdf.copy())
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            both_nan = av.isna() & bv.isna()
            close = both_nan | (
                (av - bv).abs() <= (1e-9 + 1e-9 * bv.abs())
            )
            if not close.all():
                idx = (~close).idxmax()
                problems.append(
                    f"{name}.{c}: value mismatch at sorted-row {idx}: "
                    f"{av[idx]!r} vs {bv[idx]!r}"
                )
        else:
            if not av.astype(str).equals(bv.astype(str)):
                neq = av.astype(str) != bv.astype(str)
                idx = neq.idxmax()
                problems.append(
                    f"{name}.{c}: value mismatch at sorted-row {idx}: "
                    f"{av[idx]!r} vs {bv[idx]!r}"
                )
    return problems


def exact_float_mismatches(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> int:
    """Count float cells that are not bit-identical (driver may hash exact)."""
    a, b = _normalize(spark_pdf.copy()), _normalize(oracle_pdf.copy())
    n = 0
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av = pd.to_numeric(a[c], errors="coerce")
            bv = pd.to_numeric(b[c], errors="coerce")
            for x, y in zip(av, bv):
                if (isinstance(x, float) and math.isnan(x)) and (
                    isinstance(y, float) and math.isnan(y)
                ):
                    continue
                if x != y:
                    n += 1
    return n
