"""Cross-engine deterministic aggregation helpers.

Floating-point SUM/AVG are order-dependent: Spark's partial/final hash
aggregation adds in partition order, DuckDB adds sequentially, so raw
``sum(double)`` can differ in the low bits and flip a rounded digit. The
fix is to aggregate through exact DECIMAL (addition is associative and
order-independent), then cast the exact result to double — both engines then
produce the *identical* IEEE value, and any further rounding is deterministic.

This costs one extra cast per row inside codegen — negligible — and is the
same trick production pipelines use for money columns at 100 TB scale, where
"sum differs per run" is a real reconciliation bug, not a rounding nit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scale=4 keeps the inputs exact (testdata has ≤2 decimals) with headroom.
_DEC = "decimal(18,4)"


def dsum(col: Column) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(col.cast(_DEC)).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE)"


def davg(col: Column) -> Column:
    """Order-independent mean: exact decimal sum / count, in double."""
    return F.sum(col.cast(_DEC)).cast("double") / F.count(col)


def davg_sql(expr: str) -> str:
    return f"(CAST(sum(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE) / count({expr}))"


def dstddev(col: Column) -> Column:
    """Order-independent sample stddev.

    The square is computed in double (deterministic per-row — identical
    IEEE multiply in both engines), then rounded into a decimal for the
    order-independent sum; sum and sum-of-squares feed the textbook formula.
    """
    n = F.count(col).cast("double")
    s = F.sum(col.cast(_DEC)).cast("double")
    sq = F.sum((col * col).cast("decimal(30,10)")).cast("double")
    return F.sqrt((sq - s * s / n) / (n - F.lit(1.0)))


def dstddev_sql(expr: str) -> str:
    n = f"CAST(count({expr}) AS DOUBLE)"
    s = f"CAST(sum(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE)"
    sq = f"CAST(sum(CAST((({expr}) * ({expr})) AS DECIMAL(30,10))) AS DOUBLE)"
    return f"sqrt(({sq} - {s} * {s} / {n}) / ({n} - 1.0))"


def dec(col: Column, precision: int = 18, scale: int = 4) -> Column:
    """Cast a base (stored) column to exact decimal.

    Safe only on *stored* columns whose values were generated with ≤`scale`
    decimal digits: their doubles sit ~1e-13 from the true decimal, far from
    any rounding tie, so both engines cast identically. Do NOT use on
    computed doubles — compute in decimal instead (multiplication of exact
    decimals is exact and associative, so sums are order-independent and
    bit-identical across engines).
    """
    return col.cast(f"decimal({precision},{scale})")


def dec_sql(expr: str, precision: int = 18, scale: int = 4) -> str:
    return f"CAST(({expr}) AS DECIMAL({precision},{scale}))"


def stable_round(col: Column, scale: int = 2) -> Column:
    """Engine-portable round of a double.

    ``round(double, n)`` differs between engines on half-boundary values
    (Spark rounds the exact binary expansion via BigDecimal; DuckDB scales
    by 10^n in floating point first). Routing through DECIMAL(24,10) makes
    both engines see the same exact decimal value, and decimal rounding is
    half-away-from-zero in both.

    Domain contract: bit-exact while |x|·10^scale < 2^53. Beyond that the
    rounded value needs more significant digits than a double carries, and
    DuckDB's wide-decimal round detours through double internally, drifting
    one ulp from Spark's exact-decimal path (boundary located by hypothesis
    in tests/test_property_portable.py; e.g. 922337205.0 at scale 8).
    Every round in this engine is scale ≤ 6 on magnitudes < 1e10, or scale
    10 on log-probabilities |x| < 100 — all safely inside the contract.
    """
    return F.round(col.cast("decimal(24,10)"), scale).cast("double")


def stable_round_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(round(CAST(({expr}) AS DECIMAL(24,10)), {scale}) AS DOUBLE)"


def portable_sql_rounds(sql: str) -> str:
    """Rewrite every ``round(expr, n)`` in an oracle SQL string to the
    decimal-stable form (see ``stable_round``), so the DuckDB oracle rounds
    exactly like the Spark side. Handles nesting via paren matching."""
    out = []
    i = 0
    n = len(sql)
    while i < n:
        m = sql.find("round(", i)
        # require non-identifier char before the token (skip e.g. "xround(")
        while m > 0 and (sql[m - 1].isalnum() or sql[m - 1] == "_"):
            m = sql.find("round(", m + 1)
        if m == -1:
            out.append(sql[i:])
            break
        out.append(sql[i:m])
        j = m + len("round(")
        depth = 1
        args_start = j
        top_commas = []
        while j < n and depth > 0:
            ch = sql[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                top_commas.append(j)
            elif ch == "'":
                j += 1
                while j < n and sql[j] != "'":
                    j += 1
            j += 1
        inner = sql[args_start : j - 1]
        if len(top_commas) == 1:
            split = top_commas[0] - args_start
            expr, scale = inner[:split], inner[split + 1 :]
            expr = portable_sql_rounds(expr)
            out.append(
                f"CAST(round(CAST(({expr.strip()}) AS DECIMAL(24,10)), {scale.strip()}) AS DOUBLE)"
            )
        else:
            out.append(f"round({portable_sql_rounds(inner)})")
        i = j
    return "".join(out)
