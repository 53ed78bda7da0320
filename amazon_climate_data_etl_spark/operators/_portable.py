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
    """Order-independent sample stddev from exact decimal moments.

    Both moments are computed in EXACT decimal arithmetic: the input is
    cast to decimal(18,4) once (exact for money-shaped stored columns,
    the dsum contract) and SQUARED IN DECIMAL — decimal×decimal is exact
    in both engines, where the previous double-square-then-cast route hit
    DuckDB's lossy double→wide-decimal cast (the same defect class the
    round-6 review found in stable_round; hypothesis falsified it here
    with [0.0, 1e10] — decimal overflow — and near-ties below that).

    The variance term is clamped at 0 before the sqrt: with a huge mean
    and a tiny spread the double cancellation ``sq - s²/n`` lands a few
    ulps NEGATIVE, where Spark's sqrt returns NaN but DuckDB's sqrt
    RAISES (hypothesis falsifier: [1e9, 1e9, 1e9+0.01]). greatest(x, 0.0)
    is the same IEEE comparison in both engines (and both propagate the
    n=1 NaN through greatest and sqrt), so the clamp keeps bit-equality
    while turning cancellation noise into the mathematically-right 0.0.

    Domain contract: bit-exact for ≤4-decimal inputs while the exact
    moments convert to double without double-rounding divergence —
    |Σx|·10⁴ < 2^53 and |Σx²|·10⁸ < 2^53 (inside it, DuckDB's
    int→double→÷10^k two-step and Spark's single BigDecimal conversion
    are both exact). Beyond it both engines stay deterministic and agree
    except when the int→double rounding lands exactly on a ÷10^k tie —
    which the engine's own summary-stat columns (prices ≤ 1e5) round
    away; a 100 TB revenue column would budget wider decimal moments.
    """
    n = F.count(col).cast("double")
    d = col.cast(_DEC)
    s = F.sum(d).cast("double")
    sq = F.sum(d * d).cast("double")
    var = (sq - s * s / n) / (n - F.lit(1.0))
    return F.sqrt(F.greatest(var, F.lit(0.0)))


def dstddev_sql(expr: str) -> str:
    n = f"CAST(count({expr}) AS DOUBLE)"
    d = f"CAST(({expr}) AS DECIMAL(18,4))"
    s = f"CAST(sum({d}) AS DOUBLE)"
    # DECIMAL(19,4) operands force DuckDB's int128 multiply path — at
    # width 18 it multiplies in int64 storage and overflows on values
    # past ~9.6e5 (same exact products either way; Spark's (18,4)² is
    # already a (37,8) exact multiply)
    d2 = f"CAST(({expr}) AS DECIMAL(19,4))"
    sq = f"CAST(sum({d2} * {d2}) AS DOUBLE)"
    return f"sqrt(greatest(({sq} - {s} * {s} / {n}) / ({n} - 1.0), 0.0))"


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
    """Engine-portable round of a double: floor(x·10^scale + 0.5) / 10^scale.

    ``round(double, n)`` differs between engines on half-boundary values, and
    so does every decimal-cast detour: Spark's double→decimal cast rounds the
    exact binary expansion via BigDecimal while DuckDB's multiplies by 10^n in
    floating point first, so any double whose exact value sits within half an
    ulp of a decimal tie can round opposite ways (round 6 falsified the old
    decimal(24,10) route with x=461168602.2265625, scale=6 — a true binary
    half-tie that DuckDB's lossy double→decimal(24,10) cast perturbed).

    The fix is to stop asking two different exact-decimal implementations to
    agree and instead make both engines execute the *identical IEEE-754
    operation sequence*: one double multiply by the exactly-representable
    power of ten, one double add of 0.5, floor (exact), an exact
    integer→double cast, one double divide. Each step is deterministic and
    defined bit-for-bit by IEEE 754, so the engines cannot diverge — verified
    by an adversarial sweep of 71k+ near-tie doubles at scales 0-10 (zero
    mismatches; the decimal forms fail hundreds of times on the same sweep).

    Semantics: round-half-up toward +infinity of the IEEE product
    double(x·10^scale) — e.g. -2.5 → -2 at scale 0. This is a deliberate,
    documented choice: cross-engine bit-equality is the contract, and on any
    value not within one ulp of a tie it equals true decimal half-away
    rounding.

    Domain contract: bit-exact for finite x while |x|·10^scale ≤ 2^52
    (beyond that floor's integer result no longer converts exactly to
    double). Every round in this engine is scale ≤ 6 on magnitudes < 1e10,
    or scale 10 on log-probabilities |x| < 100 — all inside the contract.
    Property-tested across the full domain in tests/test_property_portable.py.
    """
    p10 = F.lit(10.0**scale)
    return (F.floor(col * p10 + F.lit(0.5)).cast("double") / p10)


def stable_round_sql(expr: str, scale: int = 2) -> str:
    p10 = repr(10.0**scale)
    return f"(CAST(floor(({expr}) * {p10} + 0.5) AS DOUBLE) / {p10})"


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
            out.append(stable_round_sql(expr.strip(), int(scale.strip())))
        else:
            out.append(f"round({portable_sql_rounds(inner)})")
        i = j
    return "".join(out)
