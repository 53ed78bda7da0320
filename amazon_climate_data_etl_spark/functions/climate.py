"""Climate-domain scalar expressions.

Reference semantics (``/root/reference/scripts/process_climate_amazon_annual.py:100-122``
and ``README.md:169-173``):

    tmean = (Tmax + Tmin) / 2
    es    = 0.6108 * exp(17.27 * tmean / (tmean + 237.3))   # kPa, Tetens
    ea    = es * RH / 100
    VPD   = es - ea = es * (1 - RH/100)

Crucially VPD is computed on **daily** rows *before* any aggregation
(mean-of-daily-VPD ≠ VPD-of-mean-temperatures) — the pipeline operators in
``operators/climate.py`` preserve that ordering (SURVEY.md §7 "ordering traps").

All of these are pure Column expressions: they stay inside whole-stage
codegen, vectorize in the Tungsten batch loop, and cost nothing extra at
100 TB scale versus any built-in arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def saturation_vapor_pressure(t_celsius: Column) -> Column:
    """Tetens saturation vapor pressure (kPa) at temperature ``t_celsius``."""
    return F.lit(0.6108) * F.exp(F.lit(17.27) * t_celsius / (t_celsius + F.lit(237.3)))


def vpd_column(tmax: Column, tmin: Column, rh: Column) -> Column:
    """Vapor-pressure deficit (kPa) from daily Tmax/Tmin (°C) and RH (%)."""
    tmean = (tmax + tmin) / F.lit(2.0)
    es = saturation_vapor_pressure(tmean)
    return es * (F.lit(1.0) - rh / F.lit(100.0))


# ANSI-SQL twin of vpd_column, usable by the DuckDB oracle and spark.sql alike.
def vpd_sql(tmax: str, tmin: str, rh: str) -> str:
    return (
        f"(0.6108 * exp(17.27 * (({tmax} + {tmin}) / 2) / ((({tmax} + {tmin}) / 2) + 237.3))"
        f" * (1 - {rh} / 100))"
    )


def grid_snap(coord: Column, step: float = 0.25) -> Column:
    """Snap a coordinate to the nearest multiple of ``step``.

    The reference's nearest-grid-cell lookup
    (``process_climate_amazon_annual.py:266-269``, xarray ``method='nearest'``)
    on a regular grid is pure arithmetic: round(x/step)*step. Applying this on
    the *dimension* side turns the NN join into a broadcast equi-join with no
    shuffle of the fact table (SURVEY.md §2 J-NN).

    Round 7: snapping is computed as sign-split floor arithmetic —
    ``±floor(|x·inv| + 0.5) / inv`` — so the Spark column and the SQL twin
    execute the IDENTICAL IEEE operation sequence (same multiply, abs,
    add, floor in both engines). Previously Spark used ``F.round``
    (BigDecimal HALF_UP on the exact binary value) while the oracle's
    ``round`` was rewritten to the portable floor form: a one-ulp
    divergence waiting on a coordinate landing exactly on a half-step
    tie. Ties snap HALF-AWAY-FROM-ZERO, the behavior the climate goldens
    pin (test_tie_break_snaps_away_from_zero) — the floor split preserves
    it exactly while removing the cross-engine ambiguity.
    """
    inv = 1.0 / step
    y = coord * F.lit(inv)
    snapped = F.when(y < 0, -F.floor(-y + F.lit(0.5))).otherwise(
        F.floor(y + F.lit(0.5))
    )
    return snapped.cast("double") / F.lit(inv)


def grid_snap_sql(expr: str, step: float = 0.25) -> str:
    inv = 1.0 / step
    y = f"(({expr}) * {inv!r})"
    return (
        f"(CAST(CASE WHEN {y} < 0 THEN -floor(-{y} + 0.5) "
        f"ELSE floor({y} + 0.5) END AS DOUBLE) / {inv!r})"
    )
