"""Golden parity against the REFERENCE'S OWN COMMITTED OUTPUTS.

The raw NetCDF inputs are absent from the reference checkout
(.MISSING_LARGE_BLOBS), so the upstream half of the pipeline cannot be
re-run — but the downstream half can be tested for real: read the
committed annual master CSV (processed_output_data/
Climate_Amazon_North_2001-2024.csv, 10,800 rows), re-derive the by-state
split + per-state metrics with OUR operators (the Spark form of
split_by_state.py:39-75), and compare bit-for-bit against the committed
by_state/*.csv files; then assert the README validation numbers
(README.md:147-154) as point lookups via spot_check.

This replaces synthetic-fixture-only golden coverage with the reference's
actual data. Reference citations: split_by_state.py:54 (equality filter),
:64-71 (per-state count/nunique metrics), README.md:147-154 +
validation notebook cell 2 (2015 spot values).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.operators.climate import (
    spot_check,
    state_split_metrics,
)

REF_OUT = "/root/reference/processed_output_data"
ANNUAL_MASTER = os.path.join(REF_OUT, "Climate_Amazon_North_2001-2024.csv")
NORTHERN_STATES = ["AC", "AM", "AP", "PA", "RO", "RR", "TO"]

pytestmark = pytest.mark.skipif(
    not os.path.exists(ANNUAL_MASTER),
    reason="reference committed outputs not available",
)


def _read_ref_csv(spark, path):
    """S3 scan of a reference CSV (utf-8-sig): strip the BOM if the reader
    surfaces it in the first header cell, keep CD_MUN as a string key."""
    df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    first = df.columns[0]
    if first.startswith("﻿"):
        df = df.withColumnRenamed(first, first.lstrip("﻿"))
    return df.withColumn("CD_MUN", F.col("CD_MUN").cast("string"))


@pytest.fixture(scope="module")
def annual_master(spark):
    return _read_ref_csv(spark, ANNUAL_MASTER)


def test_annual_master_invariants(annual_master):
    """The inline invariants the reference prints at the end of every run
    (process_climate_amazon_annual.py:513-522)."""
    got = annual_master.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("CD_MUN").alias("muns"),
        F.min("year").alias("y0"),
        F.max("year").alias("y1"),
    ).collect()[0]
    assert got["n"] == 10_800
    assert got["muns"] == 450
    assert (got["y0"], got["y1"]) == (2001, 2024)


def test_by_state_split_exact_parity(annual_master, spark):
    """Our partitioned-split semantics (filter per UF) must reproduce the
    committed by_state annual files byte-for-value: same rows, same column
    order, same values."""
    master = annual_master.toPandas()
    for state in NORTHERN_STATES:
        committed_path = os.path.join(
            REF_OUT, "by_state", f"Climate_{state}_Annual_2001-2024.csv"
        )
        got = (
            annual_master.filter(F.col("UF") == state)
            .toPandas()
            .sort_values(["CD_MUN", "year"])
            .reset_index(drop=True)
        )
        want = pd.read_csv(committed_path, encoding="utf-8-sig", dtype={"CD_MUN": str})
        want = want.sort_values(["CD_MUN", "year"]).reset_index(drop=True)
        assert list(got.columns) == list(want.columns), state
        pd.testing.assert_frame_equal(got, want, check_dtype=False), state
    # split is a partition of the master: no rows lost or duplicated
    assert sum(
        len(master[master["UF"] == s]) for s in NORTHERN_STATES
    ) == len(master)


def test_state_metrics_match_committed_files(annual_master, spark):
    """state_split_metrics (split_by_state.py:64-71: records + nunique per
    state) against counts recomputed from the committed per-state files."""
    got = {
        r["UF"]: (r["n_records"], r["n_municipalities"])
        for r in state_split_metrics(annual_master).collect()
    }
    for state in NORTHERN_STATES:
        committed = pd.read_csv(
            os.path.join(REF_OUT, "by_state", f"Climate_{state}_Annual_2001-2024.csv"),
            encoding="utf-8-sig",
        )
        assert got[state] == (len(committed), committed["CD_MUN"].nunique()), state


def test_monthly_union_invariants(spark):
    """The monthly master is not committed; reconstruct it as the union of
    the 7 per-state monthly files (U1) and assert the documented totals:
    450 muns × 279 year-months = 125,550 rows, 2024 truncated at March
    (README.md:168, SURVEY §1.3)."""
    paths = [
        os.path.join(REF_OUT, "by_state", f"Climate_{s}_Monthly_2001-2024.csv")
        for s in NORTHERN_STATES
    ]
    monthly = _read_ref_csv(spark, paths[0])
    for p in paths[1:]:
        monthly = monthly.unionByName(_read_ref_csv(spark, p))
    got = monthly.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("CD_MUN").alias("muns"),
        F.countDistinct("year", "month").alias("ym"),
        F.max(F.col("year") * 100 + F.col("month")).alias("last_ym"),
        F.min("month").alias("m0"),
        F.max("month").alias("m1"),
    ).collect()[0]
    assert got["n"] == 125_550
    assert got["muns"] == 450
    assert got["ym"] == 279
    assert got["last_ym"] == 202403  # 2024 truncated at March
    assert (got["m0"], got["m1"]) == (1, 12)


def test_readme_validation_spot_checks(annual_master):
    """README.md:147-154 / notebook cell 2: the 2015 El Niño year values
    for Belém (CD_MUN 1501402) and Manaus (1302603) as point lookups."""
    belem = spot_check(annual_master, "1501402", 2015).collect()
    assert len(belem) == 1
    b = belem[0]
    assert (b["NM_MUN"], b["UF"]) == ("Belém", "PA")
    assert b["pr"] == 2380.78 and b["Tmax"] == 32.87 and b["Tmin"] == 23.53

    manaus = spot_check(annual_master, "1302603", 2015).collect()
    assert len(manaus) == 1
    m = manaus[0]
    assert (m["NM_MUN"], m["UF"]) == ("Manaus", "AM")
    assert m["pr"] == 1874.09 and m["Tmax"] == 33.17 and m["VPD"] == 0.93
