"""Ingest boundary: the mapInPandas grid-relationalization plumbing (S1)
exercised with a deterministic fake decoder (xarray absent in this env),
plus the long→wide pivot (J2)."""

from __future__ import annotations

from collections.abc import Iterator
from datetime import date

import pandas as pd
from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.session import ship_package_to_workers
from amazon_climate_data_etl_spark.sources.ingest import (
    GRID_DAILY_SCHEMA,
    pivot_grid_wide,
)


def test_binaryfile_mapinpandas_plumbing(spark, tmp_path):
    # nested so cloudpickle ships it by value (test modules aren't
    # importable from Python workers)
    def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Stands in for _decode_netcdf_batch: same batch shape,
        deterministic values derived from file size instead of NetCDF."""
        for pdf in batches:
            for _, row in pdf.iterrows():
                n = int(row["length"])
                yield pd.DataFrame(
                    {
                        "date": [date(2001, 1, 1 + i % 28) for i in range(n)],
                        "lat": [-10.0 + 0.25 * (i % 4) for i in range(n)],
                        "lon": [-65.0 + 0.25 * (i % 4) for i in range(n)],
                        "var": ["Tmax"] * n,
                        "value": [28.0 + (i % 10) for i in range(n)],
                    }
                )

    for i in range(3):
        (tmp_path / f"f{i}.nc").write_bytes(b"x" * (8 + i))
    ship_package_to_workers(spark)
    raw = spark.read.format("binaryFile").load(str(tmp_path / "*.nc"))
    grid = raw.mapInPandas(_fake_decode, schema=GRID_DAILY_SCHEMA)
    out = grid.groupBy("var").agg(F.count(F.lit(1)).alias("n")).collect()
    assert out[0]["var"] == "Tmax"
    assert out[0]["n"] == 8 + 9 + 10
    assert [f.name for f in grid.schema.fields] == ["date", "lat", "lon", "var", "value"]


def test_pivot_long_to_wide(spark):
    long = spark.createDataFrame(
        [
            (date(2001, 1, 1), -10.0, -65.0, "Tmax", 30.0),
            (date(2001, 1, 1), -10.0, -65.0, "Tmin", 20.0),
            (date(2001, 1, 2), -10.0, -65.0, "Tmax", 31.0),
        ],
        GRID_DAILY_SCHEMA,
    )
    wide = pivot_grid_wide(long).orderBy("date")
    rows = wide.collect()
    assert set(wide.columns) == {"date", "lat", "lon", "Tmax", "Tmin"}
    assert rows[0]["Tmax"] == 30.0 and rows[0]["Tmin"] == 20.0
    assert rows[1]["Tmin"] is None
