"""Relationalization ingest jobs: NetCDF grids and shapefile dimensions.

Reference inputs (``/root/reference/scripts/process_climate_amazon_annual.py``):
- 7 single-variable NetCDF files, dims (time, lat, lon), lazily opened with
  dask chunking (:188-253) — S1.
- an IBGE municipality shapefile reduced to centroids (:125-168) — S2.

Spark-first design: both become **one-time ingest jobs** producing Parquet;
the query layer never touches NetCDF/SHP. The NetCDF job distributes via
``spark.read.format("binaryFile")`` + ``mapInPandas`` (one file per task,
xarray inside the Arrow batch iterator); at 100 TB of grids you'd partition
output by (var, year) so downstream year filters prune partitions.

The heavy libs (xarray/netCDF4/geopandas) are NOT in this container, so the
decode step is import-gated: the Spark plumbing (schemas, batch iteration,
partitioned write) is real and tested via ``_grid_rows_from_fake`` below.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

GRID_DAILY_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("var", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

MUNICIPALITIES_SCHEMA = T.StructType(
    [
        T.StructField("CD_MUN", T.StringType()),
        T.StructField("NM_MUN", T.StringType()),
        T.StructField("UF", T.StringType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]
)

# IBGE code prefix → state, the reference's fallback mapping
# (process_climate_amazon_annual.py:146-152)
IBGE_PREFIX_TO_UF = {
    "11": "RO", "12": "AC", "13": "AM", "14": "RR",
    "15": "PA", "16": "AP", "17": "TO",
}

NORTHERN_STATES = ("AC", "AM", "AP", "PA", "RO", "RR", "TO")


def _decode_netcdf_batch(
    batches: Iterator[pd.DataFrame], var_name: str
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binaryFile rows → long-format grid rows.

    Each input row is (path, modificationTime, length, content); xarray
    opens the bytes and emits (date, lat, lon, var, value). Import-gated:
    raises a clear error when xarray is unavailable (this container).
    """
    try:
        import io

        import xarray as xr  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env without xarray
        raise NotImplementedError(
            "NetCDF decode requires xarray+netCDF4; run the ingest job in an "
            "environment with them installed. The Spark plumbing around this "
            "decoder is exercised by tests via a fake decoder."
        ) from exc
    for pdf in batches:  # pragma: no cover - env without xarray
        for _, row in pdf.iterrows():
            ds = xr.open_dataset(io.BytesIO(row["content"]))
            da = ds[var_name]
            long = da.to_dataframe().reset_index()
            long = long.rename(columns={"time": "date", var_name: "value"})
            long["var"] = var_name
            long["date"] = pd.to_datetime(long["date"]).dt.date
            yield long[["date", "lat", "lon", "var", "value"]]


def ingest_netcdf_to_parquet(
    spark: SparkSession, nc_glob: str, out_path: str, var_name: str
) -> None:
    """Distributed NetCDF → Parquet relationalization (S1 ingest boundary).

    One task per file; output partitioned by year so every downstream
    time-ranged query prunes partitions (the reference's manual time-chunk
    logic, annual.py:58-62, becomes storage layout)."""
    from amazon_climate_data_etl_spark.session import ship_package_to_workers

    ship_package_to_workers(spark)
    raw = spark.read.format("binaryFile").load(nc_glob)
    grid = raw.mapInPandas(
        lambda it: _decode_netcdf_batch(it, var_name), schema=GRID_DAILY_SCHEMA
    )
    (
        grid.withColumn("year", F.year("date"))
        .repartition("year")
        .write.partitionBy("year")
        .mode("overwrite")
        .parquet(out_path)
    )


def pivot_grid_wide(grid_long: DataFrame) -> DataFrame:
    """long (date, lat, lon, var, value) → wide (date, lat, lon, <var> …),
    the 7-way series assembly (J2, annual.py:324-333) as one pivot."""
    return (
        grid_long.groupBy("date", "lat", "lon")
        .pivot("var")
        .agg(F.first("value"))
    )


def municipalities_from_shapefile(
    spark: SparkSession, shp_path: str, states: tuple[str, ...] = NORTHERN_STATES
) -> DataFrame:
    """Shapefile → centroid dimension table (S2, annual.py:125-168).

    Geometry work (CRS normalize → centroid) happens driver-side via
    geopandas — a ~5,570-row table does not need distribution. Import-gated
    here; ``municipalities_from_pandas`` is the tested entry."""
    try:
        import geopandas as gpd
    except ImportError as exc:  # pragma: no cover - env without geopandas
        raise NotImplementedError(
            "Shapefile ingest requires geopandas; precompute the centroid "
            "table offline and load it with municipalities_from_pandas."
        ) from exc
    gdf = gpd.read_file(shp_path)  # pragma: no cover - env without geopandas
    state_col = next(
        (c for c in ("SIGLA_UF", "SIGLA", "UF", "sigla_uf") if c in gdf.columns), None
    )
    if state_col is None:
        gdf["UF"] = gdf["CD_MUN"].astype(str).str[:2].map(IBGE_PREFIX_TO_UF)
        state_col = "UF"
    gdf = gdf[gdf[state_col].isin(states)]
    if gdf.crs is None or gdf.crs.to_epsg() != 4326:
        gdf = gdf.to_crs(4326)
    cent = gdf.geometry.centroid
    pdf = pd.DataFrame(
        {
            "CD_MUN": gdf["CD_MUN"].astype(str),
            "NM_MUN": gdf["NM_MUN"].astype(str),
            "UF": gdf[state_col].astype(str),
            "lon": cent.x,
            "lat": cent.y,
        }
    )
    return municipalities_from_pandas(spark, pdf)


def municipalities_from_pandas(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Centroid table (any provenance) → broadcast-ready Spark dimension."""
    return spark.createDataFrame(pdf, schema=MUNICIPALITIES_SCHEMA)
