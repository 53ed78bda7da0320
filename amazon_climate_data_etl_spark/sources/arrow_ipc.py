"""Arrow IPC file (Feather v2) source/sink — the interchange format of the
pandas/Polars/DuckDB tooling ecosystem, supported as an ingest boundary so
datasets shipped as ``.arrow`` files drop straight into the engine.

Both directions are DISTRIBUTED and collect-free:

- read: ``binaryFile`` scan of the ``.arrow`` objects → Arrow-batched
  ``mapInPandas`` decode, one task per file — the same chunk-object
  parallelism shape as the Zarr boundary (an IPC *file* must be decoded
  whole: its footer indexes the record batches, so the file is the task
  unit; a 100 TB dataset arrives as many files, which is exactly what the
  per-file fan-out wants). Schema is probed driver-side from ONE file's
  Arrow schema (footer metadata only — pyarrow memory-maps it without
  reading data buffers).
- write: one IPC file per Spark partition, written executor-side inside
  ``mapInPandas``; the returned manifest frame (file, n_rows) is the only
  thing that crosses to the driver. Paths must be on shared storage in a
  real cluster (this box: local FS).

pyarrow is a baked-in dependency of PySpark's Arrow exchange, so unlike the
NetCDF/Zarr/GeoTIFF codecs there is nothing to hand-roll — the value here
is the distributed plumbing and the exact-roundtrip guarantee (tested for
string/numeric and list<float> embedding columns)."""

from __future__ import annotations

import glob
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_MANIFEST_SCHEMA = "file string, n_rows long"


def write_arrow_ipc(df: DataFrame, path: str, compression: str | None = None) -> list:
    """Write ``df`` as one Arrow IPC file per partition under ``path``.

    Returns the collected manifest rows (one per non-empty partition) —
    a |partitions|-bounded driver payload, never data."""
    from amazon_climate_data_etl_spark.session import ship_package_to_workers

    ship_package_to_workers(df.sparkSession)
    os.makedirs(path, exist_ok=True)

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        writer, n = None, 0
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        options = (
            pa.ipc.IpcWriteOptions(compression=compression) if compression else None
        )
        for pdf in batches:
            table = pa.Table.from_pandas(pdf, preserve_index=False)
            if writer is None:
                writer = pa.ipc.new_file(fname, table.schema, options=options)
            writer.write_table(table)
            n += len(pdf)
        if writer is not None:
            writer.close()
            yield pd.DataFrame({"file": [fname], "n_rows": [n]})

    return df.mapInPandas(worker, schema=_MANIFEST_SCHEMA).collect()


def probe_arrow_schema(spark: SparkSession, path: str):
    """Spark schema of an IPC dataset from ONE file's footer (no data
    buffers are read). Raises on an empty dataset."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_schema

    files = sorted(glob.glob(os.path.join(path, "*.arrow")))
    if not files:
        raise FileNotFoundError(f"no .arrow files under {path!r}")
    reader = pa.ipc.open_file(files[0])
    return from_arrow_schema(reader.schema)


def read_arrow_ipc(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Distributed IPC scan: one decode task per ``.arrow`` file."""
    from amazon_climate_data_etl_spark.session import ship_package_to_workers

    ship_package_to_workers(spark)
    if schema is None:
        schema = probe_arrow_schema(spark, path)
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.arrow")
        .load(os.path.abspath(path))
    )

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa

        cols = [f.name for f in schema.fields]
        for pdf in batches:
            for content in pdf["content"]:
                reader = pa.ipc.open_file(pa.BufferReader(bytes(content)))
                out = reader.read_all().to_pandas()
                yield out[cols]

    return raw.mapInPandas(worker, schema=schema)
