"""Arrow IPC (Feather v2) boundary: distributed write → distributed read
must roundtrip EXACTLY, including the list<float> embedding column; schema
probing reads only one file's footer; per-partition files materialize."""

from __future__ import annotations

import glob
import os

import pytest

from amazon_climate_data_etl_spark.catalog import load_table
from amazon_climate_data_etl_spark.sources.arrow_ipc import (
    probe_arrow_schema,
    read_arrow_ipc,
    write_arrow_ipc,
)

SF = "/root/testdata/sf0.001"


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


def test_documents_roundtrip_exact(spark, tmp_path):
    src = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_arrow")
    manifest = write_arrow_ipc(src.repartition(4), path)
    assert sum(m.n_rows for m in manifest) == src.count()
    assert len(manifest) == len(glob.glob(os.path.join(path, "*.arrow"))) >= 2
    back = read_arrow_ipc(spark, path)
    assert back.schema == probe_arrow_schema(spark, path)
    assert _sorted_rows(back, "doc_id") == _sorted_rows(src, "doc_id")


def test_embeddings_roundtrip_with_array_column(spark, tmp_path):
    src = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "emb_arrow")
    write_arrow_ipc(src, path)
    back = read_arrow_ipc(spark, path)
    a = {r.vec_id: (list(r.embedding) if r.embedding is not None else None, r.label)
         for r in back.collect()}
    b = {r.vec_id: (list(r.embedding) if r.embedding is not None else None, r.label)
         for r in src.collect()}
    assert a == b


def test_compressed_roundtrip(spark, tmp_path):
    src = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_zstd")
    try:
        write_arrow_ipc(src, path, compression="zstd")
    except Exception as exc:  # codec not compiled into this pyarrow
        pytest.skip(f"zstd IPC compression unavailable: {exc}")
    back = read_arrow_ipc(spark, path)
    assert _sorted_rows(back, "doc_id") == _sorted_rows(src, "doc_id")


def test_empty_partitions_write_no_files(spark, tmp_path):
    src = load_table(spark, SF, "region").repartition(16)  # 5 rows, 16 parts
    path = str(tmp_path / "region_arrow")
    manifest = write_arrow_ipc(src, path)
    # only non-empty partitions produced files
    assert 1 <= len(manifest) <= 5
    assert sum(m.n_rows for m in manifest) == 5
    back = read_arrow_ipc(spark, path)
    assert back.count() == 5


def test_probe_empty_dataset_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        probe_arrow_schema(spark, str(tmp_path / "nothing"))
