"""Dependency-free Zarr v2 chunked-array reader + writer (spec subset).

Zarr is the cloud-native chunk-store format climate archives are moving
to — the same logical model as the reference's NetCDF inputs (named N-D
arrays + 1-D coordinate axes, ``process_climate_amazon_annual.py:188-253``)
but with every chunk stored as an INDEPENDENT OBJECT in a key/value store
instead of a byte range inside one file. That layout is exactly the right
100 TB ingest shape: a store is millions of independently fetchable,
independently decodable chunk objects, so the natural Spark plan is
"binaryFile-scan the chunk keys, decode each chunk in its own task" — no
per-file seek coordination, no single-file split problem (contrast the
one-task-per-file NetCDF boundary in ``ingest.py``). The distributed side
lives in ``ingest.ingest_zarr_to_parquet``; this module is the pure codec,
shared by the Spark workers and the test-side recomputation twins.

Implemented subset of the public spec
(https://zarr-specs.readthedocs.io/, v2):
- ``.zarray`` metadata: shape / chunks / dtype / fill_value / order /
  compressor / filters / dimension_separator ('.' default, '/' supported)
- C order, numeric dtypes, raw (null) or zlib/gzip compression
- missing chunk keys read as ``fill_value`` (the spec's sparse-write rule)
- edge chunks stored full-size (written padded with fill_value, trimmed on
  read), per spec
- groups: ``.zgroup`` + member arrays as sub-stores, ``.zattrs`` JSON
  attributes (including xarray's public ``_ARRAY_DIMENSIONS`` convention
  for dimension naming)

Everything else FAILS LOUDLY with a pointer at the full ``zarr`` library:
F order, filter chains, blosc/zstd/lz4 codecs, structured/string dtypes,
zarr v3 stores. Same fail-loud posture as ``hdf5_min.py`` / ``crs_min.py``.
"""

from __future__ import annotations

import json
import os
import zlib
from dataclasses import dataclass
from itertools import product

import numpy as np

_ZARR_FORMAT = 2


def _gate(msg: str) -> NotImplementedError:
    return NotImplementedError(
        f"{msg}; this minimal Zarr reader covers the v2 C-order "
        "raw/zlib/gzip subset — install 'zarr' for full coverage"
    )


@dataclass
class ZarrMeta:
    shape: tuple[int, ...]
    chunks: tuple[int, ...]
    dtype: np.dtype
    fill_value: object
    compressor_id: str | None  # None = raw
    separator: str


def parse_zarray(raw: bytes) -> ZarrMeta:
    """Parse and validate ``.zarray`` metadata against the supported subset."""
    meta = json.loads(raw.decode("utf-8"))
    if meta.get("zarr_format") != _ZARR_FORMAT:
        raise _gate(f"zarr_format {meta.get('zarr_format')!r} (v2 only)")
    if meta.get("order", "C") != "C":
        raise _gate(f"order {meta.get('order')!r} (C order only)")
    if meta.get("filters"):
        raise _gate(f"filter chain {meta['filters']!r}")
    comp = meta.get("compressor")
    comp_id = None
    if comp is not None:
        comp_id = comp.get("id")
        if comp_id not in ("zlib", "gzip"):
            raise _gate(f"compressor {comp_id!r}")
    try:
        dt = np.dtype(meta["dtype"])
    except TypeError as e:  # structured dtype list
        raise _gate(f"dtype {meta['dtype']!r}") from e
    if dt.kind not in "fiub":
        raise _gate(f"dtype kind {dt.kind!r} (numeric only)")
    shape = tuple(int(s) for s in meta["shape"])
    chunks = tuple(int(c) for c in meta["chunks"])
    if len(shape) != len(chunks) or not shape or any(c <= 0 for c in chunks):
        raise ValueError(f"inconsistent shape {shape} / chunks {chunks}")
    fill = meta.get("fill_value")
    if isinstance(fill, str):  # spec encodes non-finite floats as strings
        fill = {"NaN": np.nan, "Infinity": np.inf, "-Infinity": -np.inf}.get(fill)
        if fill is None:
            raise _gate(f"fill_value {meta['fill_value']!r}")
    sep = meta.get("dimension_separator", ".")
    if sep not in (".", "/"):
        raise _gate(f"dimension_separator {sep!r}")
    return ZarrMeta(shape, chunks, dt, fill, comp_id, sep)


def decode_chunk(raw: bytes, meta: ZarrMeta) -> np.ndarray:
    """One stored chunk object → full-size chunk array (edge trimming is
    the caller's job — stored chunks are always whole, per spec)."""
    if meta.compressor_id == "zlib":
        raw = zlib.decompress(raw)
    elif meta.compressor_id == "gzip":
        raw = zlib.decompress(raw, 16 + zlib.MAX_WBITS)
    n = int(np.prod(meta.chunks))
    if len(raw) != n * meta.dtype.itemsize:
        raise ValueError(
            f"chunk payload is {len(raw)} bytes, expected {n * meta.dtype.itemsize}"
        )
    return np.frombuffer(raw, dtype=meta.dtype).reshape(meta.chunks)


def encode_chunk(block: np.ndarray, meta: ZarrMeta) -> bytes:
    raw = np.ascontiguousarray(block, dtype=meta.dtype).tobytes()
    if meta.compressor_id == "zlib":
        return zlib.compress(raw)
    if meta.compressor_id == "gzip":
        co = zlib.compressobj(wbits=16 + zlib.MAX_WBITS)
        return co.compress(raw) + co.flush()
    return raw


def chunk_grid(meta: ZarrMeta):
    """Iterate (grid_index_tuple, key, slices) over the chunk grid."""
    counts = [-(-s // c) for s, c in zip(meta.shape, meta.chunks)]
    for idx in product(*(range(n) for n in counts)):
        key = meta.separator.join(str(i) for i in idx)
        slices = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, meta.chunks, meta.shape)
        )
        yield idx, key, slices


def chunk_slices(meta: ZarrMeta, key: str) -> tuple[slice, ...]:
    """A stored chunk key ('2.0.1' or '2/0/1') → its array slices."""
    idx = tuple(int(p) for p in key.split(meta.separator))
    if len(idx) != len(meta.shape):
        raise ValueError(f"chunk key {key!r} does not match rank {len(meta.shape)}")
    return tuple(
        slice(i * c, min((i + 1) * c, s))
        for i, c, s in zip(idx, meta.chunks, meta.shape)
    )


def read_zarr_array(path: str) -> np.ndarray:
    """Driver-side full assembly of one array store (small arrays: tests,
    coordinate axes). The distributed path never calls this on data
    variables — it decodes chunk objects independently per task."""
    with open(os.path.join(path, ".zarray"), "rb") as f:
        meta = parse_zarray(f.read())
    out = np.empty(meta.shape, dtype=meta.dtype)
    for _, key, slices in chunk_grid(meta):
        cpath = os.path.join(path, *key.split("/")) if meta.separator == "/" else os.path.join(path, key)
        if os.path.exists(cpath):
            with open(cpath, "rb") as f:
                block = decode_chunk(f.read(), meta)
            out[slices] = block[tuple(slice(0, s.stop - s.start) for s in slices)]
        else:
            if meta.fill_value is None:
                raise _gate(f"missing chunk {key!r} with null fill_value")
            out[slices] = meta.fill_value
    return out


def read_zattrs(path: str) -> dict:
    p = os.path.join(path, ".zattrs")
    if not os.path.exists(p):
        return {}
    with open(p, "rb") as f:
        return json.loads(f.read().decode("utf-8"))


def write_zarr_array(
    path: str,
    arr: np.ndarray,
    chunks: tuple[int, ...] | None = None,
    compressor: str | None = "zlib",
    fill_value: object = 0,
    separator: str = ".",
    attrs: dict | None = None,
) -> None:
    """Write one array as a v2 store (the test/fixture writer; also proof
    the reader's understanding of the spec is real, not fit-to-fixture)."""
    arr = np.asarray(arr)
    chunks = tuple(chunks) if chunks else arr.shape
    os.makedirs(path, exist_ok=True)
    fill = fill_value
    if isinstance(fill, float) and not np.isfinite(fill):
        fill = {np.inf: "Infinity", -np.inf: "-Infinity"}.get(fill, "NaN")
    meta_json = {
        "zarr_format": _ZARR_FORMAT,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": arr.dtype.str,
        "fill_value": fill,
        "order": "C",
        "filters": None,
        "compressor": {"id": compressor} if compressor else None,
        "dimension_separator": separator,
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta_json, f)
    if attrs is not None:
        with open(os.path.join(path, ".zattrs"), "w") as f:
            json.dump(attrs, f)
    meta = ZarrMeta(arr.shape, chunks, arr.dtype, fill_value, compressor, separator)
    for _, key, slices in chunk_grid(meta):
        block = np.full(chunks, fill_value if fill_value is not None else 0, dtype=arr.dtype)
        part = arr[slices]
        block[tuple(slice(0, p) for p in part.shape)] = part
        cpath = os.path.join(path, *key.split("/")) if separator == "/" else os.path.join(path, key)
        os.makedirs(os.path.dirname(cpath), exist_ok=True)
        with open(cpath, "wb") as f:
            f.write(encode_chunk(block, meta))


def write_zarr_group(path: str, arrays: dict, attrs: dict | None = None, **kw) -> None:
    """Group store: ``.zgroup`` + one member sub-store per array.

    ``arrays`` maps name → ndarray | (ndarray, per_array_attrs) |
    (ndarray, per_array_attrs, chunks)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, ".zgroup"), "w") as f:
        json.dump({"zarr_format": _ZARR_FORMAT}, f)
    if attrs is not None:
        with open(os.path.join(path, ".zattrs"), "w") as f:
            json.dump(attrs, f)
    for name, spec in arrays.items():
        arr, a_attrs, chunks = spec, None, None
        if isinstance(spec, tuple):
            arr = spec[0]
            a_attrs = spec[1] if len(spec) > 1 else None
            chunks = spec[2] if len(spec) > 2 else None
        write_zarr_array(
            os.path.join(path, name), arr, chunks=chunks, attrs=a_attrs, **kw
        )


def open_group_array_meta(store: str, name: str) -> tuple[ZarrMeta, dict]:
    """(meta, attrs) of one member array — the cheap driver-side probe the
    distributed ingest uses (never touches a data chunk)."""
    apath = os.path.join(store, name)
    with open(os.path.join(apath, ".zarray"), "rb") as f:
        meta = parse_zarray(f.read())
    return meta, read_zattrs(apath)
