"""Dependency-free GeoTIFF reader + writer (classic-TIFF spec subset).

The second ubiquitous gridded-climate raster format next to NetCDF (the
reference's world, SURVEY.md §1): per-day single-band rasters with the
geography in ModelPixelScale/ModelTiepoint + GeoKeys. Same module posture
as ``netcdf_classic``/``hdf5_min``: a clean-room implementation against
the public TIFF 6.0 and GeoTIFF 1.1 (OGC 19-008) specifications, covering
what climate rasters actually use, and failing LOUDLY with a pointer at
the full-featured library (rasterio/rioxarray) on format corners outside
the subset:

supported   little/big endian classic TIFF AND BigTIFF (round 7: magic
            43, 8-byte offsets/counts, 20-byte IFD entries, LONG8/SLONG8
            value types — the layout every >4 GB raster uses, i.e. any
            continental-scale daily grid); single band; strip AND tile
            layouts; uint8/16/32, int16/32, float32/64 samples;
            compression none, DEFLATE (zlib, codes 8 and 32946) AND
            LZW (code 5 — TIFF 6.0 §13 MSB-first variable-width codes
            with the spec's early-change rule, both directions in pure
            Python) AND PackBits (code 32773, §9 RLE), each with the
            horizontal-differencing predictor (2) for integer samples;
            PixelIsArea / PixelIsPoint raster space; geographic CRS
            GeoKeys; GDAL_NODATA → NaN
gated       multi-band, JPEG, planar
            configuration 2, floating-point predictor (3),
            ModelTransformation affine grids, projected model types

The writer emits the same subset (used by tests and the synthetic raster
fixtures) so reader coverage is provable by roundtrip + hand-built and
fuzzed fixtures, not assumed.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8, 16: 8, 17: 8, 18: 8}  # 16-18: BigTIFF LONG8s
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d", 16: "Q", 17: "q", 18: "Q"}

# tags
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PLANAR, _PREDICTOR = 284, 317
_TILE_W, _TILE_H, _TILE_OFF, _TILE_CNT = 322, 323, 324, 325
_SAMPLE_FMT = 339
_PIXEL_SCALE, _TIEPOINT, _GEO_KEYS = 33550, 33922, 34735
_TRANSFORM = 34264
_GDAL_NODATA = 42113

# GeoKeys
_GT_MODEL_TYPE, _GT_RASTER_TYPE, _GEOGRAPHIC_TYPE = 1024, 1025, 2048
_MODEL_GEOGRAPHIC = 2
_RASTER_PIXEL_IS_AREA, _RASTER_PIXEL_IS_POINT = 1, 2


@dataclass
class GeoRaster:
    data: np.ndarray        # (rows, cols) float64, nodata as NaN
    lat: np.ndarray         # per-row CELL-CENTER latitudes (row order)
    lon: np.ndarray         # per-col cell-center longitudes
    nodata: float | None
    epsg: int | None        # geographic CRS code (4326, ...), if declared


def _gate(msg: str) -> "NotImplementedError":
    return NotImplementedError(
        f"minimal GeoTIFF decoder: {msg}; use the rasterio/rioxarray path"
    )


def _read_entries(buf: bytes, off: int, en: str,
                  big: bool = False) -> dict[int, tuple[int, int, int]]:
    # classic: 2-byte count, 12-byte entries (4-byte count + value slot);
    # BigTIFF: 8-byte count, 20-byte entries (8-byte count + value slot)
    if big:
        (n,) = struct.unpack_from(en + "Q", buf, off)
        head, esize, cfmt = 8, 20, "HHQ"
    else:
        (n,) = struct.unpack_from(en + "H", buf, off)
        head, esize, cfmt = 2, 12, "HHI"
    out = {"_big": big}  # string key cannot collide with integer tags
    for k in range(int(n)):
        tag, typ, cnt = struct.unpack_from(en + cfmt, buf, off + head + esize * k)
        out[tag] = (typ, int(cnt), off + head + esize * k + (12 if big else 8))
    return out


def _values(buf: bytes, en: str, typ: int, cnt: int, vpos: int,
            big: bool = False):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise _gate(f"TIFF value type {typ}")
    total = size * cnt
    inline_cap, off_fmt = (8, "Q") if big else (4, "I")
    pos = (vpos if total <= inline_cap
           else struct.unpack_from(en + off_fmt, buf, vpos)[0])
    if typ == 2:  # ASCII, NUL-terminated
        return buf[pos : pos + cnt].split(b"\x00")[0].decode("ascii", "replace")
    if typ == 5:  # RATIONAL
        raw = struct.unpack_from(en + f"{2 * cnt}I", buf, pos)
        return [raw[2 * i] / (raw[2 * i + 1] or 1) for i in range(cnt)]
    vals = list(struct.unpack_from(en + f"{cnt}{_TYPE_FMT[typ]}", buf, pos))
    return vals


def _tag(buf, en, entries, tag, default=None):
    if tag not in entries:
        return default
    typ, cnt, vpos = entries[tag]
    v = _values(buf, en, typ, cnt, vpos, entries.get("_big", False))
    return v


def _scalar(buf, en, entries, tag, default=None):
    v = _tag(buf, en, entries, tag)
    if v is None:
        return default
    return v[0] if isinstance(v, list) else v


def _dtype(bits: int, fmt: int, en: str) -> np.dtype:
    base = {
        (8, 1): "u1", (16, 1): "u2", (32, 1): "u4",
        (8, 2): "i1", (16, 2): "i2", (32, 2): "i4",
        (32, 3): "f4", (64, 3): "f8",
    }.get((bits, fmt))
    if base is None:
        raise _gate(f"sample layout bits={bits} format={fmt}")
    return np.dtype(("<" if en == "<" else ">") + base)


def packbits_decode(src: bytes) -> bytes:
    """TIFF PackBits (spec §9): n in 0..127 -> copy n+1 literals;
    n in -127..-1 -> repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(src):
        n = src[i] - 256 if src[i] > 127 else src[i]
        i += 1
        if n >= 0:
            out += src[i : i + n + 1]
            i += n + 1
        elif n != -128:
            out += src[i : i + 1] * (1 - n)
            i += 1
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs >= 3 become repeats, the rest literals."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 2 < n and data[i] == data[i + 1] == data[i + 2])
        ):
            i += 1
        out.append(i - lit - 1)
        out += data[lit:i]
    return bytes(out)


_LZW_CLEAR, _LZW_EOI, _LZW_FIRST = 256, 257, 258


def lzw_decode(src: bytes) -> bytes:
    """TIFF 6.0 §13 LZW: MSB-first bit packing, 9→12-bit codes with the
    spec's EARLY-CHANGE rule (width bumps when the next free code reaches
    2^w - 1, one code sooner than the GIF rule)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bitbuf = bitlen = pos = 0
    width = 9
    prev: bytes | None = None

    def next_code():
        nonlocal bitbuf, bitlen, pos
        while bitlen < width:
            if pos >= len(src):
                return _LZW_EOI  # truncated stream: treat as end
            bitbuf = (bitbuf << 8) | src[pos]
            pos += 1
            bitlen += 8
        bitlen -= width
        code = (bitbuf >> bitlen) & ((1 << width) - 1)
        return code

    while True:
        code = next_code()
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            del table[_LZW_FIRST:]
            width = 9
            code = next_code()
            if code == _LZW_EOI:
                break
            if code > 255:
                raise ValueError(f"corrupt LZW: code {code} after clear")
            out += table[code]
            prev = table[code]
            continue
        if prev is None:
            raise ValueError("corrupt LZW: stream does not start with clear")
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW: code {code} beyond table")
        out += entry
        table.append(prev + entry[:1])
        if len(table) == (1 << width) - 1 and width < 12:  # early change
            width += 1
        prev = entry
    return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (the writer half proving the decoder by
    roundtrip): leads with ClearCode, re-clears at table entry 4094."""
    out = bytearray()
    bitbuf = bitlen = 0

    def put(code: int, width: int):
        nonlocal bitbuf, bitlen
        bitbuf = (bitbuf << width) | code
        bitlen += width
        while bitlen >= 8:
            bitlen -= 8
            out.append((bitbuf >> bitlen) & 0xFF)

    def fresh():
        return {bytes([i]): i for i in range(256)}

    width = 9
    put(_LZW_CLEAR, width)
    table = fresh()
    nxt = _LZW_FIRST
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        table[cand] = nxt
        nxt += 1
        # the decoder's table lags this one by exactly one entry, so its
        # early-change trigger (len == 2^w - 1) fires here at nxt - 1
        if nxt - 1 == (1 << width) - 1 and width < 12:
            width += 1
        if nxt == 4094:
            put(_LZW_CLEAR, width)
            table = fresh()
            nxt = _LZW_FIRST
            width = 9
        run = bytes([b])
    if run:
        put(table[run], width)
        # the decoder adds one entry after reading this final code,
        # reaching exactly nxt; mirror its trigger for the EOI width
        if nxt == (1 << width) - 1 and width < 12:
            width += 1
    put(_LZW_EOI, width)
    if bitlen:
        out.append((bitbuf << (8 - bitlen)) & 0xFF)
    return bytes(out)


def _decode_block(raw: bytes, comp: int, predictor: int, rows: int, cols: int, dt) -> np.ndarray:
    if comp in (8, 32946):
        raw = zlib.decompress(raw)
    elif comp == 5:
        raw = lzw_decode(raw)
    elif comp == 32773:
        raw = packbits_decode(raw)
    elif comp != 1:
        raise _gate(f"compression {comp} (only none/DEFLATE/LZW/PackBits)")
    need = rows * cols * dt.itemsize
    if len(raw) < need:
        raise ValueError(f"GeoTIFF block short: {len(raw)} < {need} bytes")
    arr = np.frombuffer(raw, dtype=dt, count=rows * cols).reshape(rows, cols)
    if predictor == 2:
        if dt.kind == "f":
            raise _gate("horizontal predictor on float samples")
        arr = np.cumsum(arr.astype(np.int64), axis=1, dtype=np.int64)
        arr = arr.astype(dt.str.lstrip("<>"))  # wraparound like the encoder
    elif predictor not in (None, 1):
        raise _gate(f"predictor {predictor}")
    return arr


def read_geotiff(content: bytes) -> GeoRaster:
    """GeoTIFF bytes → grid + cell-center lat/lon axes (spec subset)."""
    if content[:2] == b"II":
        en = "<"
    elif content[:2] == b"MM":
        en = ">"
    else:
        raise ValueError("not a TIFF (II/MM byte-order mark expected)")
    (magic,) = struct.unpack_from(en + "H", content, 2)
    if magic == 43:  # BigTIFF: 8-byte offsets everywhere
        offsize, zero = struct.unpack_from(en + "HH", content, 4)
        if offsize != 8 or zero != 0:
            raise ValueError(f"bad BigTIFF header (offset size {offsize})")
        (ifd_off,) = struct.unpack_from(en + "Q", content, 8)
        e = _read_entries(content, ifd_off, en, big=True)
    elif magic == 42:
        (ifd_off,) = struct.unpack_from(en + "I", content, 4)
        e = _read_entries(content, ifd_off, en)
    else:
        raise ValueError(f"bad TIFF magic {magic}")

    width = _scalar(content, en, e, _W)
    height = _scalar(content, en, e, _H)
    if not width or not height:
        raise ValueError("GeoTIFF missing ImageWidth/ImageLength")
    if _scalar(content, en, e, _SPP, 1) != 1:
        raise _gate("multi-band rasters")
    if _scalar(content, en, e, _PLANAR, 1) != 1:
        raise _gate("planar configuration 2")
    bits = _scalar(content, en, e, _BITS, 8)
    fmt = _scalar(content, en, e, _SAMPLE_FMT, 1)
    comp = _scalar(content, en, e, _COMP, 1)
    predictor = _scalar(content, en, e, _PREDICTOR, 1)
    dt = _dtype(bits, fmt, en)

    if _TRANSFORM in e:
        raise _gate("ModelTransformation affine grids")

    data = np.empty((height, width), dtype=dt.str.lstrip("<>"))
    if _TILE_OFF in e:
        tw = _scalar(content, en, e, _TILE_W)
        th = _scalar(content, en, e, _TILE_H)
        offs = _tag(content, en, e, _TILE_OFF)
        cnts = _tag(content, en, e, _TILE_CNT)
        offs = offs if isinstance(offs, list) else [offs]
        cnts = cnts if isinstance(cnts, list) else [cnts]
        per_row = (width + tw - 1) // tw
        for i, (o, c) in enumerate(zip(offs, cnts)):
            ty, tx = (i // per_row) * th, (i % per_row) * tw
            block = _decode_block(content[o : o + c], comp, predictor, th, tw, dt)
            data[ty : ty + th, tx : tx + tw] = block[
                : min(th, height - ty), : min(tw, width - tx)
            ]
    elif _STRIP_OFF in e:
        rps = _scalar(content, en, e, _ROWS_PER_STRIP, height)
        offs = _tag(content, en, e, _STRIP_OFF)
        cnts = _tag(content, en, e, _STRIP_CNT)
        offs = offs if isinstance(offs, list) else [offs]
        cnts = cnts if isinstance(cnts, list) else [cnts]
        for i, (o, c) in enumerate(zip(offs, cnts)):
            y0 = i * rps
            rows = min(rps, height - y0)
            data[y0 : y0 + rows] = _decode_block(
                content[o : o + c], comp, predictor, rows, width, dt
            )
    else:
        raise ValueError("GeoTIFF has neither strip nor tile offsets")

    # geography: tiepoint + per-pixel scale → axis vectors
    scale = _tag(content, en, e, _PIXEL_SCALE)
    tie = _tag(content, en, e, _TIEPOINT)
    if not scale or not tie or len(tie) < 6:
        raise _gate("no ModelPixelScale/ModelTiepoint")
    sx, sy = float(scale[0]), float(scale[1])
    i0, j0, _, x0, y0, _ = (float(v) for v in tie[:6])

    raster_type = _RASTER_PIXEL_IS_AREA
    epsg = None
    gk = _tag(content, en, e, _GEO_KEYS)
    if gk:
        for k in range(1, len(gk) // 4 + 1):
            key, loc, cnt, val = gk[4 * k : 4 * k + 4] if 4 * k + 4 <= len(gk) else (None,) * 4
            if key == _GT_MODEL_TYPE and loc == 0 and val != _MODEL_GEOGRAPHIC:
                raise _gate(f"model type {val} (projected rasters)")
            if key == _GT_RASTER_TYPE and loc == 0:
                raster_type = val
            if key == _GEOGRAPHIC_TYPE and loc == 0:
                epsg = int(val)
    # PixelIsArea: tiepoint maps the CORNER of pixel (i0, j0); centers sit
    # half a pixel in. PixelIsPoint: the tiepoint IS a center.
    half = 0.5 if raster_type == _RASTER_PIXEL_IS_AREA else 0.0
    lon = x0 + (np.arange(width) - i0 + half) * sx
    lat = y0 - (np.arange(height) - j0 + half) * sy

    nodata = None
    nd = _tag(content, en, e, _GDAL_NODATA)
    if isinstance(nd, str) and nd.strip():
        nodata = float(nd.strip())

    out = data.astype(np.float64)
    if nodata is not None:
        if np.isnan(nodata):
            pass  # float rasters with NaN nodata are already NaN
        else:
            out[data == np.array(nodata).astype(data.dtype)] = np.nan
    return GeoRaster(data=out, lat=lat, lon=lon, nodata=nodata, epsg=epsg)


# ---------------------------------------------------------------------------
# writer (same subset; used by tests and synthetic raster fixtures)
# ---------------------------------------------------------------------------


def write_geotiff(
    data: np.ndarray,
    lat0: float,
    lon0: float,
    scale: float,
    nodata: float | None = None,
    compress: bool | str = False,
    predictor: bool = False,
    rows_per_strip: int | None = None,
    tile: tuple[int, int] | None = None,
    pixel_is_point: bool = False,
    epsg: int = 4326,
    bigtiff: bool = False,
) -> bytes:
    """Single-band little-endian GeoTIFF. ``lat0``/``lon0`` are the CENTER
    of the top-left pixel; ``scale`` is the (square) pixel size in
    degrees. PixelIsArea by default (tiepoint written at the pixel
    corner), PixelIsPoint on request — both roundtrip to identical
    center axes through ``read_geotiff``. ``bigtiff`` emits the magic-43
    layout (8-byte offsets, 20-byte IFD entries, LONG8 block offsets and
    counts) — byte-identical pixel payloads, >4 GB-capable structure."""
    data = np.asarray(data)
    if data.ndim != 2:
        raise ValueError("write_geotiff expects a 2-D single-band array")
    height, width = data.shape
    dt = np.dtype(data.dtype).newbyteorder("<")
    fmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    bits = dt.itemsize * 8
    if predictor and dt.kind == "f":
        raise ValueError("horizontal predictor is integer-only")

    def enc(block: np.ndarray) -> bytes:
        if predictor:
            b = block.astype(np.int64)
            b = np.concatenate([b[:, :1], np.diff(b, axis=1)], axis=1)
            raw = b.astype(dt.str).tobytes()
        else:
            raw = block.astype(dt.str).tobytes()
        if compress == "lzw":
            return lzw_encode(raw)
        if compress == "packbits":
            return packbits_encode(raw)
        return zlib.compress(raw) if compress else raw

    blocks: list[bytes] = []
    if tile:
        tw, th = tile
        per_row = (width + tw - 1) // tw
        n_down = (height + th - 1) // th
        for ty in range(n_down):
            for tx in range(per_row):
                blk = np.zeros((th, tw), dtype=data.dtype)
                part = data[ty * th : ty * th + th, tx * tw : tx * tw + tw]
                blk[: part.shape[0], : part.shape[1]] = part
                blocks.append(enc(blk))
    else:
        rps = rows_per_strip or height
        for y0 in range(0, height, rps):
            blocks.append(enc(data[y0 : y0 + rps]))

    half = 0.0 if pixel_is_point else 0.5
    tie = [0.0, 0.0, 0.0, lon0 - half * scale, lat0 + half * scale, 0.0]
    geokeys = [
        1, 1, 0, 3,                              # version, rev, minor, nkeys
        _GT_MODEL_TYPE, 0, 1, _MODEL_GEOGRAPHIC,
        _GT_RASTER_TYPE, 0, 1,
        _RASTER_PIXEL_IS_POINT if pixel_is_point else _RASTER_PIXEL_IS_AREA,
        _GEOGRAPHIC_TYPE, 0, 1, epsg,
    ]
    nd_ascii = (f"{nodata} ".encode("ascii") + b"\x00") if nodata is not None else None

    entries: list[tuple[int, int, list]] = [
        (_W, 4, [width]),
        (_H, 4, [height]),
        (_BITS, 3, [bits]),
        (_COMP, 3, [{False: 1, "lzw": 5, "packbits": 32773}.get(compress, 8)
                    if compress else 1]),
        (_PHOTO, 3, [1]),
        (_SPP, 3, [1]),
        (_SAMPLE_FMT, 3, [fmt]),
        (_PIXEL_SCALE, 12, [scale, scale, 0.0]),
        (_TIEPOINT, 12, tie),
        (_GEO_KEYS, 3, geokeys),
    ]
    if predictor:
        entries.append((_PREDICTOR, 3, [2]))
    off_typ = 16 if bigtiff else 4  # LONG8 block offsets/counts in BigTIFF
    if tile:
        entries += [
            (_TILE_W, 3, [tile[0]]),
            (_TILE_H, 3, [tile[1]]),
            (_TILE_OFF, off_typ, [0] * len(blocks)),   # patched below
            (_TILE_CNT, off_typ, [len(b) for b in blocks]),
        ]
    else:
        entries += [
            (_STRIP_OFF, off_typ, [0] * len(blocks)),  # patched below
            (_ROWS_PER_STRIP, 3, [rows_per_strip or height]),
            (_STRIP_CNT, off_typ, [len(b) for b in blocks]),
        ]
    if nd_ascii:
        entries.append((_GDAL_NODATA, 2, [nd_ascii]))
    entries.sort(key=lambda t: t[0])

    # layout: header | IFD | out-of-line values | blocks
    # classic: 8-byte header, 12-byte entries, 4-byte inline values;
    # BigTIFF: 16-byte header, 20-byte entries, 8-byte inline values
    if bigtiff:
        ifd_off, head_n, esize, cap = 16, 8, 20, 8
        efmt, nextfmt = "<HHQ", "<Q"
    else:
        ifd_off, head_n, esize, cap = 8, 2, 12, 4
        efmt, nextfmt = "<HHI", "<I"
    ifd_size = head_n + esize * len(entries) + struct.calcsize(nextfmt)
    heap = bytearray()
    heap_base = ifd_off + ifd_size

    def val_bytes(typ: int, vals) -> bytes:
        if typ == 2:
            return vals[0]
        return struct.pack(f"<{len(vals)}{_TYPE_FMT[typ]}", *vals)

    # first pass: everything except block offsets (sizes fixed after pass 1)
    packed: list[tuple[int, int, int, bytes]] = []
    for tag, typ, vals in entries:
        raw = val_bytes(typ, vals)
        cnt = len(vals[0]) if typ == 2 else len(vals)
        packed.append((tag, typ, cnt, raw))
        if len(raw) > cap:
            heap.extend(raw)
            if len(heap) % 2:
                heap.append(0)
    data_base = heap_base + len(heap)
    offs, pos = [], data_base
    for b in blocks:
        offs.append(pos)
        pos += len(b) + (len(b) % 2)

    if bigtiff:
        out = bytearray(struct.pack("<2sHHHQ", b"II", 43, 8, 0, ifd_off))
        out += struct.pack("<Q", len(entries))
    else:
        out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
        out += struct.pack("<H", len(entries))
    heap = bytearray()
    hpos = heap_base
    for tag, typ, cnt, raw in packed:
        if tag in (_STRIP_OFF, _TILE_OFF):
            raw = struct.pack(f"<{len(offs)}{_TYPE_FMT[off_typ]}", *offs)
        if len(raw) <= cap:
            out += struct.pack(efmt, tag, typ, cnt) + raw.ljust(cap, b"\x00")
        else:
            out += struct.pack(efmt, tag, typ, cnt)
            out += struct.pack(nextfmt, hpos)
            heap.extend(raw)
            if len(heap) % 2:
                heap.append(0)
            hpos = heap_base + len(heap)
    out += struct.pack(nextfmt, 0)  # no next IFD
    out += heap
    for b in blocks:
        out += b
        if len(b) % 2:
            out += b"\x00"
    return bytes(out)
