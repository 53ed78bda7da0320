"""Dependency-free Blosc1 container codec (the Zarr ecosystem's default).

numcodecs' ``Blosc`` — the compressor most real Zarr v2 climate archives
were written with (default ``cname='lz4', shuffle=SHUFFLE``) — wraps every
chunk in the c-blosc1 container: a 16-byte self-describing header, a block
index, and per-block byte-shuffled + entropy-coded payloads. The format is
publicly specified (c-blosc ``README_HEADER.rst`` / ``FORMAT`` docs, and the
reference implementation at github.com/Blosc/c-blosc); this module
implements the subset those archives actually use so the chunk-parallel
Zarr ingest (``zarr_min.py`` → ``ingest.ingest_zarr_to_parquet``) can
decode them in containers without python-blosc — the same clean-room
pattern as ``hdf5_min.py``.

Implemented:
- the 16-byte header (version/versionlz/flags/typesize + nbytes/blocksize/
  cbytes), pure-memcpy mode (flags bit 1), the int32 block-start index;
- per-block split streams: c-blosc splits a block into ``typesize``
  independently-compressed byte-plane streams when ``typesize <= 16``,
  ``blocksize/typesize >= 128``, the block is not the leftover block, and
  header flags bit 4 (``dont_split``, c-blosc >= 1.14) is clear — the
  decoder recomputes this deterministically from the header, so both
  pre- and post-1.14 writers decode correctly;
- inner codecs: LZ4 (codec id 1 — block format, both directions, pure
  Python), snappy (codec id 2, decode only — raw block format per split,
  cross-checked against pyarrow's snappy codec), zlib (codec id 3 —
  stdlib), and zstd (codec id 4, decode only — one RFC 8878 frame per
  split, via the dependency-free ``zstd_min``); per-split stored-raw
  fallback (``csize == neblock``);
- byte-shuffle (flags bit 0): numpy transpose per block, trailing
  non-multiple-of-typesize bytes carried verbatim (c-blosc
  ``shuffle_generic`` semantics).

FAILS LOUDLY (pointer at the ``blosc`` library) on: bit-shuffle (flags
bit 2), blosclz (codec 0 — blosc's own codec, no in-container reference
implementation to validate a clean-room decoder against), snappy/zstd
WRITING, and blosc2 frames. The LZ4 hot loops are pure Python —
correct-but-slow; a throughput deployment installs python-blosc and this
boundary steps aside (same posture as the NetCDF/HDF5 fallbacks).

Format cross-checks live in ``tests/test_blosc.py``: hand-built byte
vectors written straight from the published format (independent of the
encoder here), encoder/decoder round-trips across the split/shuffle/raw
matrix, and Zarr store round-trips through ``zarr_min``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_VERSION_FORMAT = 2  # c-blosc1 BLOSC_VERSION_FORMAT
_MAX_SPLITS = 16  # c-blosc MAX_SPLITS
_MIN_BUFFERSIZE = 128  # c-blosc BLOSC_MIN_BUFFERSIZE

_FLAG_SHUFFLE = 0x1
_FLAG_MEMCPY = 0x2
_FLAG_BITSHUFFLE = 0x4
_FLAG_DONT_SPLIT = 0x10

_CODEC_BLOSCLZ = 0
_CODEC_LZ4 = 1
_CODEC_SNAPPY = 2
_CODEC_ZLIB = 3
_CODEC_ZSTD = 4

_CODEC_NAMES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}


def _gate(msg: str) -> NotImplementedError:
    return NotImplementedError(
        f"{msg}; this minimal Blosc codec covers the lz4/snappy/zlib/zstd "
        "byte-shuffle subset — install 'blosc' for full coverage"
    )


# ---------------------------------------------------------------------------
# LZ4 block format (lz4.org block spec: token, literal run, LE16 offset,
# match run; 255-extension bytes; last sequence literals-only)
# ---------------------------------------------------------------------------


def lz4_decompress(src: bytes, dst_size: int) -> bytes:
    """Decode one LZ4 block into exactly ``dst_size`` bytes.

    Truncated or otherwise corrupt input always raises ``ValueError`` —
    every read is bounds-checked before it happens, so a short literal
    run can never silently shrink ``out`` and shift later back-references.
    """
    out = bytearray(dst_size)
    n = len(src)
    ip = 0
    op = 0
    while ip < n:
        token = src[ip]
        ip += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if ip >= n:
                    raise ValueError("corrupt LZ4 block: truncated literal length")
                c = src[ip]
                ip += 1
                lit += c
                if c != 255:
                    break
        if lit:
            if ip + lit > n:
                raise ValueError(
                    f"corrupt LZ4 block: literal run of {lit} bytes at {ip} "
                    f"overruns {n}-byte input"
                )
            if op + lit > dst_size:
                raise ValueError("corrupt LZ4 block: literals overrun output")
            out[op : op + lit] = src[ip : ip + lit]
            ip += lit
            op += lit
        if ip >= n:  # last sequence carries literals only
            break
        if ip + 2 > n:
            raise ValueError("corrupt LZ4 block: truncated match offset")
        offset = src[ip] | (src[ip + 1] << 8)
        ip += 2
        if offset == 0 or offset > op:
            raise ValueError(f"corrupt LZ4 block: offset {offset} at {op}")
        mlen = (token & 0xF) + 4
        if mlen == 19:
            while True:
                if ip >= n:
                    raise ValueError("corrupt LZ4 block: truncated match length")
                c = src[ip]
                ip += 1
                mlen += c
                if c != 255:
                    break
        if op + mlen > dst_size:
            raise ValueError("corrupt LZ4 block: match overruns output")
        ref = op - offset
        if offset >= mlen:  # disjoint: one slice copy
            out[op : op + mlen] = out[ref : ref + mlen]
            op += mlen
        else:  # overlapping run: the match reads bytes it just wrote
            for _ in range(mlen):
                out[op] = out[ref]
                op += 1
                ref += 1
    if op != dst_size:
        raise ValueError(f"LZ4 block decoded {op} bytes, expected {dst_size}")
    return bytes(out)


def lz4_compress(src: bytes) -> bytes:
    """Greedy single-pass LZ4 block encoder (hash-chain-free: last match
    position per 4-byte prefix). Honors the spec's end conditions: the
    final 5 bytes are literals and no match starts within the last 12."""
    n = len(src)
    out = bytearray()

    def emit(anchor: int, end: int, mlen: int = 0, offset: int = 0) -> None:
        lit = end - anchor
        lit_tok = 15 if lit >= 15 else lit
        m_tok = 0
        if mlen:
            m = mlen - 4
            m_tok = 15 if m >= 15 else m
        out.append((lit_tok << 4) | m_tok)
        if lit >= 15:
            rest = lit - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)
        out.extend(src[anchor:end])
        if mlen:
            out.append(offset & 0xFF)
            out.append(offset >> 8)
            m = mlen - 4
            if m >= 15:
                rest = m - 15
                while rest >= 255:
                    out.append(255)
                    rest -= 255
                out.append(rest)

    if n < 13:  # too small for any spec-legal match
        emit(0, n)
        return bytes(out)

    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    mflimit = n - 12  # no match may start past here
    matchlimit = n - 5  # ...or extend past here
    while i < mflimit:
        key = src[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 65535 and src[cand : cand + 4] == key:
            mlen = 4
            while i + mlen < matchlimit and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            emit(anchor, i, mlen, i - cand)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(anchor, n)
    return bytes(out)


# ---------------------------------------------------------------------------
# Snappy raw block format (google/snappy format_description.txt: varint32
# uncompressed-length preamble, then literal / 1-2-4-byte-offset copy
# elements; copies may overlap). c-blosc compresses each split with
# snappy_compress — one raw block per split, same wire bytes pyarrow's
# 'snappy' codec produces, which is the in-container reference the tests
# cross-check against.
# ---------------------------------------------------------------------------


def snappy_decompress(src: bytes, max_len: int | None = None) -> bytes:
    """Decode one raw snappy block. Corrupt or truncated input always
    raises ``ValueError`` — every read is bounds-checked first, and the
    output buffer is allocated only after the preamble length passes the
    caller-known ``max_len`` bound (a ~6-byte corrupt preamble could
    otherwise trigger a transient 2 GB allocation per task — the same
    dst-size contract lz4_decompress enforces)."""
    n = len(src)
    ulen = 0
    shift = 0
    ip = 0
    while True:
        if ip >= n:
            raise ValueError("corrupt snappy block: truncated length preamble")
        b = src[ip]
        ip += 1
        ulen |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
        if shift > 28:
            raise ValueError("corrupt snappy block: preamble varint too long")
    if ulen >= 1 << 31:
        raise ValueError(f"corrupt snappy block: implausible length {ulen}")
    if max_len is not None and ulen > max_len:
        raise ValueError(
            f"corrupt snappy block: preamble claims {ulen} bytes, caller "
            f"expects at most {max_len}"
        )
    out = bytearray(ulen)
    op = 0
    while ip < n:
        tag = src[ip]
        ip += 1
        kind = tag & 3
        if kind == 0:  # literal
            l6 = tag >> 2
            if l6 < 60:
                length = l6 + 1
            else:
                nb = l6 - 59  # 1..4 trailing little-endian length bytes
                if ip + nb > n:
                    raise ValueError(
                        "corrupt snappy block: truncated literal length"
                    )
                length = int.from_bytes(src[ip : ip + nb], "little") + 1
                ip += nb
            if ip + length > n:
                raise ValueError(
                    f"corrupt snappy block: literal run of {length} bytes "
                    f"at {ip} overruns {n}-byte input"
                )
            if op + length > ulen:
                raise ValueError("corrupt snappy block: literals overrun output")
            out[op : op + length] = src[ip : ip + length]
            ip += length
            op += length
            continue
        if kind == 1:  # copy, 11-bit offset, 4-11 byte length
            if ip >= n:
                raise ValueError("corrupt snappy block: truncated 1-byte offset")
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | src[ip]
            ip += 1
        elif kind == 2:  # copy, 16-bit offset
            if ip + 2 > n:
                raise ValueError("corrupt snappy block: truncated 2-byte offset")
            length = (tag >> 2) + 1
            offset = src[ip] | (src[ip + 1] << 8)
            ip += 2
        else:  # copy, 32-bit offset
            if ip + 4 > n:
                raise ValueError("corrupt snappy block: truncated 4-byte offset")
            length = (tag >> 2) + 1
            offset = int.from_bytes(src[ip : ip + 4], "little")
            ip += 4
        if offset == 0 or offset > op:
            raise ValueError(f"corrupt snappy block: offset {offset} at {op}")
        if op + length > ulen:
            raise ValueError("corrupt snappy block: copy overruns output")
        ref = op - offset
        if offset >= length:  # disjoint: one slice copy
            out[op : op + length] = out[ref : ref + length]
            op += length
        else:  # overlapping run (RLE-style): reads bytes it just wrote
            for _ in range(length):
                out[op] = out[ref]
                op += 1
                ref += 1
    if op != ulen:
        raise ValueError(f"snappy block decoded {op} bytes, expected {ulen}")
    return bytes(out)


# ---------------------------------------------------------------------------
# byte-shuffle (c-blosc shuffle.c generic semantics: complete elements are
# transposed into byte planes; a trailing partial element rides verbatim)
# ---------------------------------------------------------------------------


def shuffle(buf: bytes, typesize: int) -> bytes:
    if typesize <= 1:
        return bytes(buf)
    n = len(buf) // typesize
    head = n * typesize
    planes = (
        np.frombuffer(buf[:head], dtype=np.uint8).reshape(n, typesize).T
    )
    return planes.tobytes() + bytes(buf[head:])


def unshuffle(buf: bytes, typesize: int) -> bytes:
    if typesize <= 1:
        return bytes(buf)
    n = len(buf) // typesize
    head = n * typesize
    rows = (
        np.frombuffer(buf[:head], dtype=np.uint8).reshape(typesize, n).T
    )
    return rows.tobytes() + bytes(buf[head:])


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def _nsplits(flags: int, typesize: int, bsize: int, leftover: bool) -> int:
    """c-blosc's deterministic split-count rule (blosc.c blosc_d).

    Matches the reference decode rule exactly: typesize <= MAX_SPLITS,
    blocksize/typesize >= MIN_BUFFERSIZE, not the leftover block, and the
    dont_split header bit clear. There is deliberately NO divisibility
    condition — c-blosc does not check one (its writer always aligns
    blocksize to typesize, so ``bsize // nsplits`` is exact for any
    c-blosc-written buffer; a hypothetical non-aligned split block decodes
    short and is caught loudly by the container's final nbytes check).
    """
    if (
        not (flags & _FLAG_DONT_SPLIT)
        and 1 <= typesize <= _MAX_SPLITS
        and bsize // typesize >= _MIN_BUFFERSIZE
        and not leftover
    ):
        return typesize
    return 1


def decompress(buf: bytes) -> bytes:
    """Decode one Blosc1 container (any compliant writer) → raw bytes."""
    if len(buf) < 16:
        raise ValueError(f"blosc buffer of {len(buf)} bytes has no header")
    version, _versionlz, flags, typesize = buf[0], buf[1], buf[2], buf[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", buf, 4)
    if version > _VERSION_FORMAT:
        # Strictly gate on the blosc1 format versions this module was
        # written against — a higher version byte (blosc2 frame, future
        # layout) carries no evidence it shares the blosc1 layout.
        raise _gate(f"blosc format version {version} (blosc2 frame?)")
    if cbytes != len(buf):
        raise ValueError(f"header says {cbytes} bytes, buffer has {len(buf)}")
    if nbytes < 0:
        raise ValueError(f"corrupt blosc header: nbytes={nbytes}")
    if flags & _FLAG_MEMCPY:
        if len(buf) < 16 + nbytes:
            raise ValueError("memcpy-mode blosc buffer shorter than nbytes")
        return bytes(buf[16 : 16 + nbytes])
    if blocksize <= 0:
        raise ValueError(f"corrupt blosc header: blocksize={blocksize}")
    if flags & _FLAG_BITSHUFFLE:
        raise _gate("bit-shuffle (flags bit 2)")
    codec = (flags >> 5) & 0x7
    if codec == _CODEC_LZ4:
        dec = lz4_decompress
    elif codec == _CODEC_ZLIB:

        def dec(b: bytes, size: int) -> bytes:  # noqa: ARG001
            try:
                return zlib.decompress(b)
            except zlib.error as exc:
                raise ValueError(f"corrupt zlib split: {exc}") from exc

    elif codec == _CODEC_ZSTD:
        # c-blosc compresses each split with ZSTD_compress, i.e. one
        # complete zstd frame per split — decoded by the dependency-free
        # RFC 8878 decoder (round 8; the most common real-world Zarr
        # compressor, previously the top-ranked missing format)
        from amazon_climate_data_etl_spark.sources import zstd_min

        def dec(b: bytes, size: int) -> bytes:  # noqa: ARG001
            return zstd_min.decompress(b)

    elif codec == _CODEC_SNAPPY:
        # c-blosc compresses each split with snappy_compress — one raw
        # snappy block (varint preamble + elements) per split; the
        # expected split size bounds the preamble before allocation
        def dec(b: bytes, size: int) -> bytes:
            return snappy_decompress(b, max_len=size)

    else:
        raise _gate(f"blosc inner codec {_CODEC_NAMES.get(codec, codec)!r}")

    nblocks = -(-nbytes // blocksize)
    if len(buf) < 16 + 4 * nblocks:
        raise ValueError(
            f"blosc buffer of {len(buf)} bytes truncates the "
            f"{nblocks}-entry block index"
        )
    bstarts = struct.unpack_from(f"<{nblocks}i", buf, 16)
    out = bytearray()
    for j in range(nblocks):
        leftover = j == nblocks - 1 and nbytes % blocksize != 0
        bsize = (nbytes % blocksize) if leftover else blocksize
        nsplits = _nsplits(flags, typesize, bsize, leftover)
        neblock = bsize // nsplits
        pos = bstarts[j]
        if pos < 16 or pos > len(buf):
            raise ValueError(f"corrupt blosc block index: start {pos}")
        block = bytearray()
        for _ in range(nsplits):
            if pos + 4 > len(buf):
                raise ValueError("truncated blosc split header")
            (csize,) = struct.unpack_from("<i", buf, pos)
            pos += 4
            if csize < 0 or pos + csize > len(buf):
                raise ValueError(
                    f"corrupt blosc split: csize {csize} at {pos} overruns "
                    f"{len(buf)}-byte buffer"
                )
            payload = buf[pos : pos + csize]
            pos += csize
            if csize == neblock:  # stored-raw split
                block += payload
            else:
                piece = dec(payload, neblock)
                if len(piece) != neblock:
                    raise ValueError(
                        f"split decoded {len(piece)} bytes, expected {neblock}"
                    )
                block += piece
        if flags & _FLAG_SHUFFLE and typesize > 1:
            block = unshuffle(bytes(block), typesize)
        out += block
    if len(out) != nbytes:
        raise ValueError(f"blosc decoded {len(out)} bytes, expected {nbytes}")
    return bytes(out)


def _default_blocksize(nbytes: int, typesize: int) -> int:
    bs = min(max(nbytes, typesize), 1 << 16)
    if typesize > 0:
        bs -= bs % typesize or 0
    return max(bs, typesize, 1)


def compress(
    data: bytes,
    typesize: int,
    cname: str = "lz4",
    do_shuffle: bool = True,
    blocksize: int = 0,
) -> bytes:
    """Encode raw bytes as a Blosc1 container any compliant reader (incl.
    python-blosc) can decode. ``blocksize=0`` picks a 64 KiB-capped block
    aligned to ``typesize``; falls back to memcpy mode when compression
    does not pay."""
    if cname == "lz4":
        codec, enc = _CODEC_LZ4, lz4_compress
    elif cname == "zlib":
        codec, enc = _CODEC_ZLIB, zlib.compress
    else:
        raise _gate(f"blosc inner codec {cname!r} for writing")
    if not 1 <= typesize <= 255:
        typesize = 1
    nbytes = len(data)
    if blocksize <= 0:
        blocksize = _default_blocksize(nbytes, typesize)
    if blocksize % typesize:
        raise ValueError(f"blocksize {blocksize} not aligned to typesize {typesize}")

    do_shuffle = do_shuffle and typesize > 1
    # split exactly when c-blosc 1.14+ would for this codec, and say so in
    # the header (dont_split bit) so any decoder recomputes the same count
    split_ok = cname in ("lz4", "blosclz")
    flags = (codec << 5) | (_FLAG_SHUFFLE if do_shuffle else 0)
    if not split_ok:
        flags |= _FLAG_DONT_SPLIT

    nblocks = -(-nbytes // blocksize) if nbytes else 0
    bstarts: list[int] = []
    payloads: list[bytes] = []
    pos = 16 + 4 * nblocks
    for j in range(nblocks):
        leftover = j == nblocks - 1 and nbytes % blocksize != 0
        bsize = (nbytes % blocksize) if leftover else blocksize
        block = data[j * blocksize : j * blocksize + bsize]
        if do_shuffle:
            block = shuffle(block, typesize)
        nsplits = _nsplits(flags, typesize, bsize, leftover)
        neblock = bsize // nsplits
        parts = []
        for s in range(nsplits):
            piece = block[s * neblock : (s + 1) * neblock]
            comp = enc(piece)
            if len(comp) >= neblock:  # stored-raw split
                comp = piece
            parts.append(struct.pack("<i", len(comp)) + comp)
        payload = b"".join(parts)
        bstarts.append(pos)
        payloads.append(payload)
        pos += len(payload)

    cbytes = pos
    if cbytes >= nbytes + 16:  # compression does not pay: memcpy mode
        header = struct.pack(
            "<BBBBiii",
            _VERSION_FORMAT,
            1,
            _FLAG_MEMCPY,
            typesize,
            nbytes,
            blocksize,
            nbytes + 16,
        )
        return header + data
    header = struct.pack(
        "<BBBBiii", _VERSION_FORMAT, 1, flags, typesize, nbytes, blocksize, cbytes
    )
    return header + struct.pack(f"<{nblocks}i", *bstarts) + b"".join(payloads)
