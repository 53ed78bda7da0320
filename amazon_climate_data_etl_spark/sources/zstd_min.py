"""Dependency-free Zstandard (RFC 8878) frame DECODER.

Modern Zarr archives overwhelmingly compress chunks with zstd — it is
numcodecs' blosc default ``cname`` and the zarr-python v3 default codec —
so a chunk-parallel ingest that only speaks lz4/zlib stumbles on exactly
the stores real users hand it (the round-7 review ranked this the
highest-probability missing-format gap). This module implements the
decode side of the public zstd format, spec'd in RFC 8878 and the
``zstd/doc/zstd_compression_format.md`` document, the same clean-room
pattern as ``blosc_min.py`` / ``hdf5_min.py``:

- frames: magic, frame header (window descriptor, single-segment,
  content size, content checksum), concatenated frames, skippable frames
- blocks: raw, RLE, compressed
- compressed blocks in full: the four literals modes (raw, RLE,
  Huffman-compressed with direct or FSE-compressed weights, treeless),
  1- and 4-stream Huffman, the three sequence symbol sets (literal
  length / offset / match length) under all four compression modes
  (predefined, RLE, FSE-described, repeat), the recent-offsets (repcode)
  history including the ``literals_length == 0`` shifted semantics, and
  cross-block state reuse (Huffman table, FSE tables, repcodes)
- content checksum: verified via the bundled pure-Python XXH64

FAILS LOUDLY (ValueError / NotImplementedError) on: dictionaries
(``Dictionary_ID != 0``), reserved block types, corrupt bitstreams,
checksum mismatches. There is deliberately NO encoder — archives are
foreign-written by definition, and the write path of every consumer here
(``blosc_min.compress``, Zarr fixtures) keeps its lz4/zlib gates.

Throughput posture: pure-Python entropy decoding is correct-but-slow
(~1 MB/s); a production deployment installs ``zstandard``/``blosc`` and
this boundary steps aside — identical to the LZ4 posture in
``blosc_min.py``. Conformance is tested against frames written by the
reference ``zstd`` CLI when present (auto-unskip), against committed
CLI-written vectors when not, and against hand-built spec vectors that
never touch an encoder (tests/test_zstd.py).
"""

from __future__ import annotations

import struct

_MAGIC = 0xFD2FB528
_SKIP_MAGIC_LO = 0x184D2A50  # skippable frames: 0x184D2A50..5F


def _gate(msg: str) -> NotImplementedError:
    return NotImplementedError(
        f"{msg}; this minimal zstd decoder covers dictionary-less RFC 8878 "
        "frames — install 'zstandard' for full coverage"
    )


# ---------------------------------------------------------------------------
# XXH64 (for the optional content checksum; public xxHash spec)
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        i = 0
        for i in range(0, n - 31, 32):
            a, b, c, d = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl((v1 + a * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + b * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + c * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + d * _P2) & _M64, 31) * _P1) & _M64
        i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
        i = 0
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h = (_rotl(h ^ ((_rotl((k * _P2) & _M64, 31) * _P1) & _M64), 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h = (_rotl(h ^ ((k * _P1) & _M64), 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h = ((h ^ (h >> 33)) * _P2) & _M64
    h = ((h ^ (h >> 29)) * _P3) & _M64
    return h ^ (h >> 32)


# ---------------------------------------------------------------------------
# bitstreams: zstd entropy payloads are read BACKWARD from a 1-bit
# sentinel in the last byte; FSE table descriptions are read FORWARD
# ---------------------------------------------------------------------------


class _BackStream:
    """Backward bit reader over one entropy payload. ``read`` consumes
    bits below the cursor; reading past the start pads with LOW zeros
    (the spec's defined behavior for final Huffman peeks) and sets
    ``overread`` so sequence decoding can fail loudly instead."""

    __slots__ = ("val", "bitpos", "overread")

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ValueError("corrupt zstd bitstream: missing sentinel bit")
        self.val = int.from_bytes(data, "little")
        self.bitpos = (len(data) - 1) * 8 + data[-1].bit_length() - 1
        self.overread = False

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self.bitpos -= n
        if self.bitpos >= 0:
            return (self.val >> self.bitpos) & ((1 << n) - 1)
        self.overread = True
        pad = -self.bitpos
        if pad >= n:
            return 0
        return (self.val & ((1 << (self.bitpos + n)) - 1)) << pad


class _FwdStream:
    """Forward LSB-first bit reader (FSE table descriptions)."""

    __slots__ = ("val", "pos", "nbits")

    def __init__(self, data: bytes):
        self.val = int.from_bytes(data, "little")
        self.pos = 0
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("corrupt zstd FSE description: overread")
        out = (self.val >> self.pos) & ((1 << n) - 1)
        self.pos += n
        return out

    def rewind(self, n: int) -> None:
        self.pos -= n

    def bytes_consumed(self) -> int:
        return (self.pos + 7) // 8


# ---------------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------------


class _FseTable:
    """Decode table: per-state (symbol, num_bits, new_state_base)."""

    __slots__ = ("accuracy_log", "syms", "nbits", "base")

    def __init__(self, accuracy_log: int, freqs: list[int]):
        self.accuracy_log = accuracy_log
        size = 1 << accuracy_log
        syms = [0] * size
        state_desc = [0] * len(freqs)
        high_threshold = size
        for s, f in enumerate(freqs):
            if f == -1:
                high_threshold -= 1
                syms[high_threshold] = s
                state_desc[s] = 1
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for s, f in enumerate(freqs):
            if f <= 0:
                continue
            state_desc[s] = f
            for _ in range(f):
                syms[pos] = s
                pos = (pos + step) & mask
                while pos >= high_threshold:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ValueError("corrupt zstd FSE table: spread did not close")
        nbits = [0] * size
        base = [0] * size
        for i in range(size):
            s = syms[i]
            nsd = state_desc[s]
            state_desc[s] += 1
            nb = accuracy_log - (nsd.bit_length() - 1)
            nbits[i] = nb
            base[i] = (nsd << nb) - size
        self.syms = syms
        self.nbits = nbits
        self.base = base

    def init_state(self, bs: _BackStream) -> int:
        return bs.read(self.accuracy_log)

    def peek(self, state: int) -> int:
        return self.syms[state]

    def update(self, state: int, bs: _BackStream) -> int:
        return self.base[state] + bs.read(self.nbits[state])


class _RleTable:
    """Degenerate 'table' for RLE symbol-compression mode: one symbol,
    zero-bit state updates."""

    __slots__ = ("sym",)

    def __init__(self, sym: int):
        self.sym = sym

    def init_state(self, bs: _BackStream) -> int:  # noqa: ARG002
        return 0

    def peek(self, state: int) -> int:  # noqa: ARG002
        return self.sym

    def update(self, state: int, bs: _BackStream) -> int:  # noqa: ARG002
        return 0


def _read_fse_freqs(fs: _FwdStream, max_accuracy: int, max_symbol: int):
    """Parse an FSE table description (RFC 8878 §4.1.1) → (accuracy, freqs)."""
    accuracy_log = fs.read(4) + 5
    if accuracy_log > max_accuracy:
        raise ValueError(
            f"zstd FSE accuracy {accuracy_log} exceeds max {max_accuracy}"
        )
    remaining = (1 << accuracy_log) + 1
    freqs: list[int] = []
    while remaining > 1:
        if len(freqs) > max_symbol:
            raise ValueError("corrupt zstd FSE description: too many symbols")
        bits = remaining.bit_length()
        val = fs.read(bits)
        lower_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        if (val & lower_mask) < threshold:
            fs.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        proba = val - 1
        freqs.append(proba)
        remaining -= -proba if proba < 0 else proba
        if proba == 0:
            repeat = fs.read(2)
            while repeat == 3:
                freqs.extend([0, 0, 0])
                repeat = fs.read(2)
            freqs.extend([0] * repeat)
    if remaining != 1:
        raise ValueError("corrupt zstd FSE description: counts overshoot")
    return accuracy_log, freqs


# ---------------------------------------------------------------------------
# Huffman (literals)
# ---------------------------------------------------------------------------

_HUF_MAX_BITS = 11


class _HufTable:
    __slots__ = ("max_bits", "syms", "nbits")

    def __init__(self, weights: list[int]):
        # last weight is implied: complete the 2^(w-1) kraft sum to the
        # next power of two
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ValueError("corrupt zstd Huffman weights: all zero")
        # the implied last weight completes the kraft sum to the NEXT
        # power of two (strictly greater — the remainder must be >= 1),
        # which is 2^bit_length(total) for every total incl. exact powers
        max_bits = total.bit_length()
        left = (1 << max_bits) - total
        if left & (left - 1):
            raise ValueError("corrupt zstd Huffman weights: non-pow2 remainder")
        weights = weights + [left.bit_length()]  # log2(left) + 1
        if max_bits > _HUF_MAX_BITS:
            raise ValueError(f"zstd Huffman max_bits {max_bits} > 11")
        if any(w > max_bits for w in weights):
            # would give a code of <= 0 bits; without this check the
            # rank bookkeeping below would silently negative-index
            raise ValueError("corrupt zstd Huffman weights: weight > max_bits")
        size = 1 << max_bits
        syms = bytearray(size)
        nbits = bytearray(size)
        bits_per_sym = [
            (max_bits + 1 - w) if w > 0 else 0 for w in weights
        ]
        # canonical fill: longest codes (lowest weight) occupy the lowest
        # table indices; symbols in natural order within a bit length
        rank_idx = [0] * (max_bits + 2)
        rank_count = [0] * (max_bits + 2)
        for b in bits_per_sym:
            if b:
                rank_count[b] += 1
        rank_idx[max_bits] = 0
        for b in range(max_bits, 0, -1):
            rank_idx[b - 1] = rank_idx[b] + rank_count[b] * (1 << (max_bits - b))
        if rank_idx[0] != size:
            raise ValueError("corrupt zstd Huffman weights: table underfilled")
        for sym, b in enumerate(bits_per_sym):
            if not b:
                continue
            code = rank_idx[b]
            span = 1 << (max_bits - b)
            for j in range(code, code + span):
                syms[j] = sym
                nbits[j] = b
            rank_idx[b] += span
        self.max_bits = max_bits
        self.syms = bytes(syms)
        self.nbits = bytes(nbits)

    def decode_stream(self, data: bytes, count: int) -> bytes:
        bs = _BackStream(data)
        out = bytearray(count)
        mb = self.max_bits
        for i in range(count):
            state = bs.read(mb)
            bs.bitpos += mb  # peek: restore, then consume the real length
            sym = self.syms[state]
            bs.bitpos -= self.nbits[state]
            out[i] = sym
        if bs.bitpos != 0:
            # > 0: unconsumed trailing bits; < 0: the stream ran DRY before
            # all symbols decoded (the back-stream pads past-start reads
            # with zeros, so without this check a truncated checksum-less
            # frame would silently decode to wrong literals — libzstd
            # rejects both via its end-of-stream check). A valid stream
            # ends exactly at the init-sentinel bit; only the restored
            # peeks above may legally dip negative mid-loop.
            raise ValueError("corrupt zstd Huffman stream: trailing bits")
        return bytes(out)


def _read_huffman_table(data: bytes, off: int) -> tuple[_HufTable, int]:
    """Huffman tree description (RFC 8878 §4.2.1) → (table, bytes used)."""
    hbyte = data[off]
    if hbyte >= 128:  # direct representation: 4-bit weights
        n = hbyte - 127
        nbytes = (n + 1) // 2
        raw = data[off + 1 : off + 1 + nbytes]
        if len(raw) < nbytes:
            raise ValueError("truncated zstd Huffman weights")
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return _HufTable(weights), 1 + nbytes
    # FSE-compressed weights: hbyte = compressed size
    payload = data[off + 1 : off + 1 + hbyte]
    if len(payload) < hbyte:
        raise ValueError("truncated zstd Huffman weight payload")
    fs = _FwdStream(payload)
    accuracy, freqs = _read_fse_freqs(fs, 6, 255)
    table = _FseTable(accuracy, freqs)
    rest = payload[fs.bytes_consumed() :]
    bs = _BackStream(rest)
    s1 = table.init_state(bs)
    s2 = table.init_state(bs)
    weights: list[int] = []
    while True:  # two interleaved states; ends when an update overreads
        weights.append(table.peek(s1))
        s1 = table.update(s1, bs)
        if bs.overread:
            weights.append(table.peek(s2))
            break
        weights.append(table.peek(s2))
        s2 = table.update(s2, bs)
        if bs.overread:
            weights.append(table.peek(s1))
            break
        if len(weights) > 255:
            raise ValueError("corrupt zstd Huffman weights: >255 symbols")
    if len(weights) > 255:
        raise ValueError("corrupt zstd Huffman weights: >255 symbols")
    return _HufTable(weights), 1 + hbyte


# ---------------------------------------------------------------------------
# sequence code tables (RFC 8878 §3.1.1.3.2.1)
# ---------------------------------------------------------------------------

_LL_BASE = (
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536,
)
_LL_BITS = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
)
_ML_BASE = (
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
)
_ML_BITS = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
)

# predefined distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEFAULT = (
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1,
)
_ML_DEFAULT = (
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1, -1, -1,
)
_OF_DEFAULT = (
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1,
)

_LL_TABLE_DEFAULT = _FseTable(6, list(_LL_DEFAULT))
_ML_TABLE_DEFAULT = _FseTable(6, list(_ML_DEFAULT))
_OF_TABLE_DEFAULT = _FseTable(5, list(_OF_DEFAULT))

_MAX_ACC = {"ll": 9, "of": 8, "ml": 9}
_MAX_SYM = {"ll": 35, "of": 31, "ml": 52}
_DEFAULTS = {
    "ll": _LL_TABLE_DEFAULT,
    "of": _OF_TABLE_DEFAULT,
    "ml": _ML_TABLE_DEFAULT,
}


# ---------------------------------------------------------------------------
# frame decoding
# ---------------------------------------------------------------------------


class _FrameState:
    __slots__ = ("huf", "tables", "reps")

    def __init__(self):
        self.huf: _HufTable | None = None
        self.tables: dict[str, object | None] = {"ll": None, "of": None, "ml": None}
        self.reps = [1, 4, 8]


def _decode_literals(block: bytes, st: _FrameState) -> tuple[bytes, int]:
    """Literals section → (literals, bytes consumed from the block)."""
    b0 = block[0]
    ltype = b0 & 0x3
    size_format = (b0 >> 2) & 0x3
    if ltype in (0, 1):  # raw / RLE
        if size_format in (0, 2):
            rs = b0 >> 3
            hdr = 1
        elif size_format == 1:
            rs = (b0 >> 4) | (block[1] << 4)
            hdr = 2
        else:
            rs = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            hdr = 3
        if ltype == 0:
            lits = bytes(block[hdr : hdr + rs])
            if len(lits) != rs:
                raise ValueError("truncated zstd raw literals")
            return lits, hdr + rs
        return bytes([block[hdr]]) * rs, hdr + 1
    # compressed / treeless
    if size_format == 0:
        streams, hdr = 1, 3
        rs = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        cs = (block[1] >> 6) | (block[2] << 2)
    elif size_format == 1:
        streams, hdr = 4, 3
        rs = (b0 >> 4) | ((block[1] & 0x3F) << 4)
        cs = (block[1] >> 6) | (block[2] << 2)
    elif size_format == 2:
        streams, hdr = 4, 4
        rs = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x3) << 12)
        cs = (block[2] >> 2) | (block[3] << 6)
    else:
        streams, hdr = 4, 5
        rs = (b0 >> 4) | (block[1] << 4) | ((block[2] & 0x3F) << 12)
        cs = (block[2] >> 6) | (block[3] << 2) | (block[4] << 10)
    payload = block[hdr : hdr + cs]
    if len(payload) != cs:
        raise ValueError("truncated zstd compressed literals")
    off = 0
    if ltype == 2:  # fresh Huffman table
        st.huf, used = _read_huffman_table(payload, 0)
        off = used
    elif st.huf is None:
        raise ValueError("zstd treeless literals with no previous table")
    huf = st.huf
    if streams == 1:
        return huf.decode_stream(payload[off:], rs), hdr + cs
    if cs - off < 6:
        raise ValueError("truncated zstd literal jump table")
    s1, s2, s3 = struct.unpack_from("<HHH", payload, off)
    off += 6
    body = payload[off:]
    if s1 + s2 + s3 > len(body):
        raise ValueError("corrupt zstd literal jump table")
    per = (rs + 3) // 4
    last = rs - 3 * per
    if last < 0:
        raise ValueError("corrupt zstd literals: regenerated size < 3 streams")
    parts = []
    bounds = [(0, s1, per), (s1, s1 + s2, per), (s1 + s2, s1 + s2 + s3, per),
              (s1 + s2 + s3, len(body), last)]
    for lo, hi, cnt in bounds:
        parts.append(huf.decode_stream(body[lo:hi], cnt))
    return b"".join(parts), hdr + cs


def _sequence_table(kind: str, mode: int, fs_data: bytes, off: int,
                    st: _FrameState) -> tuple[object, int]:
    """One symbol set's decode table per its compression mode."""
    if mode == 0:
        st.tables[kind] = _DEFAULTS[kind]
        return _DEFAULTS[kind], off
    if mode == 1:
        sym = fs_data[off]
        if sym > _MAX_SYM[kind]:
            raise ValueError(f"zstd RLE {kind} symbol {sym} out of range")
        t = _RleTable(sym)
        st.tables[kind] = t
        return t, off + 1
    if mode == 2:
        fs = _FwdStream(fs_data[off:])
        accuracy, freqs = _read_fse_freqs(fs, _MAX_ACC[kind], _MAX_SYM[kind])
        t = _FseTable(accuracy, freqs)
        st.tables[kind] = t
        return t, off + fs.bytes_consumed()
    prev = st.tables[kind]
    if prev is None:
        raise ValueError(f"zstd repeat mode for {kind} with no previous table")
    return prev, off


def _decode_block(block: bytes, st: _FrameState, out: bytearray) -> None:
    lits, consumed = _decode_literals(block, st)
    seq = block[consumed:]
    if not seq:
        raise ValueError("zstd block missing sequences section")
    b0 = seq[0]
    if b0 == 0:
        out.extend(lits)
        return
    if b0 < 128:
        nseq, off = b0, 1
    elif b0 < 255:
        nseq, off = ((b0 - 128) << 8) + seq[1], 2
    else:
        nseq, off = seq[1] + (seq[2] << 8) + 0x7F00, 3
    modes = seq[off]
    off += 1
    if modes & 0x3:
        raise ValueError("zstd sequences header: reserved mode bits set")
    ll_t, off = _sequence_table("ll", (modes >> 6) & 0x3, seq, off, st)
    of_t, off = _sequence_table("of", (modes >> 4) & 0x3, seq, off, st)
    ml_t, off = _sequence_table("ml", (modes >> 2) & 0x3, seq, off, st)
    bs = _BackStream(seq[off:])
    ll_s = ll_t.init_state(bs)
    of_s = of_t.init_state(bs)
    ml_s = ml_t.init_state(bs)
    if bs.overread:
        raise ValueError("corrupt zstd sequence bitstream: too short")
    reps = st.reps
    lit_pos = 0
    for i in range(nseq):
        of_code = of_t.peek(of_s)
        if of_code > 31:
            raise ValueError("corrupt zstd offset code")
        offset_value = (1 << of_code) + bs.read(of_code)
        ml_code = ml_t.peek(ml_s)
        ml = _ML_BASE[ml_code] + bs.read(_ML_BITS[ml_code])
        ll_code = ll_t.peek(ll_s)
        ll = _LL_BASE[ll_code] + bs.read(_LL_BITS[ll_code])
        if i != nseq - 1:
            ll_s = ll_t.update(ll_s, bs)
            ml_s = ml_t.update(ml_s, bs)
            of_s = of_t.update(of_s, bs)
        if bs.overread:
            raise ValueError("corrupt zstd sequence bitstream: overread")
        # recent-offsets history (RFC 8878 §3.1.1.5)
        if offset_value > 3:
            offset = offset_value - 3
            reps[2] = reps[1]
            reps[1] = reps[0]
            reps[0] = offset
        else:
            idx = offset_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = reps[0]
            elif idx < 3:
                offset = reps[idx]
                if idx == 2:
                    reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
            else:  # ll == 0 and offset_value == 3: rep1 - 1
                offset = reps[0] - 1
                if offset == 0:
                    raise ValueError("corrupt zstd repcode: offset 0")
                reps[2] = reps[1]
                reps[1] = reps[0]
                reps[0] = offset
        if lit_pos + ll > len(lits):
            raise ValueError("corrupt zstd sequence: literals overrun")
        out.extend(lits[lit_pos : lit_pos + ll])
        lit_pos += ll
        if offset > len(out):
            raise ValueError(
                f"corrupt zstd sequence: offset {offset} beyond history"
            )
        start = len(out) - offset
        if offset >= ml:
            out.extend(out[start : start + ml])
        else:
            for j in range(ml):
                out.append(out[start + j])
    out.extend(lits[lit_pos:])


def decompress_frame(data: bytes, off: int) -> tuple[bytes, int]:
    """Decode ONE zstd frame starting at ``off`` → (content, next offset).

    Truncation anywhere surfaces as ValueError (never a low-level
    struct.error / IndexError — the fuzz contract)."""
    try:
        return _decompress_frame(data, off)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated zstd frame: {exc}") from exc


def _decompress_frame(data: bytes, off: int) -> tuple[bytes, int]:
    (magic,) = struct.unpack_from("<I", data, off)
    if magic != _MAGIC:
        raise ValueError(f"not a zstd frame: magic {magic:#x}")
    off += 4
    fhd = data[off]
    off += 1
    if fhd & 0x08:
        raise ValueError("zstd frame header: reserved bit set")
    single_segment = bool(fhd & 0x20)
    checksum = bool(fhd & 0x04)
    dict_flag = fhd & 0x3
    fcs_flag = fhd >> 6
    if not single_segment:
        off += 1  # window descriptor (we decode whole frames in memory)
    if dict_flag:
        nbytes = (0, 1, 2, 4)[dict_flag]
        did = int.from_bytes(data[off : off + nbytes], "little")
        off += nbytes
        if did != 0:
            raise _gate(f"zstd dictionary {did}")
    fcs = None
    if fcs_flag == 0:
        if single_segment:
            fcs = data[off]
            off += 1
    elif fcs_flag == 1:
        fcs = struct.unpack_from("<H", data, off)[0] + 256
        off += 2
    elif fcs_flag == 2:
        (fcs,) = struct.unpack_from("<I", data, off)
        off += 4
    else:
        (fcs,) = struct.unpack_from("<Q", data, off)
        off += 8
    st = _FrameState()
    out = bytearray()
    while True:
        if off + 3 > len(data):
            raise ValueError("truncated zstd frame: missing block header")
        bh = data[off] | (data[off + 1] << 8) | (data[off + 2] << 16)
        off += 3
        last = bh & 1
        btype = (bh >> 1) & 0x3
        bsize = bh >> 3
        if btype == 0:  # raw
            if off + bsize > len(data):
                raise ValueError("truncated zstd raw block")
            out.extend(data[off : off + bsize])
            off += bsize
        elif btype == 1:  # RLE
            if off >= len(data):
                raise ValueError("truncated zstd RLE block")
            out.extend(bytes([data[off]]) * bsize)
            off += 1
        elif btype == 2:
            if off + bsize > len(data):
                raise ValueError("truncated zstd compressed block")
            _decode_block(bytes(data[off : off + bsize]), st, out)
            off += bsize
        else:
            raise ValueError("zstd reserved block type")
        if last:
            break
    if fcs is not None and len(out) != fcs:
        raise ValueError(
            f"zstd frame decoded {len(out)} bytes, header said {fcs}"
        )
    if checksum:
        (want,) = struct.unpack_from("<I", data, off)
        off += 4
        got = xxh64(bytes(out)) & 0xFFFFFFFF
        if got != want:
            raise ValueError(
                f"zstd content checksum mismatch: {got:#x} != {want:#x}"
            )
    return bytes(out), off


def decompress(data: bytes) -> bytes:
    """Decode a zstd stream: one or more concatenated frames (skippable
    frames are skipped), contents concatenated — the zstd CLI contract."""
    if len(data) < 4:
        raise ValueError("zstd input shorter than a magic number")
    out = bytearray()
    off = 0
    n = len(data)
    while off < n:
        if off + 4 > n:
            raise ValueError("trailing bytes after zstd frame")
        (magic,) = struct.unpack_from("<I", data, off)
        if _SKIP_MAGIC_LO <= magic <= _SKIP_MAGIC_LO + 0xF:
            if off + 8 > n:
                raise ValueError("truncated zstd skippable frame")
            (size,) = struct.unpack_from("<I", data, off + 4)
            off += 8 + size
            if off > n:
                raise ValueError("truncated zstd skippable frame body")
            continue
        piece, off = decompress_frame(data, off)
        out.extend(piece)
    return bytes(out)
