"""Minimal dependency-free WARC (ISO 28500) reader/writer — the raw
format of web-crawl corpora (Common Crawl ships ``.warc.gz``), supported
as an ingest boundary so a crawl drops straight into the engine's
extract → dedup → tokenize pipeline (html_boilerplate_extract et al.).

Clean-room implementation of the PUBLIC spec (ISO 28500 / the WARC 1.1
format document): a WARC file is a sequence of records — a version line
(``WARC/1.0`` or ``WARC/1.1``), CRLF-terminated named headers, a blank
line, a Content-Length-sized block, and a mandatory CRLF CRLF record
separator. The ``.warc.gz`` convention compresses EACH record as its own
gzip member, which is what makes a 1 GB crawl file splittable at member
boundaries; this reader handles both member-per-record and
whole-file-single-member layouts via zlib's ``unused_data`` walk.

Reading is DISTRIBUTED and collect-free, the Arrow-IPC/Zarr shape: a
``binaryFile`` scan of the ``.warc``/``.warc.gz`` objects → Arrow-batched
``mapInPandas`` decode, one file per task (Common Crawl's ~1 GB segment
files are exactly this task unit; at 100 TB the fan-out is the file
count). Corrupt input FAILS LOUDLY — truncated blocks, missing
Content-Length, a bad version line, or a missing record separator raise
with offsets rather than yielding silently-truncated corpora (the same
contract as zstd_min/blosc_min).

Task-memory contract (r12): decoding is MEMBER-AT-A-TIME and the reader
emits CHUNKED output frames, so a task's transient peak is the raw file
bytes (the ``binaryFile`` row — unavoidable at this API) plus ONE
decompressed gzip member plus one bounded output chunk. In the
splittable member-per-record layout that is one record, not the ~4-5×
whole-file expansion of a 1 GB Common Crawl segment; only the
degenerate whole-file-single-member layout still holds a full
decompressed copy (inherent to that layout). A record may NOT span gzip
members (the splittable convention's invariant) — a member ending
mid-record raises, same fail-loud contract.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"
_VERSIONS = (b"WARC/1.0", b"WARC/1.1")


@dataclass
class WarcRecord:
    version: str
    headers: dict = field(default_factory=dict)  # case-preserved; lookups via get()
    block: bytes = b""

    def get(self, name: str, default: str | None = None) -> str | None:
        low = name.lower()
        for k, v in self.headers.items():
            if k.lower() == low:
                return v
        return default

    @property
    def warc_type(self) -> str:
        return self.get("WARC-Type", "") or ""


def _iter_gunzip_members(data: bytes) -> Iterator[bytes]:
    """Yield each decompressed gzip member ONE AT A TIME (member-per-record
    .warc.gz layout; a single whole-file member is the degenerate case) —
    the memory contract: at most one member is materialized at once."""
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)
        try:
            member = d.decompress(rest)
        except zlib.error as e:  # non-gzip bytes between/after members
            raise ValueError(f"warc: corrupt gzip member ({e})") from e
        if not d.eof:
            raise ValueError("warc: truncated gzip member")
        yield member
        rest = d.unused_data


def iter_warc(data: bytes) -> Iterator[WarcRecord]:
    """Yield every record in one WARC object (gzip auto-detected),
    decoding member-at-a-time so peak memory is one decompressed member
    (= one record in the splittable layout), never the whole expanded
    file. A record spanning gzip members raises (the splittable
    convention's invariant: members hold whole records). A zero-byte
    object yields nothing (visible in any file listing, unlike a
    mid-record truncation — which raises)."""
    if data[:2] == b"\x1f\x8b":
        for member in _iter_gunzip_members(data):
            yield from _parse_uncompressed(member)
    else:
        yield from _parse_uncompressed(data)


def parse_warc(data: bytes) -> list[WarcRecord]:
    """Eager form of :func:`iter_warc` (tests / small objects)."""
    return list(iter_warc(data))


def _parse_uncompressed(data: bytes) -> Iterator[WarcRecord]:
    """Parse records from one uncompressed buffer (a gzip member, or the
    whole object for plain ``.warc``); offsets in errors are relative to
    this buffer."""
    pos = 0
    n = len(data)
    while pos < n:
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError(f"warc: no version line at offset {pos}")
        version = data[pos:eol]
        if version not in _VERSIONS:
            raise ValueError(
                f"warc: bad version line {version[:20]!r} at offset {pos}"
            )
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError(f"warc: unterminated headers at offset {pos}")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"warc: malformed header {line[:40]!r}")
            headers[k.decode("utf-8")] = v.strip().decode("utf-8")
        length_s = next(
            (v for k, v in headers.items() if k.lower() == "content-length"), None
        )
        if length_s is None or not length_s.isdigit():
            raise ValueError("warc: record missing a numeric Content-Length")
        length = int(length_s)
        if pos + length > n:
            raise ValueError(
                f"warc: block truncated (need {length} bytes at offset {pos})"
            )
        block = data[pos : pos + length]
        pos += length
        if data[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError(f"warc: missing record separator at offset {pos}")
        pos += 4
        yield WarcRecord(version.decode(), headers, block)


def http_payload(record: WarcRecord) -> tuple[int, dict, bytes]:
    """Split a response record's block into (status, headers, body). WARC
    response blocks are verbatim HTTP messages (status line + headers +
    CRLF CRLF + body)."""
    head, sep, body = record.block.partition(_CRLF + _CRLF)
    if not sep:
        raise ValueError("warc: response block has no HTTP header terminator")
    lines = head.split(_CRLF)
    parts = lines[0].split(b" ", 2)
    if len(parts) < 2 or not parts[1].isdigit():
        raise ValueError(f"warc: bad HTTP status line {lines[0][:40]!r}")
    headers = {}
    for line in lines[1:]:
        k, s, v = line.partition(b":")
        if s:
            headers[k.decode("utf-8").strip()] = v.strip().decode("utf-8")
    return int(parts[1]), headers, body


def build_warc(records: list[dict], gzip_per_record: bool = False) -> bytes:
    """Serialize records (dicts with ``headers`` incl. WARC-Type, and
    ``block`` bytes) — the test/writer half of the boundary. Adds the
    mandatory Content-Length; optional member-per-record gzip (the
    splittable .warc.gz convention). Fail-loud AT WRITE TIME, matching the
    reader's boundary contract: a header name containing ':' or either
    side containing CR/LF would serialize structurally corrupt framing
    that only surfaces at parse time, so it raises here instead."""
    out = []
    for r in records:
        headers = dict(r.get("headers", {}))
        for k, v in headers.items():
            if ":" in k or "\r" in k or "\n" in k or not k:
                raise ValueError(f"warc: invalid header name {k!r}")
            if "\r" in str(v) or "\n" in str(v):
                raise ValueError(f"warc: header {k!r} value contains CR/LF")
        block = r.get("block", b"")
        headers["Content-Length"] = str(len(block))
        buf = (
            b"WARC/1.1" + _CRLF
            + b"".join(
                f"{k}: {v}".encode("utf-8") + _CRLF for k, v in headers.items()
            )
            + _CRLF
            + block
            + _CRLF + _CRLF
        )
        if gzip_per_record:
            co = zlib.compressobj(wbits=31)
            buf = co.compress(buf) + co.flush()
        out.append(buf)
    return b"".join(out)


_READ_SCHEMA = (
    "file string, record_idx int, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, payload binary"
)


# output rows per emitted pandas frame: bounds the decoded-rows side of a
# task's memory to one chunk regardless of records-per-file (the raw file
# bytes + one gzip member being the other, fixed, side — module docstring)
_READ_CHUNK_ROWS = 1024

_READ_COLUMNS = [
    "file", "record_idx", "warc_type", "target_uri",
    "warc_date", "content_type", "http_status", "payload",
]


def read_warc(
    spark: SparkSession, path: str, record_types: tuple[str, ...] | None = None
) -> DataFrame:
    """Distributed WARC scan: ``binaryFile`` over the objects →
    Arrow-batched per-file decode, one short row per record (response
    records carry the HTTP body as ``payload`` and its status; other
    record types carry the raw block). No driver-side decode, no collect;
    records decode member-at-a-time and rows flush every
    ``_READ_CHUNK_ROWS``, so task memory never holds a whole expanded
    segment (module docstring's memory contract).

    ``record_types`` pushes the type filter INTO the decoder (r12): a
    real Common Crawl segment interleaves request + response + metadata
    records, so ``record_types=("response",)`` skips ~2/3 of the payload
    bytes BEFORE they cross the Arrow boundary — the decode-side
    equivalent of parquet predicate pushdown (a post-hoc
    ``.filter(warc_type == ...)`` ships every block first). Skipped
    records still count toward ``record_idx`` (it stays the record's
    position IN THE FILE, stable under any filter), and framing of
    skipped records is still fully validated — filtering never weakens
    the fail-loud contract."""
    import pandas as pd

    from amazon_climate_data_etl_spark.session import ship_package_to_workers

    ship_package_to_workers(spark)
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )
    wanted = set(record_types) if record_types is not None else None

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[tuple] = []
        for pdf in batches:
            for p, c in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(iter_warc(bytes(c))):
                    if wanted is not None and rec.warc_type not in wanted:
                        continue
                    status, body = None, rec.block
                    if rec.warc_type == "response":
                        status, _, body = http_payload(rec)
                    rows.append(
                        (
                            p,
                            i,
                            rec.warc_type,
                            rec.get("WARC-Target-URI"),
                            rec.get("WARC-Date"),
                            rec.get("Content-Type"),
                            status,
                            body,
                        )
                    )
                    if len(rows) >= _READ_CHUNK_ROWS:
                        yield pd.DataFrame(rows, columns=_READ_COLUMNS)
                        rows = []
        if rows:
            yield pd.DataFrame(rows, columns=_READ_COLUMNS)

    return raw.mapInPandas(worker, schema=_READ_SCHEMA)
