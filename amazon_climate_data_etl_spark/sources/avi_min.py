"""Minimal pure-Python AVI (RIFF) container reader/writer.

The AVI container is a public RIFF layout (Microsoft "AVI RIFF File
Reference"): a 'RIFF/AVI ' file holds an 'hdrl' LIST (main header 'avih'
+ one 'strl' stream LIST with 'strh'/'strf') and a 'movi' LIST whose
'00dc'/'00db' chunks are the compressed video frames. For intra-only
codecs every chunk is a standalone image — 'MJPG' chunks are JPEG files,
'MPNG' chunks are PNG files.

This module gives the multimodal operators REAL video handling in a
dependency-free container, the same clean-room pattern as the PNG/WAV/
NetCDF/shapefile codecs: parse the container, recover frame timing from
the stream header, and hand each sampled frame's bytes to the image
decoder. With the MPNG codec the in-repo minimal PNG decoder yields real
pixels end-to-end; interframe codecs (H.264 etc.) are not decodable
frame-by-frame and stay gated behind ffmpeg with a clear error.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_VIDEO_CHUNKS = (b"dc", b"db")  # compressed / uncompressed DIB frame


@dataclass
class AviVideo:
    codec: str                 # fourcc, e.g. 'MPNG', 'MJPG'
    width: int
    height: int
    us_per_frame: int          # frame interval in microseconds
    frames: list[bytes]        # one entry per video frame, in order

    @property
    def fps(self) -> float:
        return 1e6 / self.us_per_frame

    @property
    def duration_ms(self) -> int:
        return int(len(self.frames) * self.us_per_frame / 1000)

    def frame_at_ms(self, ts_ms: float) -> int:
        """Index of the frame on screen at ``ts_ms`` (clamped)."""
        if not self.frames:
            raise ValueError("AVI has no video frames; cannot sample")
        idx = int(ts_ms * 1000 // self.us_per_frame)
        return max(0, min(idx, len(self.frames) - 1))


def _chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size); RIFF pads to even."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def read_avi(content: bytes) -> AviVideo:
    """Parse AVI bytes into codec + timing + per-frame payloads."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI file (RIFF/'AVI ' header expected)")
    us_per_frame = width = height = None
    codec = ""
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal us_per_frame, width, height, codec
        for fourcc, p, size in _chunks(content, pos, end):
            if fourcc == b"LIST":
                walk(p + 4, p + size)  # first 4 bytes are the list type
            elif fourcc == b"avih":
                us_per_frame = struct.unpack_from("<I", content, p)[0]
                width, height = struct.unpack_from("<II", content, p + 32)
            elif fourcc == b"strh":
                if content[p : p + 4] == b"vids":
                    codec = content[p + 4 : p + 8].decode("ascii").strip("\x00 ")
            elif len(fourcc) == 4 and fourcc[2:] in _VIDEO_CHUNKS:
                frames.append(content[p : p + size])

    (riff_size,) = struct.unpack_from("<I", content, 4)
    walk(12, min(8 + riff_size, len(content)))
    if us_per_frame is None:
        raise ValueError("AVI without an avih main header")
    return AviVideo(codec, width or 0, height or 0, us_per_frame, frames)


def write_avi(
    frames: list[bytes],
    width: int,
    height: int,
    us_per_frame: int = 500_000,
    codec: str = "MPNG",
) -> bytes:
    """Serialize frames into a spec-valid single-stream AVI (inverse of
    ``read_avi`` on the supported subset; fixture generation)."""
    fourcc = codec.encode("ascii").ljust(4)[:4]
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + fourcc
        + struct.pack("<IHHIIIIIIIi4H",
                      0, 0, 0, 0,
                      us_per_frame, 1_000_000,  # scale/rate: fps = rate/scale
                      0, len(frames), 0, 0, -1, 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, fourcc, 0, 0, 0, 0, 0,
    )

    def chunk(cc: bytes, payload: bytes) -> bytes:
        return cc + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
