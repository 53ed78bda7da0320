"""Regenerate the committed media oracle sidecars under fixtures/.

Each sidecar holds the NON-SQL-EXPRESSIBLE half of a media query — the
decode-kernel output that DuckDB cannot recompute — produced by the
INDEPENDENT pure-Python twin path (stdlib ``wave`` decode + plain-int
arithmetic for audio; ``avi_min``/``_png_decode_minimal`` container parse
+ plain-int pixel loops for video; NOT the Spark kernels' numpy math), so
driver hash-agreement between the Spark query and the sidecar-fed oracle
certifies the Spark kernels end-to-end. The SQL-EXPRESSIBLE half
(strict-mean thresholding, run-length segmentation, cut counting) stays
OUT of the sidecars: the oracles replay it in DuckDB window/aggregate SQL
over these rows, so a segmentation-math bug in either engine still
hash-mismatches.

Payloads derive only from (seed=42, media_id) — ``synthesize_media_item``
— and lower-SF media tables are row-subsets of higher-SF ones, so one
sidecar covering ids < 9600 (= sf0.1, the largest SF the oracles serve;
media_count_for scales 96 ids per 0.001 SF) serves every SF via the
oracle's ``media_id < n`` predicate. Freshness is re-asserted every test
run by tests/test_media_twin.py's sidecar tests (full coverage at the
sf0.001 subset, a deterministic stride across the rest).

Run from the repo root: ``python tools/gen_media_sidecars.py``
"""

from __future__ import annotations

import io
import os
import sys
import wave

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazon_climate_data_etl_spark.sources.avi_min import read_avi
from amazon_climate_data_etl_spark.sources.multimodal import (
    _SEGMENT_FRAME_MS,
    _png_decode_minimal,
    png_encode_minimal,
    synthesize_media_item,
)

MAX_ID = 9600  # media_count_for('/root/testdata/sf0.1')
FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def audio_frame_energies(content: bytes) -> list[int]:
    """Per-frame int energies of one WAV, PLAIN PYTHON INTS (the twin
    path: stdlib wave decode, byte-wise sample extraction, exact square
    sums) — mirrors tests/test_media_twin.py's audio twin, NOT the Spark
    kernel's numpy pipeline."""
    with wave.open(io.BytesIO(content)) as w:
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    pcm = [
        int.from_bytes(raw[j : j + 2], "little", signed=True)
        for j in range(0, len(raw), 2)
    ]
    flen = max(1, rate * _SEGMENT_FRAME_MS // 1000)
    nf = len(pcm) // flen
    return [
        sum(s * s for s in pcm[k * flen : (k + 1) * flen]) for k in range(nf)
    ]


def pipeline_rows(i: int, item: dict):
    """media_pipeline.parquet rows for one item (the r13 graduation
    sidecar): a 'features' row per item (payload length, sha256,
    zlib-compressed length — the inputs of the per-kind feature
    aggregation), one 'frames' row per sampled video frame (byte length
    of the AVI frame on screen at each 500 ms grid point), and a
    'resize' row per image (byte length of the 32×32 nearest-neighbor
    re-encoded PNG, resample indices computed independently of the Spark
    kernel's clip form).

    COMPRESSOR PIN: unlike the phash/energy/framediff sidecars (pure
    arithmetic over decoded bytes), comp_len and the resize n_bytes
    depend on zlib's exact level-default output length — a runtime
    linking a different deflate (e.g. zlib-ng) would compute different
    lengths. That divergence fails LOUDLY before any driver run:
    tests/test_media_twin.py::test_pipeline_sidecar_matches_twin
    recomputes these values with the runtime's own zlib every suite run
    and compares them to the committed sidecar."""
    import hashlib
    import zlib

    content = item["content"]
    yield ("features", i, item["kind"], 0, len(content),
           hashlib.sha256(content).hexdigest(), len(zlib.compress(content)))
    if item["kind"] == "video":
        v = read_avi(content)
        for k in range(item["duration_ms"] // 500 + 1):
            yield ("frames", i, "video", k,
                   len(v.frames[v.frame_at_ms(k * 500)]), None, None)
    elif item["kind"] == "image":
        px = _png_decode_minimal(content)
        h, w = px.shape[:2]
        ys = [min(h - 1, y * h // 32) for y in range(32)]
        xs = [min(w - 1, x * w // 32) for x in range(32)]
        out = px[ys][:, xs]
        yield ("resize", i, "image", 0,
               len(png_encode_minimal(out)), None, None)


def video_frame_diffs(content: bytes) -> tuple[int, list[int]]:
    """(n_frames, per-boundary abs-diff sums) of one MPNG AVI, PLAIN
    PYTHON INT pixel loops over the shared pure-Python decoders."""
    video = read_avi(content)
    frames = [_png_decode_minimal(f).tolist() for f in video.frames]
    nf = len(frames)
    diffs = []
    for i in range(1, nf):
        d = 0
        for ra, rb in zip(frames[i], frames[i - 1]):
            for pa, pb in zip(ra, rb):
                for ca, cb in zip(pa, pb):
                    d += abs(ca - cb)
        diffs.append(d)
    return nf, diffs


def main() -> None:
    # select which sidecars to (re)generate: 'all' (default), 'pipeline'
    # (only the r13 media_pipeline.parquet), or 'legacy' (only the r11
    # energies/framediffs pair) — regeneration is deterministic either
    # way, the selector just saves the slow pure-Python video-diff loops
    # when only the pipeline sidecar changed
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which not in ("all", "pipeline", "legacy"):
        raise SystemExit(
            f"unknown sidecar selector {which!r}: use all | pipeline | legacy"
        )
    do_pipeline = which in ("all", "pipeline")
    do_legacy = which in ("all", "legacy")
    a_ids, a_fidx, a_energy = [], [], []
    v_ids, v_nf, v_didx, v_diff = [], [], [], []
    p_rows = []
    for i in range(MAX_ID):
        kind = ("image", "audio", "video")[i % 3]
        item = synthesize_media_item(i)
        if do_pipeline:
            p_rows.extend(pipeline_rows(i, item))
        if not do_legacy or kind == "image":
            if i % 600 == 599:
                print(f"  ... {i + 1}/{MAX_ID}", flush=True)
            continue
        if kind == "audio":
            for k, e in enumerate(audio_frame_energies(item["content"])):
                a_ids.append(i)
                a_fidx.append(k)
                a_energy.append(e)
        else:
            nf, diffs = video_frame_diffs(item["content"])
            # diff_idx is the FRAME index of the boundary's later frame
            # (1..nf-1), matching the kernel's first_cut convention
            for k, d in enumerate(diffs, start=1):
                v_ids.append(i)
                v_nf.append(nf)
                v_didx.append(k)
                v_diff.append(d)
        if i % 600 == 599:
            print(f"  ... {i + 1}/{MAX_ID}", flush=True)

    if do_legacy:
        pq.write_table(
            pa.table(
                {
                    "media_id": pa.array(a_ids, pa.int64()),
                    "frame_idx": pa.array(a_fidx, pa.int32()),
                    "energy": pa.array(a_energy, pa.int64()),
                }
            ),
            os.path.join(FIXTURES, "media_energies.parquet"),
        )
        pq.write_table(
            pa.table(
                {
                    "media_id": pa.array(v_ids, pa.int64()),
                    "n_frames": pa.array(v_nf, pa.int32()),
                    "diff_idx": pa.array(v_didx, pa.int32()),
                    "diff": pa.array(v_diff, pa.int64()),
                }
            ),
            os.path.join(FIXTURES, "media_framediffs.parquet"),
        )
        print(f"audio rows: {len(a_ids)}, video rows: {len(v_ids)}")
    if do_pipeline:
        cols = list(zip(*p_rows))
        pq.write_table(
            pa.table(
                {
                    "stage": pa.array(cols[0], pa.string()),
                    "media_id": pa.array(cols[1], pa.int64()),
                    "kind": pa.array(cols[2], pa.string()),
                    "row_idx": pa.array(cols[3], pa.int32()),
                    "n_bytes": pa.array(cols[4], pa.int64()),
                    "sha256": pa.array(cols[5], pa.string()),
                    "comp_len": pa.array(cols[6], pa.int64()),
                }
            ),
            os.path.join(FIXTURES, "media_pipeline.parquet"),
        )
        print(f"pipeline rows: {len(p_rows)}")


if __name__ == "__main__":
    main()
