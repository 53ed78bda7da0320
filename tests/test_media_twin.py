"""Pure-Python recomputation twins for the rows-only media queries.

The driver records only a rows-only check for `media_feature_summary`,
`media_frame_pipeline` and `image_phash_neardup` (their decode kernels are
not SQL-expressible, so there is no DuckDB oracle). These twins close that
gap: each rebuilds the ENTIRE expected result set outside Spark — item
synthesis via the shared `synthesize_media_item` recipe, decode via the
independently-tested pure-Python codecs, aggregation/pairing re-derived in
plain Python (sorted-dict aggregation, brute-force all-pairs Hamming — no
banding, no mapInPandas, no Spark shuffle) — and asserts EXACT equality
with the Spark output. A wrong-but-deterministic Spark kernel, batching
bug, or aggregation slip now fails a value comparison, not just a shape
check.

Kernel-level independence lives in the companion micro-tests here
(featurizer vs a hand-computed expectation; dHash vs hand-derivable bit
patterns) and in test_multimodal.py's decoder tests against hand-built
filtered scanlines / known waveforms.
"""

from __future__ import annotations

import hashlib
import math
import zlib
import numpy as np

from amazon_climate_data_etl_spark.sources.avi_min import read_avi
from amazon_climate_data_etl_spark.sources.multimodal import (
    FEATURE_DIM,
    PHASH_HAMMING_MAX,
    _decode_real,
    _featurize_signal,
    _png_decode_minimal,
    dhash64,
    extract_features,
    image_phash_neardup,
    media_count_for,
    media_feature_summary,
    media_frame_pipeline,
    png_encode_minimal,
    synthesize_media_item,
    synthetic_media,
)

SF = "/root/testdata/sf0.001"
N_ITEMS = media_count_for(SF)  # 96


def _twin_items():
    return [synthesize_media_item(i) for i in range(N_ITEMS)]


# --- kernel micro-independence ---------------------------------------------


def test_featurize_signal_hand_computed():
    """The featurizer vs a by-hand expectation on inputs chosen so every
    histogram assignment is unambiguous (no bin-boundary values)."""
    vals = np.array([10.0, 10.0, 20.0, 30.0])  # lo=10 hi=30 span=20
    feat = _featurize_signal(vals)
    unit = np.array([0.0, 0.0, 0.5, 1.0])
    assert feat.shape == (FEATURE_DIM,)
    assert math.isclose(feat[0], unit.mean(), rel_tol=1e-6)
    assert math.isclose(feat[1], unit.std(), rel_tol=1e-6)
    assert math.isclose(feat[2], 10.0 / 11.0, rel_tol=1e-6)
    assert math.isclose(feat[3], 30.0 / 31.0, rel_tol=1e-6)
    # 12 bins over [0,1]: 0.0,0.0 → bin 0; 0.5 → bin 6; 1.0 → bin 11
    hist = np.zeros(12)
    hist[0], hist[6], hist[11] = 2, 1, 1
    assert np.allclose(feat[4:], hist / 4.0)


def test_dhash64_hand_patterns():
    """dHash bits derivable by hand: an image already at 8 rows × 9 cols
    with strictly increasing columns sets every gradient bit (hash = -1 as
    signed 64-bit); strictly decreasing sets none (hash = 0); flipping one
    comparison flips exactly that bit."""
    inc = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))[:, :, None]
    dec = inc[:, ::-1, :].copy()
    assert dhash64(inc) == -1
    assert dhash64(dec) == 0
    one = dec.astype(np.int32)
    one[0, 1, 0] = one[0, 0, 0] + 5  # col1 > col0 in row 0 → bit 0 only
    assert dhash64(one.astype(np.uint8)) == 1


# --- full-query recomputation twins ----------------------------------------


def test_media_feature_summary_twin_exact(spark):
    """Per-item features AND the aggregated summary, exact vs Spark."""
    items = _twin_items()
    expected_rows = {}
    for it in items:
        content = it["content"]
        feat = _decode_real(content, it["kind"])
        comp = len(zlib.compress(content))
        expected_rows[it["media_id"]] = (
            it["kind"],
            hashlib.sha256(content).hexdigest(),
            len(content),
            comp,
            min(1.0, comp / max(1, len(content))),
            [float(x) for x in feat],
        )

    got = extract_features(
        synthetic_media(spark, n=N_ITEMS), fake=False
    ).collect()
    assert len(got) == N_ITEMS
    for r in got:
        kind, sha, n_bytes, comp, entropy, feat = expected_rows[r["media_id"]]
        assert r["kind"] == kind
        assert r["sha256"] == sha
        assert r["n_bytes"] == n_bytes
        assert r["comp_len"] == comp
        assert r["entropy_proxy"] == entropy  # exact: same double both sides
        assert [float(x) for x in r["feature"]] == feat

    # aggregate twin: plain-Python grouping; avg_entropy replays the
    # portable exact-integer ppb path (r13) — half-up integer rounding of
    # comp/len to parts-per-billion, exact int sum, the identical IEEE
    # divide-then-stable-round sequence media_summary executes
    by_kind: dict[str, list] = {}
    for kind, sha, n_bytes, comp, _, _ in expected_rows.values():
        by_kind.setdefault(kind, []).append((sha, n_bytes, comp))
    summary = {r["kind"]: r for r in media_feature_summary(spark, SF).collect()}
    assert sorted(summary) == sorted(by_kind)
    for kind, rows in by_kind.items():
        r = summary[kind]
        assert r["n_items"] == len(rows)
        assert r["total_bytes"] == sum(n for _, n, _ in rows)
        assert r["n_unique"] == len({s for s, _, _ in rows})
        s = sum(
            min(10**9, (c * 10**9 + max(1, n) // 2) // max(1, n))
            for _, n, c in rows
        )
        avg = float(s) / 1e9 / len(rows)
        expect = math.floor(avg * 10000.0 + 0.5) / 10000.0
        assert r["avg_entropy"] == expect, (kind, r["avg_entropy"], avg)


def test_media_frame_pipeline_twin_exact(spark):
    """Frame-sampling and resize stage profiles recomputed item-by-item:
    AVI parse → sampled-frame byte lengths; PNG decode → independent
    nearest-neighbor resample → re-encode lengths. All-integer, exact."""
    frames_rows, resize_rows = [], []
    for it in _twin_items():
        if it["kind"] == "video":
            v = read_avi(it["content"])
            for k in range(it["duration_ms"] // 500 + 1):
                frames_rows.append(
                    (it["media_id"], len(v.frames[v.frame_at_ms(k * 500)]))
                )
        elif it["kind"] == "image":
            px = _png_decode_minimal(it["content"])
            h, w = px.shape[:2]
            # independent nearest-neighbor resample to the 32×32 default
            out = np.zeros((32, 32, px.shape[2]), dtype=np.uint8)
            for y in range(32):
                for x in range(32):
                    out[y, x] = px[min(h - 1, y * h // 32), min(w - 1, x * w // 32)]
            resize_rows.append((it["media_id"], len(png_encode_minimal(out))))

    expect = {
        "frames": (
            len({m for m, _ in frames_rows}),
            len(frames_rows),
            sum(b for _, b in frames_rows),
        ),
        "resize": (
            len({m for m, _ in resize_rows}),
            len(resize_rows),
            sum(b for _, b in resize_rows),
        ),
    }
    got = {
        r["stage"]: (r["n_items"], r["n_rows"], r["total_bytes"])
        for r in media_frame_pipeline(spark, SF).collect()
    }
    assert got == expect


def test_image_phash_neardup_twin_exact(spark):
    """Expected pair set by BRUTE-FORCE all-pairs Hamming over the decoded
    payloads — independent of the banded candidate generation — and it
    must include every planted near-dup twin (media ids 6g and 6g+3)."""
    hashes = {
        it["media_id"]: dhash64(_png_decode_minimal(it["content"]))
        for it in _twin_items()
        if it["kind"] == "image"
    }
    ids = sorted(hashes)
    expect = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if d <= PHASH_HAMMING_MAX:
                expect.append((a, b, d))
    got = [
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_phash_neardup(spark, SF).collect()
    ]
    assert got == sorted(expect)
    planted = {(6 * g, 6 * g + 3) for g in range(len(ids) // 2)}
    assert planted <= {(a, b) for a, b, _ in expect}


def test_audio_energy_segments_twin_exact(spark):
    """Replay the VAD profile with PLAIN PYTHON INTS — stdlib wave decode,
    per-sample square-sum loops, cross-multiplied strict-mean threshold,
    hand-rolled run-length scan — and require exact row equality with the
    Spark kernel's numpy math over every audio item."""
    import io
    import wave

    from amazon_climate_data_etl_spark.sources.multimodal import (
        _SEGMENT_FRAME_MS,
        audio_energy_segments,
    )

    expected = []
    for item in _twin_items():
        if item["kind"] != "audio":
            continue
        with wave.open(io.BytesIO(item["content"])) as w:
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
        pcm = [
            int.from_bytes(raw[j : j + 2], "little", signed=True)
            for j in range(0, len(raw), 2)
        ]
        flen = max(1, rate * _SEGMENT_FRAME_MS // 1000)
        nf = len(pcm) // flen
        energies = [
            sum(s * s for s in pcm[k * flen : (k + 1) * flen]) for k in range(nf)
        ]
        total = sum(energies)
        act = [e * nf > total for e in energies]
        runs, run = [], 0
        for a in act:
            if a:
                run += 1
            elif run:
                runs.append(run)
                run = 0
        if run:
            runs.append(run)
        n_active = sum(act)
        expected.append(
            (
                item["media_id"],
                nf,
                n_active,
                len(runs),
                max(runs) if runs else 0,
                n_active * _SEGMENT_FRAME_MS,
                act.index(True) if n_active else -1,
            )
        )
    got = [tuple(r) for r in audio_energy_segments(spark, SF).collect()]
    assert got == expected
    # the corpus must exercise BOTH profile shapes: constant-energy tones
    # (no strict-mean exceeders) and noise items with real segment runs
    assert any(r[3] == 0 for r in got) and any(r[3] >= 2 for r in got)


def test_video_scene_changes_twin_exact(spark):
    """Replay the shot-boundary profile with PLAIN PYTHON INTS — AVI
    container parse + per-frame PNG decode via the shared codecs, then
    pixel-by-pixel absolute-diff loops over python lists, the cross-
    multiplied strict-mean threshold, and first-cut scan — exact row
    equality with the Spark kernel's numpy math over every video item."""
    from amazon_climate_data_etl_spark.sources.multimodal import (
        video_scene_changes,
    )

    expected = []
    for item in _twin_items():
        if item["kind"] != "video":
            continue
        video = read_avi(item["content"])
        frames = [_png_decode_minimal(f).tolist() for f in video.frames]
        nf = len(frames)
        if nf < 2:
            expected.append((item["media_id"], nf, 0, -1, 0, 0))
            continue
        diffs = []
        for i in range(1, nf):
            d = 0
            for ra, rb in zip(frames[i], frames[i - 1]):
                for pa, pb in zip(ra, rb):
                    for ca, cb in zip(pa, pb):
                        d += abs(ca - cb)
            diffs.append(d)
        total = sum(diffs)
        cuts = [d * len(diffs) > total for d in diffs]
        n_cuts = sum(cuts)
        first = cuts.index(True) + 1 if n_cuts else -1
        expected.append(
            (item["media_id"], nf, n_cuts, first, max(diffs), total)
        )
    got = [tuple(r) for r in video_scene_changes(spark, SF).collect()]
    assert got == expected
    # the corpus must exercise real temporal structure: every item is
    # multi-frame (durations are >= 1 s at 2 fps) and cut boundaries occur
    # (random MPNG frames put diffs above/below the strict mean)
    assert all(r[1] >= 2 for r in got) and any(r[2] >= 1 for r in got)
    # the single-frame degenerate is pinned kernel-level instead
    from amazon_climate_data_etl_spark.sources.avi_min import write_avi
    from amazon_climate_data_etl_spark.sources.multimodal import (
        _scene_change_profile,
        png_encode_minimal,
    )

    one = write_avi(
        [png_encode_minimal(np.zeros((8, 8, 3), dtype=np.uint8))], 8, 8,
        us_per_frame=500_000,
    )
    assert _scene_change_profile(one) == (1, 0, -1, 0, 0)


def test_phash_sidecar_matches_twin():
    """The committed oracle sidecar (fixtures/media_phashes.parquet) must
    equal the independent pure-Python recomputation for every image id it
    claims — full coverage at the sf0.001 subset, a deterministic stride
    across the sf0.1 superset — and cover exactly the image ids of the
    largest SF the oracle serves (media_id % 3 == 0 below 9600)."""
    import os

    import pyarrow.parquet as pq

    from amazon_climate_data_etl_spark.sources.multimodal import (
        _synth_image_pixels,
    )

    side = pq.read_table(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fixtures",
            "media_phashes.parquet",
        )
    ).to_pydict()
    got = dict(zip(side["media_id"], side["phash"]))
    assert sorted(got) == list(range(0, 9600, 3))
    check_ids = list(range(0, 96, 3)) + list(range(96, 9600, 297))
    for i in check_ids:
        px = _synth_image_pixels(i // 3, 42)
        want = dhash64(_png_decode_minimal(png_encode_minimal(px)))
        assert got[i] == want, i


def _read_sidecar(name: str) -> dict:
    import os

    import pyarrow.parquet as pq

    return pq.read_table(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fixtures",
            name,
        )
    ).to_pydict()


def test_energy_sidecar_matches_twin():
    """The committed audio oracle sidecar (fixtures/media_energies.parquet)
    must equal the independent pure-Python twin recomputation (stdlib wave
    decode + plain-int square sums, tools/gen_media_sidecars.py) for every
    audio id it claims — full coverage at the sf0.001 subset, a
    deterministic stride across the sf0.1 superset — and cover exactly the
    audio ids of the largest SF the oracle serves (media_id % 3 == 1 below
    9600), each with its full dur//25 frame grid."""
    from tools.gen_media_sidecars import audio_frame_energies

    side = _read_sidecar("media_energies.parquet")
    per_id: dict[int, dict[int, int]] = {}
    for m, k, e in zip(side["media_id"], side["frame_idx"], side["energy"]):
        per_id.setdefault(m, {})[k] = e
    assert sorted(per_id) == list(range(1, 9600, 3))
    for i, frames in per_id.items():
        dur = 1000 + (i % 300) * 33
        assert sorted(frames) == list(range(dur // 25)), i
    check_ids = list(range(1, 96, 3)) + list(range(97, 9600, 297))
    for i in check_ids:
        item = synthesize_media_item(i)
        want = audio_frame_energies(item["content"])
        assert [per_id[i][k] for k in range(len(want))] == want, i


def test_framediff_sidecar_matches_twin():
    """The committed video oracle sidecar (fixtures/media_framediffs.parquet)
    must equal the independent pure-Python twin recomputation (avi_min +
    PNG decode + plain-int pixel loops, tools/gen_media_sidecars.py) for
    every video id it claims — full coverage at the sf0.001 subset, a
    deterministic stride across the sf0.1 superset — and cover exactly the
    video ids below 9600, each with diff_idx 1..n_frames-1 and a constant
    per-item n_frames equal to duration//500."""
    from tools.gen_media_sidecars import video_frame_diffs

    side = _read_sidecar("media_framediffs.parquet")
    per_id: dict[int, dict[int, int]] = {}
    nf_of: dict[int, set] = {}
    for m, nf, k, d in zip(
        side["media_id"], side["n_frames"], side["diff_idx"], side["diff"]
    ):
        per_id.setdefault(m, {})[k] = d
        nf_of.setdefault(m, set()).add(nf)
    assert sorted(per_id) == list(range(2, 9600, 3))
    for i, diffs in per_id.items():
        dur = 1000 + (i % 300) * 33
        (nf,) = nf_of[i]
        assert nf == max(1, dur // 500), i
        assert sorted(diffs) == list(range(1, nf)), i
    check_ids = list(range(2, 96, 3)) + list(range(98, 9600, 297))
    for i in check_ids:
        item = synthesize_media_item(i)
        nf, want = video_frame_diffs(item["content"])
        assert (nf_of[i], [per_id[i][k] for k in range(1, nf)]) == ({nf}, want), i


def test_pipeline_sidecar_matches_twin():
    """The committed pipeline oracle sidecar (fixtures/media_pipeline.parquet,
    the r13 graduation of media_pipeline_profile) must equal the independent
    pure-Python twin recomputation (tools/gen_media_sidecars.pipeline_rows)
    for every id it claims — full coverage at the sf0.001 subset, a
    deterministic stride across the sf0.1 superset — and carry exactly one
    'features' row per id below 9600, one 'frames' row per 500 ms grid
    point per video id, and one 'resize' row per image id."""
    from tools.gen_media_sidecars import pipeline_rows

    side = _read_sidecar("media_pipeline.parquet")
    rows = list(
        zip(
            side["stage"], side["media_id"], side["kind"], side["row_idx"],
            side["n_bytes"], side["sha256"], side["comp_len"],
        )
    )
    by_stage_id: dict[tuple, list] = {}
    for r in rows:
        by_stage_id.setdefault((r[0], r[1]), []).append(r)

    feat_ids = sorted(i for s, i in by_stage_id if s == "features")
    assert feat_ids == list(range(9600))
    assert sorted(i for s, i in by_stage_id if s == "frames") == list(
        range(2, 9600, 3)
    )
    assert sorted(i for s, i in by_stage_id if s == "resize") == list(
        range(0, 9600, 3)
    )
    for i in range(2, 9600, 3):  # full frame grid per video id
        dur = 1000 + (i % 300) * 33
        grid = sorted(r[3] for r in by_stage_id[("frames", i)])
        assert grid == list(range(dur // 500 + 1)), i

    check_ids = list(range(96)) + list(range(96, 9600, 97))
    for i in check_ids:
        want = sorted(pipeline_rows(i, synthesize_media_item(i)))
        got = sorted(
            r for (s, m), rs in by_stage_id.items() if m == i for r in rs
        )
        assert got == want, i
