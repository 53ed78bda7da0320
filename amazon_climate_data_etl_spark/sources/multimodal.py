"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The 100 TB-training-pipeline pattern: media lives in parquet as
``binary`` payloads beside typed metadata; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages so the
Python cost is amortized per batch and the operator chain stays a single
map (no shuffle). Real decoders (PIL/ffmpeg/torchaudio) are not in this
container, so the decode kernel is import-gated with a deterministic fake
behind the same signature — the Spark-side plumbing (schemas, batch shapes,
partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
import math
import os
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from amazon_climate_data_etl_spark.session import ship_package_to_workers

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("entropy_proxy", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def _decode_real(content: bytes, kind: str) -> np.ndarray:  # pragma: no cover
    """Real decoder slot — PIL/ffmpeg would go here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "media decode requires imaging/audio libs not present in this "
            "container; use fake=True (deterministic featureizer) or run in "
            "an environment with decoders installed"
        ) from exc
    raise NotImplementedError("real decode path not implemented in this env")


def _decode_fake(content: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in 'decode + feature-extract': FEATURE_DIM floats
    derived from the sha256 of the payload. Same signature/batch shape as a
    real embedding model."""
    h = hashlib.sha256(content).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32.newbyteorder("<") if False else "<u4")
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(
    media: DataFrame, fake: bool = True, batch_hint: int = 64
) -> DataFrame:
    """media(binary) → per-item content features via Arrow-batched
    mapInPandas. One Python roundtrip per Arrow batch; no shuffle."""
    spark = media.sparkSession
    ship_package_to_workers(spark)
    decode = _decode_fake if fake else _decode_real

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(bytes(c), k) for c, k in zip(pdf["content"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "sha256": [hashlib.sha256(bytes(c)).hexdigest() for c in pdf["content"]],
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                    "entropy_proxy": [
                        min(1.0, len(zlib.compress(bytes(c))) / max(1, len(bytes(c))))
                        for c in pdf["content"]
                    ],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(worker, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(
    media: DataFrame, out_w: int = 32, out_h: int = 32, fake: bool = True
) -> DataFrame:
    """Image resize stage: images only, aspect metadata carried through,
    payload replaced by the resized encoding. Same plumbing rules as
    extract_features — Arrow-batched mapInPandas, map-only (the
    kind-filter prunes non-images BEFORE Python so audio/video bytes never
    cross the Arrow boundary). The fake kernel emits a deterministic
    out_w*out_h-byte payload derived from the content hash; a real kernel
    (PIL thumbnail→encode) drops into the same signature."""
    spark = media.sparkSession
    ship_package_to_workers(spark)
    if not fake:
        _decode_real(b"", "image")  # raises NotImplementedError with context

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for c in pdf["content"]:
                h = hashlib.sha256(bytes(c)).digest()
                out.append(bytes((h * ((out_w * out_h) // len(h) + 1))[: out_w * out_h]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "resized": out,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        worker, schema=RESIZED_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 500, fake: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp — the
    flatMap-shaped member of the multimodal family (output cardinality
    sum(duration_ms // every_ms + 1) > input). mapInPandas is the right
    surface exactly because the 1→N fan-out stays inside the Arrow batch:
    no explode of pre-materialized arrays, no shuffle; downstream stages
    see ordinary rows. The fake kernel derives each frame's bytes from
    sha256(content || frame_idx); a real kernel (ffmpeg seek+decode) has
    the same signature and schema."""
    spark = media.sparkSession
    ship_package_to_workers(spark)
    if not fake:
        _decode_real(b"", "video")

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, dur, c in zip(pdf["media_id"], pdf["duration_ms"], pdf["content"]):
                content = bytes(c)
                for i in range(int(dur) // every_ms + 1):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(
                        hashlib.sha256(content + i.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        worker, schema=FRAMES_SCHEMA
    )


def media_summary(features: DataFrame) -> DataFrame:
    """Typed-metadata aggregation over extracted features (pure JVM)."""
    return (
        features.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("entropy_proxy"), 4).alias("avg_entropy"),
            F.countDistinct("sha256").alias("n_unique"),
        )
        .orderBy("kind")
    )


def media_count_for(sf_dir: str) -> int:
    """Media-table size for a test-data dir: 96 items at sf0.001, scaling
    linearly with the scale factor (so bench timings mean something —
    a fixed count would measure constant work at every sf)."""
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        return 96
    return max(96, int(round(96 * sf / 0.001)))


def media_feature_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: full multimodal chain — synthesize binary
    media, Arrow-batched decode/feature-extract (mapInPandas), typed
    metadata aggregation. Deterministic output; registered WITHOUT a SQL
    oracle (the decode kernel is not SQL-expressible) so the driver records
    the rows-only check. Media is synthesized executor-side, with the item
    count scaled to ``sf_dir``'s scale factor (96 at sf0.001)."""
    media = synthetic_media(spark, n=media_count_for(sf_dir))
    return media_summary(extract_features(media))


def media_frame_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry for the resize + frame-sample stages: per-stage
    row/byte profile over the synthesized media table. Rows-only check (the
    kernels are not SQL-expressible); determinism and cardinality law
    (frames = duration//step + 1) are pinned in tests. Item count scales
    with ``sf_dir``'s scale factor.

    The media frame feeds TWO downstream branches (frames + resize). An
    unpersisted branch point re-runs the upstream mapInPandas per branch,
    and every extra Python eval in the chain costs a runner round-trip per
    task — so the branch point is persisted, the same DAG-branch
    materialization you'd do before fanning a decoded media scan out to
    multiple extractors on a cluster."""
    media = synthetic_media(spark, n=media_count_for(sf_dir)).persist()
    frames = sample_frames(media).select(
        F.lit("frames").alias("stage"),
        F.col("media_id"),
        F.length("frame").alias("n_bytes"),
    )
    resized = resize_images(media).select(
        F.lit("resize").alias("stage"),
        F.col("media_id"),
        F.length("resized").alias("n_bytes"),
    )
    return (
        frames.unionByName(resized)
        .groupBy("stage")
        .agg(
            F.countDistinct("media_id").alias("n_items"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_bytes").alias("total_bytes"),
        )
        .orderBy("stage")
    )


QUERIES = {
    "media_feature_summary": media_feature_summary,
    "media_frame_pipeline": media_frame_pipeline,
}
ORACLE: dict[str, str] = {}  # not SQL-expressible: rows-only driver check


_MEDIA_KINDS = ("image", "audio", "video")
_MEDIA_MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def synthetic_media(
    spark: SparkSession, n: int = 64, seed: int = 42, rows_per_partition: int = 4096
) -> DataFrame:
    """Deterministic fake media table for tests/bench (binary payloads of
    varying size and compressibility).

    Generated EXECUTOR-side: the driver ships only (n, seed) and each
    payload derives from ``default_rng([seed, media_id])``, so the table is
    identical under any partitioning and never materializes on the driver —
    the shape a real 100 TB media table has (parquet on executors), unlike
    a driver-built createDataFrame list."""
    from amazon_climate_data_etl_spark.session import ship_package_to_workers

    ship_package_to_workers(spark)

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, mimes, widths, heights, durs, payloads = (
                [], [], [], [], [], [], []
            )
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng([seed, i])
                kind = _MEDIA_KINDS[i % 3]
                size = 256 + int(rng.integers(0, 1024))
                payload = (
                    rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
                    if i % 2
                    else bytes([i % 256]) * size  # highly compressible half
                )
                ids.append(i)
                kinds.append(kind)
                mimes.append(_MEDIA_MIMES[kind])
                widths.append(64 + i % 512 if kind == "image" else None)
                heights.append(64 + (i * 7) % 512 if kind == "image" else None)
                # bounded duration (1-11 s): total frame fan-out stays LINEAR
                # in the table size (an unbounded i*33 made it quadratic);
                # i % 300 == i below 300, so small-sf fixtures are unchanged
                durs.append(1000 + (i % 300) * 33 if kind != "image" else None)
                payloads.append(payload)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kinds,
                    "mime": mimes,
                    "width": widths,
                    "height": heights,
                    "duration_ms": durs,
                    "content": payloads,
                }
            )

    # at least one split per core (the downstream decode/frame stages are
    # compute-bound Python; 3 fat partitions would idle 29 of 32 cores), at
    # most one row per partition
    num_parts = max(
        1,
        min(n, max(math.ceil(n / rows_per_partition),
                   spark.sparkContext.defaultParallelism)),
    )
    return spark.range(0, n, 1, num_parts).mapInPandas(worker, schema=MEDIA_SCHEMA)
