"""Multimodal plumbing: binary columns through Arrow-batched mapInPandas."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from amazon_climate_data_etl_spark.sources.multimodal import (
    FEATURE_DIM,
    extract_features,
    media_summary,
    synthetic_media,
)


def test_feature_extraction_shapes(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media, fake=True)
    pdf = feats.toPandas()
    assert len(pdf) == 30
    assert all(len(f) == FEATURE_DIM for f in pdf["feature"])
    assert ((pdf["entropy_proxy"] >= 0) & (pdf["entropy_proxy"] <= 1.0)).all()


def test_feature_extraction_deterministic_and_content_addressed(spark):
    media = synthetic_media(spark, n=12)
    a = extract_features(media, fake=True).orderBy("media_id").toPandas()
    b = extract_features(media, fake=True).orderBy("media_id").toPandas()
    assert (a["sha256"] == b["sha256"]).all()
    assert all(list(x) == list(y) for x, y in zip(a["feature"], b["feature"]))
    # sha256 matches a local recomputation of the same payload
    payload = media.filter(F.col("media_id") == 0).collect()[0]["content"]
    assert a["sha256"][0] == hashlib.sha256(bytes(payload)).hexdigest()


def test_media_summary(spark):
    media = synthetic_media(spark, n=30)
    s = media_summary(extract_features(media, fake=True)).toPandas()
    assert set(s["kind"]) == {"image", "audio", "video"}
    assert s["n_items"].sum() == 30
    # compressible half should drag avg entropy visibly below 1
    assert (s["avg_entropy"] < 0.95).all()


def test_dedup_on_sha256(spark):
    media = synthetic_media(spark, n=12)
    doubled = media.unionByName(media)
    feats = extract_features(doubled, fake=True)
    uniq = feats.dropDuplicates(["sha256"])
    assert uniq.count() == 12


def test_resize_images_only_and_payload_shape(spark):
    from amazon_climate_data_etl_spark.sources.multimodal import resize_images

    media = synthetic_media(spark, n=30)
    out = resize_images(media, out_w=16, out_h=8).toPandas()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    assert (out["out_w"] == 16).all() and (out["out_h"] == 8).all()
    assert all(len(b) == 16 * 8 for b in out["resized"])
    # metadata carried through from the image rows
    assert out["width"].notna().all()


def test_sample_frames_cardinality_law(spark):
    from amazon_climate_data_etl_spark.sources.multimodal import sample_frames

    media = synthetic_media(spark, n=30)
    step = 500
    frames = sample_frames(media, every_ms=step)
    per_media = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    vids = media.filter(F.col("kind") == "video").select("media_id", "duration_ms")
    for r in vids.collect():
        assert per_media[r["media_id"]] == r["duration_ms"] // step + 1
    # frame bytes are content-addressed: deterministic under repartitioning
    a = sorted(map(tuple, sample_frames(media, every_ms=step).collect()))
    b = sorted(map(tuple, sample_frames(media.repartition(7), every_ms=step).collect()))
    assert a == b


def test_frame_timestamps_and_determinism(spark):
    from amazon_climate_data_etl_spark.sources.multimodal import sample_frames

    media = synthetic_media(spark, n=12)
    rows = sample_frames(media, every_ms=250).orderBy("media_id", "frame_idx").collect()
    for r in rows:
        assert r["ts_ms"] == r["frame_idx"] * 250
        assert len(r["frame"]) == 32  # sha256 digest per sampled frame
