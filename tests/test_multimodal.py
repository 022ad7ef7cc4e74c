"""Multimodal plumbing tests: binary columns + mapInPandas stages with
the stubbed decoders (real codecs not in this container)."""

from __future__ import annotations

import pytest

from automotive_translation_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    resize_images,
    synth_media,
)


def test_extract_features_shapes(spark):
    media = synth_media(spark, 30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert abs(sum(r["feature"]) - 1.0) < 1e-3  # normalized histogram
        assert r["n_bytes"] > 0


def test_extract_features_deterministic(spark):
    media = synth_media(spark, 10)
    a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert a == b


def test_frame_sampling_counts(spark):
    media = synth_media(spark, 30)
    frames = frame_sample_plan(media, every_ms=10_000).collect()
    vids = {r["media_id"] for r in frames}
    assert vids  # every third synth row is a video
    # Each video yields ceil(duration/10s) frames, all fingerprinted.
    assert all(len(r["frame_sha"]) == 16 for r in frames)


def test_resize_binary_roundtrip(spark):
    media = synth_media(spark, 12)
    out = resize_images(media, 224, 224).collect()
    assert all(r["width"] == 224 and r["height"] == 224 for r in out)
    orig = {
        r["media_id"]: bytes(r["content"])
        for r in media.filter("media_type = 'image'").collect()
    }
    for r in out:
        assert bytes(r["content"]) == orig[r["media_id"]]


def test_real_decode_path_raises(spark):
    media = synth_media(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        extract_features(media, decode_stub=False).collect()
