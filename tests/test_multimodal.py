"""Multimodal plumbing: batch shapes, deterministic stub decode,
resize metadata rewrite, frame sampling."""

from __future__ import annotations

import pytest

from pennsieve_streaming_spark.llm.multimodal import (
    FEATURE_DIM,
    extract_features,
    media_from_documents,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return media_from_documents(docs)


def test_media_schema(media):
    assert set(media.columns) == {"media_id", "kind", "payload", "meta"}
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_feature_extraction_deterministic(media):
    a = extract_features(media).orderBy("media_id").limit(5).collect()
    b = extract_features(media).orderBy("media_id").limit(5).collect()
    for ra, rb in zip(a, b):
        assert ra["digest"] == rb["digest"]
        assert ra["feature"] == rb["feature"]
        assert len(ra["feature"]) == FEATURE_DIM
        assert ra["n_bytes"] > 0


def test_feature_extraction_unstubbed_raises(media):
    with pytest.raises(Exception) as exc:
        extract_features(media, decode_stub=False).limit(1).collect()
    assert "NotImplementedError" in str(exc.value) or "codecs" in str(exc.value)


def test_resize_metadata(media):
    out = resize_images(media, 224, 224)
    rows = out.limit(5).collect()
    for r in rows:
        assert r["meta"]["width"] == 224 and r["meta"]["height"] == 224
        assert r["scale_x"] > 0 and r["scale_y"] > 0
    assert out.count() == media.filter("kind = 'image'").count()


def test_frame_sampling_bounds(media):
    frames = sample_frames(media, every_nth=5).collect()
    n_frames = {
        r["media_id"]: r["meta"]["n_frames"]
        for r in media.filter("kind = 'video'").collect()
    }
    for r in frames:
        assert r["frame_idx"] <= max(n_frames[r["media_id"]] - 1, 0)
        assert r["frame_idx"] % 5 == 0
