"""Multimodal binary-column plumbing: schema, Arrow batch shape,
deterministic stub decode, 1→many frame sampling, strict mode."""

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_reconciliate_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_image_features,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"fake-jpeg-bytes-aaaa", {"src": "cam1"}),
        (2, "image", b"fake-jpeg-bytes-bbbb", None),
        (3, "image", None, None),
        (4, "video", b"v" * 640, {"fps": "30"}),
        (5, "audio", b"riff-wav-stub", None),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_image_features(spark, media):
    out = extract_image_features(media).orderBy("media_id").collect()
    assert [r["media_id"] for r in out] == [1, 2, 3]  # only images
    r1 = out[0]
    assert r1["sha1"] == hashlib.sha1(b"fake-jpeg-bytes-aaaa").hexdigest()
    assert r1["width"] >= 64 and r1["height"] >= 64
    assert out[2]["width"] is None  # null content → null features
    # determinism across runs
    again = extract_image_features(media).orderBy("media_id").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_video_frame_sampling(spark, media):
    frames = sample_video_frames(media, every_n=3).collect()
    assert {r["media_id"] for r in frames} == {4}
    idxs = sorted(r["frame_idx"] for r in frames)
    assert idxs == list(range(0, 10, 3))  # 640 bytes → 10 frames, every 3rd


def test_strict_mode_raises_without_codec(spark, media):
    from etl_reconciliate_spark.operators import multimodal

    if multimodal._HAS_PIL:
        pytest.skip("PIL present; strict mode would decode for real")
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        extract_image_features(media, strict=True).collect()
