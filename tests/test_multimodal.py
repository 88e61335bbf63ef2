"""Multimodal binary-column plumbing: schema, Arrow batch shape,
deterministic stub decode, 1→many frame sampling, strict mode."""

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_reconciliate_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _FAKE_SAMPLE_RATE,
    extract_audio_features,
    extract_image_features,
    resize_images,
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
    assert r1["md5"] == hashlib.md5(b"fake-jpeg-bytes-aaaa").hexdigest()
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


def test_resize_images(spark, media):
    out = resize_images(media, max_dim=64).orderBy("media_id").collect()
    assert [r["media_id"] for r in out] == [1, 2, 3]
    for r in out[:2]:
        assert max(r["width"], r["height"]) <= 64
        assert r["content"] is not None and len(r["content"]) <= 20
    assert out[2]["content"] is None  # null in → null out
    # a no-op resize keeps dims and payload byte-identical
    big = resize_images(media, max_dim=4096).orderBy("media_id").collect()
    feats = extract_image_features(media).orderBy("media_id").collect()
    assert (big[0]["width"], big[0]["height"]) == (
        feats[0]["width"], feats[0]["height"],
    )
    assert bytes(big[0]["content"]) == b"fake-jpeg-bytes-aaaa"


def test_audio_features(spark, media):
    import numpy as np

    out = extract_audio_features(media).collect()
    assert [r["media_id"] for r in out] == [5]  # only audio
    r = out[0]
    buf = b"riff-wav-stub"
    wave = np.frombuffer(buf, dtype=np.int8).astype(np.float64) / 128.0
    assert r["n_samples"] == len(buf)
    assert abs(r["duration_s"] - len(buf) / _FAKE_SAMPLE_RATE) < 1e-12
    assert abs(r["rms"] - float(np.sqrt(np.mean(wave * wave)))) < 1e-12
    assert abs(r["peak"] - float(np.max(np.abs(wave)))) < 1e-12
    assert r["md5"] == hashlib.md5(buf).hexdigest()


def test_strict_mode_raises_without_codec(spark, media):
    from etl_reconciliate_spark.operators import multimodal

    if multimodal._HAS_PIL:
        pytest.skip("PIL present; strict mode would decode for real")
    with pytest.raises(Exception, match="NotImplementedError|PIL"):
        extract_image_features(media, strict=True).collect()


def test_strict_resize_always_raises(spark, media):
    """resize strict=True raises even when PIL is importable: no real
    resample path exists, so strict must never silently fall through to
    the stub downsample (ADVICE r2)."""
    with pytest.raises(Exception, match="NotImplementedError|not implemented"):
        resize_images(media, max_dim=64, strict=True).collect()
    with pytest.raises(Exception, match="NotImplementedError|torchaudio"):
        extract_audio_features(media, strict=True).collect()
