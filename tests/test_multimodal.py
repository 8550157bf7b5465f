from __future__ import annotations

import hashlib

import pytest

from sparksimjoin.multimodal import MEDIA_SCHEMA, decode_features, sample_frames


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, 100, "image", "image/png", b"\x89PNG-fake-bytes-0", (64, 48, None)),
        (1, 100, "image", "image/png", b"\x89PNG-fake-bytes-1", (64, 48, None)),
        (2, 101, "audio", "audio/wav", b"RIFF-fake", (None, None, 2500)),
        (3, 102, "video", "video/mp4", b"mp4-fake", (320, 240, 3500)),
        (4, 103, "image", "image/png", None, (None, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).cache()
    df.count()
    return df


def test_decode_features_plumbing(spark, media):
    out = {r["media_id"]: r.asDict() for r in decode_features(media).collect()}
    assert len(out) == 5
    assert out[0]["n_bytes"] == len(b"\x89PNG-fake-bytes-0")
    assert out[0]["sha256"] == hashlib.sha256(b"\x89PNG-fake-bytes-0").hexdigest()
    assert len(out[0]["features"]) == 8
    assert out[0]["features"] != out[1]["features"]
    assert out[4]["decode_status"] == "null" and out[4]["features"] is None


def test_stub_features_are_marked(spark, media):
    """strict=False output must be self-identifying: every decoded row
    carries decode_status='stub_sha256' (NOT 'ok'), so stand-in
    features can never be silently consumed as real media features."""
    statuses = {
        r["decode_status"] for r in decode_features(media).collect() if r["sha256"]
    }
    assert statuses == {"stub_sha256"}


def test_decode_strict_raises(spark, media):
    import py4j

    with pytest.raises(Exception) as exc:
        decode_features(media, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or "codecs unavailable" in str(exc.value)


def test_sample_frames(spark, media):
    frames = sample_frames(media, every_ms=1000).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert sorted(by_media[3]) == [0, 1000, 2000, 3000]
    assert set(by_media) == {3}
