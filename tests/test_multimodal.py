"""Multimodal binary-column plumbing (schema, Arrow batching, UDTF-shaped
frame explode). The codec itself is a documented stub."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from concordium_transaction_logger_spark.operators import multimodal


@pytest.fixture()
def media(spark):
    rows = [
        Row(
            media_id=1,
            kind="image",
            payload=b"\x01\x02\x03\x04" * 8,
            meta=Row(width=2, height=2, sample_rate=None, n_frames=None),
        ),
        Row(
            media_id=2,
            kind="audio",
            payload=b"\xff" * 40,
            meta=Row(width=None, height=None, sample_rate=16000, n_frames=None),
        ),
        Row(
            media_id=3,
            kind="video",
            payload=bytes(range(64)),
            meta=Row(width=4, height=4, sample_rate=None, n_frames=8),
        ),
        Row(media_id=4, kind="image", payload=None, meta=None),
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_extract_features_stub(media):
    feats = multimodal.extract_features(media).collect()
    by_id = {r.media_id: r for r in feats}
    assert len(feats) == 4
    assert by_id[1].payload_bytes == 32
    assert len(by_id[1].feature) == multimodal.FEATURE_DIM
    # deterministic: same payload -> same feature
    assert by_id[1].feature == multimodal.extract_features(media).collect()[0].feature
    assert by_id[4].payload_bytes == 0


def test_real_decode_is_stubbed(media):
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        multimodal.extract_features(media, real_decode=True).collect()


def test_sample_frames(media):
    frames = multimodal.sample_frames(media, every_n=2, frame_bytes=8).collect()
    # 64-byte video -> 8 chunks -> every 2nd -> 4 frames
    assert [r.frame_index for r in frames] == [0, 2, 4, 6]
    assert all(len(r.frame) == 8 for r in frames)
    assert bytes(frames[1].frame) == bytes(range(16, 24))


def test_validate_media(media):
    flags = {r.media_id: r.is_invalid for r in multimodal.validate_media(media).collect()}
    assert flags == {1: False, 2: False, 3: False, 4: True}


def test_resize_nearest_neighbor_kernel(spark, sf_dir):
    """4x4 thumbnail of the (w x h) payload grid: spot-check one row
    against a hand-computed nearest-neighbor index map."""
    from concordium_transaction_logger_spark.operators import multimodal as mm

    media = mm.media_from_documents(spark, sf_dir)
    out = {r.media_id: r for r in mm.resize_images(media).collect()}
    src = {
        r.media_id: r
        for r in media.filter("kind = 'image' AND payload IS NOT NULL").collect()
    }
    assert out.keys() == src.keys() and out
    for mid, r in list(out.items())[:5]:
        w, h = src[mid].meta.width, src[mid].meta.height
        pay = bytes(src[mid].payload)
        want = bytes(
            pay[((i * h) // 4) * w + (j * w) // 4] for i in range(4) for j in range(4)
        )
        assert bytes(r.pixels) == want, mid
