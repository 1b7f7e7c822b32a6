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


def test_real_decode_ppm_and_wav(spark):
    """real_decode=True actually decodes the codec-free formats: a P6 PPM
    image yields per-channel means/dims matching a numpy reference, and a
    PCM16 WAV yields duration/RMS matching the synthesized sine; an
    undecodable payload still raises (the honest codec boundary)."""
    import io
    import math
    import struct
    import wave

    import numpy as np
    import pytest
    from pyspark.sql import Row

    from concordium_transaction_logger_spark.operators.multimodal import (
        extract_features,
    )

    # 4x2 PPM: left half red, right half blue
    w, h = 4, 2
    pixels = bytearray()
    for _ in range(h):
        for x in range(w):
            pixels += bytes([255, 0, 0] if x < w // 2 else [0, 0, 255])
    ppm = b"P6\n# comment\n4 2\n255\n" + bytes(pixels)

    # 1 second 440 Hz PCM16 WAV at 8 kHz
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        samples = [
            int(16384 * math.sin(2 * math.pi * 440 * t / 8000)) for t in range(8000)
        ]
        f.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    wav = buf.getvalue()

    media = spark.createDataFrame(
        [
            Row(media_id=1, kind="image", payload=bytes(ppm)),
            Row(media_id=2, kind="audio", payload=bytes(wav)),
        ]
    )
    out = {r["media_id"]: r for r in extract_features(media, real_decode=True).collect()}

    img_feat = out[1]["feature"]
    assert abs(img_feat[0] - 0.5) < 1e-6  # mean R: half the pixels are 255
    assert img_feat[1] == 0.0
    assert abs(img_feat[2] - 0.5) < 1e-6
    assert (img_feat[4], img_feat[5]) == (4.0, 2.0)

    aud_feat = out[2]["feature"]
    assert abs(aud_feat[0] - 1.0) < 1e-6  # 1 second
    # RMS of a 16384-amplitude sine = 16384/sqrt(2); normalized by 32768
    assert abs(aud_feat[1] - (16384 / math.sqrt(2)) / 32768) < 0.01
    assert 0.05 < aud_feat[2] < 0.25  # 440 Hz at 8 kHz -> ~0.11 ZCR

    junk = spark.createDataFrame([Row(media_id=3, kind="image", payload=b"\x89PNG then junk")])
    with pytest.raises(Exception, match="codec"):
        extract_features(junk, real_decode=True).collect()
