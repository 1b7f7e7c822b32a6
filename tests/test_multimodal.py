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


# --- minimal baseline JPEG ENCODER (test-side ground truth) ---------------
# Forward-DCT path written independently of the decoder's inverse path, so
# the round-trip is a genuine two-sided check, not a mirror of one
# implementation. Grayscale, quality tables of all ones (quantization is
# then near-lossless), standard-ish Huffman built from the symbols used.


def _fdct(block):
    import numpy as np

    from concordium_transaction_logger_spark.operators.multimodal import _idct_basis

    m = _idct_basis()
    return m @ (block - 128.0) @ m.T


def _huff_spec(symbols):
    """Build a canonical Huffman spec (counts, symbols) assigning every
    symbol an 8-bit code (fine for tiny test images)."""
    syms = sorted(set(symbols))
    assert len(syms) <= 200
    counts = [0] * 16
    counts[7] = len(syms)  # all codes 8 bits long
    return counts, syms


def _encode_jpeg_gray(img):
    """img: (h, w) uint8, h and w multiples of 8."""
    import numpy as np

    from concordium_transaction_logger_spark.operators.multimodal import _ZIGZAG

    h, w = img.shape
    blocks = []
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            coef = np.rint(_fdct(img[by : by + 8, bx : bx + 8].astype(np.float64)))
            blocks.append(coef.reshape(64)[_ZIGZAG].astype(int))

    def size_of(v):
        s = 0
        v = abs(v)
        while v:
            s += 1
            v >>= 1
        return s

    # gather symbols actually used
    dc_syms, ac_syms = [], []
    pred = 0
    for blk in blocks:
        diff = blk[0] - pred
        pred = blk[0]
        dc_syms.append(size_of(diff))
        k = 1
        while k < 64:
            r = 0
            while k < 64 and blk[k] == 0:
                r += 1
                k += 1
            if k == 64:
                ac_syms.append(0x00)
                break
            while r > 15:
                ac_syms.append(0xF0)
                r -= 16
            ac_syms.append((r << 4) | size_of(blk[k]))
            k += 1
    dc_counts, dc_sorted = _huff_spec(dc_syms)
    ac_counts, ac_sorted = _huff_spec(ac_syms)

    def codebook(counts, syms):
        book, code, k = {}, 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                book[syms[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        return book

    dc_book, ac_book = codebook(dc_counts, dc_sorted), codebook(ac_counts, ac_sorted)

    bits = []

    def put(length, value):
        for i in range(length - 1, -1, -1):
            bits.append((value >> i) & 1)

    pred = 0
    for blk in blocks:
        diff = blk[0] - pred
        pred = blk[0]
        s = size_of(diff)
        put(*dc_book[s])
        if s:
            put(s, diff if diff >= 0 else diff + (1 << s) - 1)
        k = 1
        while k < 64:
            r = 0
            while k < 64 and blk[k] == 0:
                r += 1
                k += 1
            if k == 64:
                put(*ac_book[0x00])
                break
            while r > 15:
                put(*ac_book[0xF0])
                r -= 16
            v = blk[k]
            s = size_of(v)
            put(*ac_book[(r << 4) | s])
            put(s, v if v >= 0 else v + (1 << s) - 1)
            k += 1
    while len(bits) % 8:
        bits.append(1)  # pad with 1s per spec
    entropy = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for b in bits[i : i + 8]:
            byte = (byte << 1) | b
        entropy.append(byte)
        if byte == 0xFF:
            entropy.append(0x00)  # byte stuffing

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT: all-ones table 0
    out += seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_sorted))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_sorted))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes(entropy) + b"\xff\xd9"
    return out


def test_real_decode_baseline_jpeg(spark):
    """Round-trip through an independently-written encoder: a gradient
    grayscale image encoded with unit quantization must decode to within
    rounding of the original pixels, and the feature row must carry the
    true dimensions and means."""
    import numpy as np
    from pyspark.sql import Row

    from concordium_transaction_logger_spark.operators.multimodal import (
        _decode_jpeg,
        extract_features,
    )

    h, w = 16, 24
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((yy * 7 + xx * 5) % 251).astype(np.uint8)  # aperiodic gradient
    payload = _encode_jpeg_gray(img)

    decoded = _decode_jpeg(payload)
    assert decoded is not None and decoded.shape == (h, w, 3)
    # unit quantization: DCT round-trip error is pure rounding (<=2 levels)
    assert np.abs(decoded[:, :, 0].astype(int) - img.astype(int)).max() <= 2
    assert (decoded[:, :, 0] == decoded[:, :, 1]).all()  # grayscale replicated

    media = spark.createDataFrame([Row(media_id=1, kind="image", payload=bytes(payload))])
    feat = extract_features(media, real_decode=True).collect()[0]["feature"]
    assert (feat[4], feat[5]) == (float(w), float(h))
    assert abs(feat[0] - img.mean() / 255.0) < 0.01

    # progressive/garbage JPEGs are refused, not silently wrong
    assert _decode_jpeg(b"\xff\xd8\xff\xc2" + payload[4:]) is None


def _encode_png(img, color_type, filters):
    """Independent PNG encoder for the round-trip test: chunk writer +
    per-scanline FORWARD filtering (the decoder must invert every type).
    ``img`` is (h, w, channels) uint8; ``filters[y]`` picks the filter for
    scanline y."""
    import struct
    import zlib

    import numpy as np

    h, w, ch = img.shape
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        out = np.zeros_like(line)
        for x in range(len(line)):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (line[x] - pred) & 0xFF
        raw.extend(out.astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_real_decode_png_all_filters_and_color_types(spark):
    """Exact round-trip (PNG is lossless) through an independent encoder,
    cycling every scanline filter (None/Sub/Up/Average/Paeth) and each
    supported color type; unsupported profiles are refused, not wrong."""
    import numpy as np
    from pyspark.sql import Row

    from concordium_transaction_logger_spark.operators.multimodal import (
        _decode_png,
        extract_features,
    )

    rng = np.random.default_rng(7)
    h, w = 11, 13
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        decoded = _decode_png(_encode_png(rgb, 2, filters))
        assert decoded is not None and (decoded == rgb).all(), f"filters {filters}"

    gray = rng.integers(0, 256, (h, w, 1), dtype=np.uint8)
    d = _decode_png(_encode_png(gray, 0, [0, 1, 2, 3, 4]))
    assert (d == np.repeat(gray, 3, axis=2)).all()

    rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    d = _decode_png(_encode_png(rgba, 6, [4, 3, 2, 1, 0]))
    assert (d == rgba[:, :, :3]).all()

    ga = rng.integers(0, 256, (h, w, 2), dtype=np.uint8)
    d = _decode_png(_encode_png(ga, 4, [1, 4]))
    assert (d == np.repeat(ga[:, :, :1], 3, axis=2)).all()

    # the feature kernel sees true dims/means through the PNG path
    payload = _encode_png(rgb, 2, [0, 1, 2, 3, 4])
    media = spark.createDataFrame(
        [Row(media_id=1, kind="image", payload=bytes(payload))]
    )
    feat = extract_features(media, real_decode=True).collect()[0]["feature"]
    assert (feat[4], feat[5]) == (float(w), float(h))
    assert abs(feat[0] - rgb[:, :, 0].mean() / 255.0) < 1e-6

    # interlaced / 16-bit profiles are refused, not silently wrong
    import struct as _s
    bad = bytearray(_encode_png(rgb, 2, [0]))
    bad[8 + 8 + 12] = 1  # interlace flag inside IHDR
    assert _decode_png(bytes(bad)) is None


def test_malformed_payloads_decode_to_none_not_crash():
    """Corrupt payloads carrying the right magic bytes must decode to
    None (the documented contract), not abort the Arrow batch with
    struct.error/IndexError: a truncated IHDR, a palette index past the
    PLTE table, truncated JPEG marker segments, a truncated WAV header."""
    import struct

    from concordium_transaction_logger_spark.operators.multimodal import (
        _decode_jpeg,
        _decode_png,
        _decode_ppm,
        _decode_wav,
    )

    sig = b"\x89PNG\r\n\x1a\n"
    truncated_ihdr = sig + struct.pack(">I", 13) + b"IHDR" + b"\x00" * 5
    assert _decode_png(truncated_ihdr) is None
    # palette image whose pixel index (7) exceeds the 1-entry PLTE
    import zlib as _z

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    plte = b"\x10\x20\x30"
    idat = _z.compress(b"\x00\x07")
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + b"\x00\x00\x00\x00"
    bad_palette = sig + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    assert _decode_png(bad_palette) is None
    assert _decode_jpeg(b"\xff\xd8\xff\xdb\x00\x43\x00") is None  # truncated DQT
    assert _decode_jpeg(b"\xff\xd8\xff\xc0\x00\x05\x08\x00") is None  # truncated SOF
    assert _decode_ppm(b"P6 4 4") is None
    assert _decode_wav(b"RIFF\x00\x00\x00\x00WAVEfmt") is None
