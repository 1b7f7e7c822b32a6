"""Multimodal column support: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, batch iteration, partition-size control)
is real and tested; the *codec* step is stubbed deterministically because
media libraries are not available in this environment — each stub is
clearly marked and raises ``NotImplementedError`` when a real decode is
requested.

Scale design: payloads never pass through Python row-at-a-time — Arrow
record batches stream through ``mapInPandas``; ``spark.sql.files.
maxPartitionBytes`` (and explicit ``repartition`` before heavy decode)
bound per-task memory when payloads are MBs each. Feature outputs are
narrow columns so downstream joins/aggregations shuffle features, not
payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media(media_id, kind, payload, meta) — binary column + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # 'image' | 'audio' | 'video'
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _stub_decode_features(payload: bytes) -> list[float]:
    """STUB: deterministic fake feature vector (md5-seeded), standing in
    for a real image/audio decode + embed. Replace with the real codec
    when the runtime has one."""
    h = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in h]


def _decode_ppm(payload: bytes):
    """REAL image decode for binary PPM (P6) — pure numpy, no codec lib:
    ASCII header ``P6 <w> <h> <maxval>`` then raw interleaved RGB bytes.
    Returns an (h, w, 3) uint8 array or None when the payload is not P6."""
    import numpy as np

    if not payload or not payload.startswith(b"P6"):
        return None
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        fields.append(payload[start:i])
    i += 1  # the single whitespace after maxval
    try:
        w, h, maxval = (int(f) for f in fields)
    except ValueError:
        return None
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    raw = np.frombuffer(payload, dtype=np.uint8, offset=i)
    if len(raw) < w * h * 3:
        return None
    return raw[: w * h * 3].reshape(h, w, 3)


def _decode_wav(payload: bytes):
    """REAL audio decode for PCM WAV — stdlib ``wave`` + numpy, no codec
    lib. Returns (samples: int numpy array mono-mixed, framerate) or
    None when the payload is not a PCM RIFF/WAVE."""
    import io
    import wave

    import numpy as np

    if not payload or not payload.startswith(b"RIFF"):
        return None
    try:
        with wave.open(io.BytesIO(payload)) as f:
            n, width, ch = f.getnframes(), f.getsampwidth(), f.getnchannels()
            if width != 2:
                return None
            raw = np.frombuffer(f.readframes(n), dtype="<i2")
            rate = f.getframerate()
    except (wave.Error, EOFError):
        return None
    if ch > 1:
        raw = raw[: (len(raw) // ch) * ch].reshape(-1, ch).mean(axis=1).astype(np.int64)
    return raw.astype(np.int64), rate


def _real_decode_features(payload: bytes, kind: str) -> list[float]:
    """Real per-payload features for the formats decodable without any
    codec library: P6 PPM images (per-channel means, global std,
    dimensions) and PCM WAV audio (duration, RMS, zero-crossing rate).
    Anything else raises — the honest boundary: JPEG/PNG/MP4 need codecs
    this environment does not ship."""
    import numpy as np

    if kind == "image":
        img = _decode_ppm(payload)
        if img is not None:
            h, w, _ = img.shape
            means = img.reshape(-1, 3).mean(axis=0) / 255.0
            return [
                float(means[0]),
                float(means[1]),
                float(means[2]),
                float(img.std() / 255.0),
                float(w),
                float(h),
            ]
    elif kind == "audio":
        decoded = _decode_wav(payload)
        if decoded is not None:
            samples, rate = decoded
            if len(samples) == 0:
                return [0.0, 0.0, 0.0]
            rms = float(np.sqrt((samples.astype(np.float64) ** 2).mean()))
            zcr = float((np.diff(np.signbit(samples)) != 0).mean()) if len(samples) > 1 else 0.0
            return [len(samples) / rate, rms / 32768.0, zcr]
    raise NotImplementedError(
        f"real decode for this {kind} payload requires a codec library "
        "(PIL/ffmpeg) not present in this environment; supported real "
        "formats: P6 PPM images, PCM16 WAV audio"
    )


def extract_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``real_decode=True`` REALLY decodes the two formats parseable without
    codec libraries — P6 PPM images and PCM WAV audio (see
    :func:`_real_decode_features`) — and raises ``NotImplementedError``
    for formats that need PIL/ffmpeg. The deterministic stub remains the
    default for synthetic corpora."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                feats = [
                    _real_decode_features(p, k)
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ]
            else:
                feats = pdf["payload"].map(_stub_decode_features)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 2, frame_bytes: int = 8) -> DataFrame:
    """Frame sampling for video payloads: split the payload into fixed-size
    chunks ("frames" — STUB for a real container demux) and keep every
    ``every_n``-th. Emits one row per kept frame via ``mapInPandas``
    (UDTF-shaped: 1 row -> N rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = payload or b""
                chunks = [
                    payload[i : i + frame_bytes]
                    for i in range(0, len(payload), frame_bytes)
                ]
                for j in range(0, len(chunks), every_n):
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(chunks[j])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame": frames}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, FRAMES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """Nearest-neighbor resize of image payloads to (out_w, out_h).

    The payload's first width*height bytes are interpreted as a row-major
    grayscale image (STUB for a real pixel decode — the *resample kernel*
    itself is the real thing: vectorized numpy fancy-indexing per Arrow
    batch, the shape a real thumbnailer takes at 100 TB). Output is a
    narrow out_w*out_h-byte column, so downstream stages shuffle
    thumbnails, never source payloads."""
    import numpy as np

    imgs = media.filter(F.col("kind") == "image").select(
        "media_id",
        "payload",
        F.col("meta.width").alias("w"),
        F.col("meta.height").alias("h"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["w"], pdf["h"]
            ):
                if payload is None:
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)[: w * h]
                if len(arr) < w * h:
                    continue  # malformed: shorter than metadata claims
                arr = arr.reshape(int(h), int(w))
                ri = (np.arange(out_h) * int(h)) // out_h
                rj = (np.arange(out_w) * int(w)) // out_w
                ids.append(mid)
                outs.append(arr[ri][:, rj].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "out_w": pd.Series([out_w] * len(ids), dtype="int32"),
                    "out_h": pd.Series([out_h] * len(ids), dtype="int32"),
                    "pixels": pd.Series(outs, dtype="object"),
                }
            )

    return imgs.mapInPandas(run, RESIZED_SCHEMA)


def byte_histogram(media: DataFrame) -> DataFrame:
    """Byte-value distribution of the binary payload per media kind — the
    corpus-intake integrity check for opaque media columns (spotting
    truncated/constant/oddly-encoded payloads before any decode).

    Pure JVM expressions: decode → per-position substring explode →
    partial-aggregated count. The shuffle carries |kinds × byte values|
    rows, never payloads. (Payload bytes are ASCII hex by construction
    here, so the DuckDB oracle mirrors byte ops as string ops.)"""
    valid = media.filter(F.col("payload").isNotNull()).select(
        "kind", F.decode(F.col("payload"), "UTF-8").alias("pay_str")
    )
    chars = F.expr(
        "transform(sequence(1, length(pay_str)), i -> substring(pay_str, i, 1))"
    )
    return (
        valid.select("kind", F.explode(chars).alias("byte_char"))
        .groupBy("kind", "byte_char")
        .agg(F.count("*").alias("n"))
        .orderBy("kind", "byte_char")
    )


def media_from_documents(spark, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from ``documents`` (the corpus
    ships no real media files): one row per doc with a binary payload +
    typed metadata. Payload bytes are the doc's double-md5 hex (64 ASCII
    bytes) so the DuckDB oracle can mirror byte operations as string
    operations; every 97th doc gets a NULL payload to exercise the
    validation path."""
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    hexpay = F.concat(F.md5("text"), F.md5(F.concat(F.col("text"), F.lit("f"))))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = (
        F.when(F.col("doc_id") % 97 == 0, F.lit(None).cast("binary"))
        .otherwise(F.encode(hexpay, "utf-8"))
    )
    meta = F.struct(
        F.when(kind == "image", (F.col("doc_id") % 8 + 1).cast("int")).alias("width"),
        F.when(kind == "image", (F.col("doc_id") % 6 + 1).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000)).alias("sample_rate"),
        F.when(kind == "video", F.lit(8)).alias("n_frames"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def validate_media(media: DataFrame) -> DataFrame:
    """JVM-side payload/metadata validation — no Python in the hot path:
    flag rows whose payload is missing, empty, or inconsistent with
    metadata."""
    return media.select(
        "media_id",
        "kind",
        F.length("payload").alias("payload_bytes"),
        (
            F.col("payload").isNull()
            | (F.length("payload") == 0)
            | (
                (F.col("kind") == "image")
                & (F.col("meta.width").isNull() | F.col("meta.height").isNull())
            )
            | ((F.col("kind") == "audio") & F.col("meta.sample_rate").isNull())
        ).alias("is_invalid"),
    )
