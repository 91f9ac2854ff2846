"""Pure-stdlib video codec: uncompressed RIFF/AVI (BI_RGB 24-bit frames).

The container libs (pyav/ffmpeg) are absent from this environment, but
the AVI container itself is plain RIFF chunk layout ([MS-AVI] /
msdn AVIFILEFORMAT) and an UNCOMPRESSED 'DIB ' video stream's frames are
exactly BMP pixel data (bottom-up BGR rows, 4-byte padded) — the same
layout `formats/imaging.py` already decodes. That makes real frame
decode possible with struct alone, and turns the video path from a
declared stub into a working decoder for the one video format stdlib
can honestly support; compressed codecs still fall back to the
deterministic stub, clearly reported per row.

Defensive posture mirrors the CFB/zip readers: chunk walks are
bounds-checked and no-progress-guarded, frame/dimension counts capped,
truncated movi lists decode the frame prefix.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_avi", "encode_avi", "is_avi"]

_MAX_DIM = 8192
_MAX_FRAMES = 100_000


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def decode_avi(payload: bytes, max_frames: int = _MAX_FRAMES):
    """(frames, fps, (width, height)) for an uncompressed AVI; frames is
    a list of HxWx3 uint8 RGB arrays. Raises ValueError on non-AVI or
    compressed streams (callers fall back to their stub with a reported
    status)."""
    if not is_avi(payload):
        raise ValueError("not an AVI")
    width = height = 0
    usec_per_frame = 0
    compression = None
    frames: list[np.ndarray] = []

    def walk(buf: bytes, pos: int, end: int, depth: int = 0) -> None:
        nonlocal width, height, usec_per_frame, compression
        if depth > 16:  # hostile LIST nesting: real AVIs are ~3 deep
            return
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body = pos + 8
            body_end = min(body + size, end)
            if fourcc == b"LIST" and body + 4 <= end:
                walk(buf, body + 4, body_end, depth + 1)
            elif fourcc == b"avih" and size >= 40:
                usec_per_frame, = struct.unpack_from("<I", buf, body)
                width, height = struct.unpack_from("<II", buf, body + 32)
            elif fourcc == b"strf" and size >= 20 and compression is None:
                # BITMAPINFOHEADER: biCompression at offset 16
                compression, = struct.unpack_from("<I", buf, body + 16)
            elif fourcc in (b"00db", b"00dc") and len(frames) < max_frames:
                frames.append(buf[body:body_end])
            pos = body + size + (size & 1)  # chunks are word-aligned
            if size == 0 and fourcc not in (b"LIST",):
                pos += 2  # no-progress guard on hostile zero-size chunks

    walk(payload, 12, min(len(payload), 12 + struct.unpack_from("<I", payload, 4)[0]))
    if not (0 < width <= _MAX_DIM and 0 < height <= _MAX_DIM):
        raise ValueError(f"bad AVI geometry {width}x{height}")
    if compression not in (0, None):  # 0 == BI_RGB
        raise ValueError(f"compressed AVI stream (biCompression={compression})")
    row_bytes = (width * 3 + 3) & ~3
    decoded: list[np.ndarray] = []
    for raw in frames:
        if len(raw) < row_bytes * height:
            continue  # truncated frame: skip, keep the rest
        rows = np.frombuffer(raw[: row_bytes * height], dtype=np.uint8)
        rows = rows.reshape(height, row_bytes)[:, : width * 3]
        img = rows.reshape(height, width, 3)[::-1, :, ::-1]  # bottom-up BGR -> RGB
        decoded.append(np.ascontiguousarray(img))
    fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
    return decoded, fps, (width, height)


def encode_avi(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    """Minimal uncompressed AVI writer (test/fixture-grade, like the CFB
    writer): hdrl with avih + one vids/'DIB ' stream, movi of 00db DIB
    frames. Round-trips through decode_avi bit-exactly."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    row_bytes = (w * 3 + 3) & ~3

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<14I", int(1e6 / fps), 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 0, 1000,
                                        int(fps * 1000), len(frames), 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    for img in frames:
        bgr = img[::-1, :, ::-1]  # RGB top-down -> BGR bottom-up
        rows = np.zeros((h, row_bytes), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        movi_body += chunk(b"00db", rows.tobytes())
    movi = lst(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
