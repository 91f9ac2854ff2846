"""Pure-stdlib WAV (RIFF PCM) codec + vectorized audio features.

The container has no soundfile/pyav, but PCM WAV needs only the stdlib
``wave`` module and NumPy — so the multimodal AUDIO path can run a real
decoder. Features are the standard cheap audio-quality signals a
training-data pipeline computes per clip: RMS level, zero-crossing rate,
and spectral centroid (one rFFT), all vectorized NumPy.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, channels: int | None = None
) -> bytes:
    """float samples in [-1, 1] (n,) or (n, channels) -> 16-bit PCM WAV.
    Channel count is derived from the array shape; pass ``channels`` only
    to override (a mismatch would write a wrong header over interleaved
    frames)."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1] if channels is None else channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (float64 mono samples in [-1, 1], sample_rate).
    Multi-channel input is averaged to mono (the feature math wants one
    lane); 8/16/32-bit PCM supported."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        channels = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # unsigned 8-bit
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if channels > 1:
        arr = arr[: len(arr) - len(arr) % channels].reshape(-1, channels).mean(axis=1)
    return arr, rate


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """RMS level, zero-crossing rate (crossings/sec), spectral centroid
    (Hz), duration (s) — one pass + one rFFT."""
    n = len(samples)
    if n == 0:
        return {"duration_s": 0.0, "rms": 0.0, "zcr": 0.0, "centroid_hz": 0.0}
    rms = float(np.sqrt(np.mean(samples**2)))
    signs = np.signbit(samples)
    crossings = int(np.count_nonzero(signs[1:] != signs[:-1]))
    zcr = crossings * rate / n
    mag = np.abs(np.fft.rfft(samples))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    total = mag.sum()
    centroid = float((freqs * mag).sum() / total) if total > 0 else 0.0
    return {
        "duration_s": n / rate,
        "rms": rms,
        "zcr": float(zcr),
        "centroid_hz": centroid,
    }
