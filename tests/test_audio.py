"""Pure-stdlib WAV codec + audio features: round-trips, physical sanity of
the features on known signals, and the Spark operator path."""

from __future__ import annotations

import numpy as np
import pytest

from b2xtranslator_spark.formats.audio import (
    audio_features,
    decode_wav,
    encode_wav,
    is_wav,
)


def test_wav_round_trip_mono_16bit():
    rng = np.random.RandomState(0)
    samples = np.clip(rng.randn(4000) * 0.2, -1, 1)
    data = encode_wav(samples, sample_rate=16000)
    assert is_wav(data)
    out, rate = decode_wav(data)
    assert rate == 16000
    # 16-bit quantization: 0.5/32768 rounding plus the 32767/32768 scale
    # asymmetry at clipped +/-1.0 samples
    assert np.abs(out - samples).max() < 2.0 / 32767


def test_stereo_averages_to_mono():
    t = np.arange(1000) / 8000
    left = np.sin(2 * np.pi * 440 * t)
    right = -left  # cancels to silence
    data = encode_wav(np.stack([left, right], axis=1), sample_rate=8000, channels=2)
    out, _ = decode_wav(data)
    assert np.abs(out).max() < 1e-3


def test_features_on_known_sine():
    rate = 8000
    t = np.arange(rate) / rate  # 1 second
    a, freq = 0.5, 440.0
    f = audio_features(a * np.sin(2 * np.pi * freq * t), rate)
    assert abs(f["duration_s"] - 1.0) < 1e-9
    assert abs(f["rms"] - a / np.sqrt(2)) < 1e-3          # sine RMS = A/sqrt(2)
    assert abs(f["zcr"] - 2 * freq) < 5                   # 2 crossings/cycle
    assert abs(f["centroid_hz"] - freq) < 25              # spectrum peaks at f


def test_corrupt_wav_raises():
    for bad in (b"", b"RIFFxxxx", b"RIFF\x00\x00\x00\x00WAVEjunk"):
        with pytest.raises(Exception):
            decode_wav(bad)


def test_run_audio_features_operator(spark):
    from b2xtranslator_spark.operators.multimodal import (
        run_audio_features,
        synthesize_media,
    )

    media = synthesize_media(spark, n_rows=24)
    out = run_audio_features(media).toPandas().set_index("media_id")
    kinds = {r[0]: r[1] for r in media.select("media_id", "kind").collect()}
    for mid, row in out.iterrows():
        if kinds[mid] == "audio":
            assert row["status"] == "ok"
            # seeded 200-1100 Hz sines + broadband noise (noise magnitude
            # across all bins pulls the centroid up from the sine peak)
            assert 150 < row["centroid_hz"] < 2500
            assert abs(row["duration_s"] - 0.25) < 1e-6
        else:
            assert row["status"] == "unsupported_codec"
