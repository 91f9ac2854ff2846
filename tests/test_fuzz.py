"""Hostile-input robustness: seeded byte mutations of real documents must
never raise out of extract_payload_text (row-level tolerance contract) and
must never take pathologically long (the corrupt-input guards — cycle
checks, chain caps, no-progress advances — are load-bearing at 10^12 scale).
"""

from __future__ import annotations

import glob
import os
import time

import numpy as np
import pytest

from b2xtranslator_spark.extractors import extract_payload_text

SAMPLES = sorted(glob.glob("/root/reference/samples/*.doc"))


@pytest.mark.skipif(not SAMPLES, reason="reference corpus unavailable")
def test_mutated_documents_never_raise_and_stay_bounded():
    rng = np.random.default_rng(1234)
    docs = SAMPLES[:: max(1, len(SAMPLES) // 25)]  # ~25 spread across corpus
    worst = 0.0
    for path in docs:
        payload = bytearray(open(path, "rb").read())
        for _ in range(8):
            mutated = bytearray(payload)
            n_flips = int(rng.integers(1, 50))
            idx = rng.integers(0, len(mutated), size=n_flips)
            vals = rng.integers(0, 256, size=n_flips)
            for i, v in zip(idx, vals):
                mutated[i] = v
            t0 = time.perf_counter()
            res = extract_payload_text(bytes(mutated))
            dt = time.perf_counter() - t0
            worst = max(worst, dt)
            assert res.status in ("ok", "encrypted", "parse_error", "unsupported", "timeout")
            assert dt < 10, f"mutation of {os.path.basename(path)} took {dt:.1f}s"
    # corpus-scale sanity: no mutation should stall a partition
    assert worst < 10


@pytest.mark.skipif(not SAMPLES, reason="reference corpus unavailable")
def test_truncated_documents_never_raise():
    rng = np.random.default_rng(99)
    for path in SAMPLES[:: max(1, len(SAMPLES) // 15)]:
        payload = open(path, "rb").read()
        for frac in (0.01, 0.1, 0.5, 0.9):
            cut = max(1, int(len(payload) * frac))
            res = extract_payload_text(payload[:cut])
            assert res.status in ("ok", "encrypted", "parse_error", "unsupported", "timeout")
        # random small garbage
        res = extract_payload_text(bytes(rng.integers(0, 256, size=700, dtype=np.uint8)))
        assert res.status in ("parse_error", "unsupported")


def test_mutated_lzw_pdf_streams_never_raise_and_stay_bounded():
    """LZW-filtered PDF content streams under seeded byte flips must stay
    inside the row-tolerance contract (decode salvages a prefix or the
    text machine sees garbage — never an exception, never a stall)."""
    from tests.test_pdf import _lzw_encode, _one_page

    rng = np.random.default_rng(777)
    ops = (b"BT (fuzz seed text for the lzw soak) Tj ET\n" * 40)
    enc = _lzw_encode(ops)
    base = _one_page(enc, length=b"%d" % len(enc))
    base = base.replace(b"/Length", b"/Filter/LZWDecode/Length", 1)
    for _ in range(200):
        mutated = bytearray(base)
        n_flips = int(rng.integers(1, 30))
        idx = rng.integers(0, len(mutated), size=n_flips)
        vals = rng.integers(0, 256, size=n_flips)
        for i, v in zip(idx, vals):
            mutated[i] = v
        t0 = time.perf_counter()
        res = extract_payload_text(bytes(mutated))
        dt = time.perf_counter() - t0
        assert res.status in ("ok", "parse_error", "unsupported", "timeout")
        assert dt < 10
