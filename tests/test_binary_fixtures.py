"""Golden-file parity for the XLS/PPT paths over synthetic CFB fixtures.

The reference corpus has no .xls/.ppt samples, so these fixtures (crafted
byte-by-byte against the public [MS-XLS]/[MS-PPT]/[MS-CFB] specs, with
hand-declared expected text) are the golden suite for those formats —
analogous to tests/test_doc_fixtures.py for .doc.
"""

from __future__ import annotations

import numpy as np

from b2xtranslator_spark.sources.binfixtures import (
    build_ppt_fixture,
    build_ppt_incremental_fixture,
    build_xls_fixture,
    build_xls_shared_formula_fixture,
)
from b2xtranslator_spark.extractors import extract_payload_text


def test_xls_fixture_parity():
    payload, expected = build_xls_fixture()
    res = extract_payload_text(payload)
    assert res.status == "ok", res.error
    assert res.kind == "xls"
    assert res.text == expected


def test_xls_shared_formula_and_1904_parity():
    """VERDICT r03 #7: shared-formula cached results come from each cell's
    own Formula record (the ShrFmla definition is text-neutral), and the
    Date1904 flag does not change raw numeric output — matching the
    reference extractor, which ignores both."""
    payload, expected = build_xls_shared_formula_fixture()
    res = extract_payload_text(payload)
    assert res.status == "ok", res.error
    assert res.kind == "xls"
    assert res.text == expected


def test_ppt_fixture_parity():
    payload, expected = build_ppt_fixture()
    res = extract_payload_text(payload)
    assert res.status == "ok", res.error
    assert res.kind == "ppt"
    assert res.text == expected


def test_ppt_incremental_save_last_edit_wins():
    payload, expected = build_ppt_incremental_fixture()
    res = extract_payload_text(payload)
    assert res.status == "ok", res.error
    assert res.text == expected


def test_fixtures_survive_mutation_fuzz():
    """The synthetic fixtures join the hostile-input corpus: seeded byte
    flips must never raise and never stall."""
    import time

    rng = np.random.default_rng(77)
    for payload, _ in (build_xls_fixture(), build_xls_shared_formula_fixture(), build_ppt_fixture()):
        buf = bytearray(payload)
        for _ in range(40):
            mutated = bytearray(buf)
            idx = rng.integers(0, len(mutated), size=int(rng.integers(1, 30)))
            vals = rng.integers(0, 256, size=len(idx))
            for i, v in zip(idx, vals):
                mutated[i] = v
            t0 = time.perf_counter()
            res = extract_payload_text(bytes(mutated))
            assert time.perf_counter() - t0 < 10
            assert res.status in (
                "ok", "encrypted", "parse_error", "unsupported", "timeout"
            )


def test_truncated_fixtures_never_raise():
    for payload, _ in (build_xls_fixture(), build_xls_shared_formula_fixture(), build_ppt_fixture()):
        for frac in (0.02, 0.3, 0.7, 0.95):
            res = extract_payload_text(payload[: max(1, int(len(payload) * frac))])
            assert res.status in (
                "ok", "encrypted", "parse_error", "unsupported", "timeout"
            )
