"""Tier-1 correctness gate: golden-file parity with the reference corpus.

Mirrors the reference's xUnit theory
(/root/reference/IntegrationTests/SampleDocFileTextExtractionTests.cs:17-132):
for every samples/*.doc + *.expected.txt pair, extract -> normalize ->
case-insensitive equality; if extraction raises and the message contains the
expected text, that counts as an expected-error pass (encrypted files,
corrupt containers).

KNOWN_DEVIATIONS tracks the residue (fuzzer-minimized corpus files whose
expected output encodes reference-internal quirks); the reference itself
tracks 21 failures in /root/reference/failing-samples.txt.
"""

from __future__ import annotations

import codecs
import glob
import os

import pytest

from b2xtranslator_spark.formats.word.extract import extract_doc_text, normalize_text

SAMPLES = "/root/reference/samples"

# files we do not hard-assert (tracked separately; see module docstring)
# Only the reference's own tracked failures remain (failing-samples.txt).
# Round-3 closures: …5195… via the reference's FKP-list truncation semantics
# (one corrupt page drops all later pages, FormattedDiskPagePAPX.cs:107-139
# catch-all); …4892… via PictureDescriptor read-bounds error parity (a fuzzed
# fcPic beyond the Data stream throws the reference's EndOfStreamException,
# PictureDescriptor.cs:165-170 — the error message IS the expected text).
KNOWN_DEVIATIONS = {
    # reference known-fail (failing-samples.txt). Also PROVABLY unreachable
    # together with symbol.doc: both carry sprmCSymbol (font=Symbol,
    # code=0xF0E2), but symbol.expected.txt demands the identity char 'â'
    # while 61586.expected.txt demands '?', so no deterministic
    # (font, code) -> char mapping satisfies both. We match symbol.doc
    # (192 distinct codes) over 61586 (2 codes).
    "61586.doc",
    # reference known-fail. The expected text is a DIFFERENT revision of
    # this fast-saved document (different letter body: "many thanks for
    # ..."/"by post and fax" vs the piece-table text "facsimile
    # transmission"/"herefollows a copy ...") — produced by another tool
    # (the fixture name is an Apache POI bug id), not reachable through
    # the reference's own piece-table walk.
    "Bug51944.doc",
}


def read_expected(path: str) -> str:
    """File.ReadAllText BOM sniffing: UTF-16 BOMs else UTF-8."""
    raw = open(path, "rb").read()
    if raw.startswith(codecs.BOM_UTF16_LE) or raw.startswith(codecs.BOM_UTF16_BE):
        return raw.decode("utf-16")
    if raw.startswith(codecs.BOM_UTF8):
        return raw.decode("utf-8-sig")
    return raw.decode("utf-8", errors="replace")


def _cases():
    if not os.path.isdir(SAMPLES):
        return []
    out = []
    for doc in sorted(glob.glob(f"{SAMPLES}/*.doc")):
        expected = doc[:-4] + ".expected.txt"
        if os.path.exists(expected):
            out.append((os.path.basename(doc), doc, expected))
    return out


CASES = _cases()


@pytest.mark.skipif(not CASES, reason="reference sample corpus not available")
@pytest.mark.parametrize("name,doc_path,expected_path", CASES, ids=[c[0] for c in CASES])
def test_extracted_text_equals_expected(name, doc_path, expected_path):
    if name in KNOWN_DEVIATIONS:
        pytest.skip("tracked deviation (see KNOWN_DEVIATIONS)")
    expected = normalize_text(read_expected(expected_path))
    payload = open(doc_path, "rb").read()
    try:
        actual = normalize_text(extract_doc_text(payload))
    except Exception as exc:  # expected-error matching (tests cs:88-97)
        msg = normalize_text(str(exc)) or ""
        assert expected and expected.lower() in msg.lower(), (
            f"{name}: raised {exc!r}, expected text {expected[:80]!r}"
        )
        return
    assert actual.lower() == expected.lower()


def test_corpus_pass_rate_floor():
    """Aggregate floor so a broad regression fails loudly even if individual
    cases churn."""
    if not CASES:
        pytest.skip("no corpus")
    ok = 0
    for name, doc_path, expected_path in CASES:
        expected = normalize_text(read_expected(expected_path))
        try:
            actual = normalize_text(extract_doc_text(open(doc_path, "rb").read()))
            ok += actual.lower() == expected.lower()
        except Exception as exc:
            msg = normalize_text(str(exc)) or ""
            ok += bool(expected) and expected.lower() in msg.lower()
    assert ok >= 201, f"fixture pass count regressed: {ok}/{len(CASES)}"
