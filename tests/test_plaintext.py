"""Plain-text/markdown leg + gzip payload unwrapping."""

from __future__ import annotations

import codecs
import gzip

from b2xtranslator_spark.extractors import extract_payload_text
from b2xtranslator_spark.formats.plaintext import (
    extract_text_parts,
    looks_like_text,
    maybe_gunzip,
)


def test_utf8_markdown_identity():
    md = "# Title\n\nSome *markdown* text with café.\n\n- item\n".encode()
    res = extract_payload_text(md)
    assert res.status == "ok" and res.kind == "text"
    assert res.text == "# Title\n\nSome *markdown* text with café.\n\n- item"
    spans = res.metrics["spans"]
    assert spans[0][1] == 0 and spans[-1][2] == len(res.text)


def test_bom_decodes():
    for enc, bom in (
        ("utf-16-le", codecs.BOM_UTF16_LE),
        ("utf-16-be", codecs.BOM_UTF16_BE),
    ):
        payload = bom + "wide chars 東京\nline two".encode(enc)
        text, n, _ = extract_text_parts(payload)
        assert text == "wide chars 東京\nline two" and n == 2
    payload = codecs.BOM_UTF8 + "sig text".encode()
    assert extract_text_parts(payload)[0] == "sig text"


def test_crlf_normalized_and_trailing_trimmed():
    text, _, _ = extract_text_parts(b"a\r\nb\rc\n\n\n")
    assert text == "a\nb\nc"


def test_sniff_rejects_binary_but_takes_prose():
    assert looks_like_text(b"ordinary prose, nothing special")
    assert not looks_like_text(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64)
    assert not looks_like_text(bytes(range(256)))
    assert not looks_like_text(b"")
    # latin-1-only bytes that are invalid UTF-8 stay out of the sniff
    assert not looks_like_text(b"caf\xe9 latin1")


def test_gzip_unwraps_html_and_text():
    html = b"<html><body><p>zipped page</p></body></html>"
    res = extract_payload_text(gzip.compress(html))
    assert res.status == "ok" and res.kind == "html"
    assert res.text == "zipped page"
    res = extract_payload_text(gzip.compress("plain notes café\n".encode()))
    assert res.status == "ok" and res.kind == "text"
    assert res.text == "plain notes café"


def test_gzip_corrupt_falls_through_to_error_path():
    bad = b"\x1f\x8b" + b"\x00" * 60
    assert maybe_gunzip(bad) == bad
    res = extract_payload_text(bad)
    assert res.status in ("parse_error", "unsupported")


def test_gzip_bomb_is_rejected():
    import b2xtranslator_spark.formats.plaintext as pt

    old = pt._MAX_GUNZIP_BYTES
    pt._MAX_GUNZIP_BYTES = 1 << 20
    try:
        res = extract_payload_text(gzip.compress(b"a" * (4 << 20)))
        assert res.status == "parse_error"
        assert "cap" in (res.error or "")
    finally:
        pt._MAX_GUNZIP_BYTES = old


def test_binary_garbage_still_reaches_cfb_error_path():
    import numpy as np

    rng = np.random.default_rng(11)
    res = extract_payload_text(bytes(rng.integers(0, 256, size=700, dtype=np.uint8)))
    assert res.status in ("parse_error", "unsupported")


def test_sniff_multibyte_boundary_and_binary_tail():
    # a large payload whose 4096-byte window cuts a multibyte char must
    # still sniff as text...
    body = ("x" * 4095 + "é" + "tail text " * 500).encode("utf-8")
    assert looks_like_text(body)
    # ...but invalid bytes EARLIER in the window stay rejected even when
    # the payload is large
    junk = b"ab\xfe\xfdcd" + b"x" * 8000
    assert not looks_like_text(junk)


def test_bz2_and_xz_payloads_unwrap():
    import bz2
    import lzma

    html = b"<html><body><p>bz2 page</p></body></html>"
    res = extract_payload_text(bz2.compress(html))
    assert res.status == "ok" and res.kind == "html" and res.text == "bz2 page"
    res = extract_payload_text(lzma.compress("xz notes café\n".encode()))
    assert res.status == "ok" and res.kind == "text" and res.text == "xz notes café"
    # corrupt containers fall through to the error path, never raise
    for bad in (b"BZh9" + b"\x00" * 40, b"\xfd7zXZ\x00" + b"\x00" * 40):
        r = extract_payload_text(bad)
        assert r.status in ("parse_error", "unsupported")


def test_truncated_utf16_payload_degrades_to_replacement():
    """ADVICE r05: an odd-length UTF-16 payload that claims the BOM sniff
    must extract with replacement chars, not raise into parse_error."""
    import codecs

    from b2xtranslator_spark.extractors import extract_payload_text

    payload = codecs.BOM_UTF16_LE + "hello".encode("utf-16-le") + b"\x41"
    res = extract_payload_text(payload)
    assert res.status == "ok", res.error
    assert res.text.startswith("hello")
