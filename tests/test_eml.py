"""EML leg: header decode, MIME part selection, nesting, hostile inputs."""

from __future__ import annotations

import time

from b2xtranslator_spark.extractors import extract_payload_text
from b2xtranslator_spark.formats.eml import extract_eml_parts, looks_like_eml


def _crlf(s: str) -> bytes:
    return s.replace("\n", "\r\n").encode("utf-8")


SIMPLE = _crlf(
    "From: alice@example.com\n"
    "To: bob@example.com\n"
    "Subject: plain hello\n"
    "Date: Mon, 02 Feb 2026 10:00:00 +0000\n"
    "\n"
    "line one\n"
    "line two\n"
)


def test_simple_message_golden():
    text, parts, spans = extract_eml_parts(SIMPLE)
    assert text == (
        "From: alice@example.com\n"
        "To: bob@example.com\n"
        "Subject: plain hello\n"
        "Date: Mon, 02 Feb 2026 10:00:00 +0000\n"
        "line one\nline two"
    )
    assert parts >= 1
    assert spans[0][1] == 0 and spans[-1][2] == len(text)


def test_rfc2047_header_and_base64_body_decode():
    raw = _crlf(
        "From: carol@example.com\n"
        "Subject: =?utf-8?b?Y2Fmw6kg4oCUIOadseS6rA==?=\n"
        "MIME-Version: 1.0\n"
        "Content-Type: text/plain; charset=utf-8\n"
        "Content-Transfer-Encoding: base64\n"
        "\n"
        "bmHDr3ZlIGJvZHkK\n"
    )
    text, _, _ = extract_eml_parts(raw)
    assert "Subject: café — 東京" in text
    assert text.endswith("naïve body")


def test_multipart_alternative_prefers_plain():
    raw = _crlf(
        "From: d@example.com\n"
        "Subject: alt\n"
        "MIME-Version: 1.0\n"
        'Content-Type: multipart/alternative; boundary="B"\n'
        "\n"
        "--B\n"
        "Content-Type: text/plain\n"
        "\n"
        "the plain version\n"
        "--B\n"
        "Content-Type: text/html\n"
        "\n"
        "<p>the <b>html</b> version</p>\n"
        "--B--\n"
    )
    text, _, _ = extract_eml_parts(raw)
    assert "the plain version" in text
    assert "html version" not in text


def test_html_only_message_runs_markup_fold():
    raw = _crlf(
        "From: e@example.com\n"
        "Subject: htmlonly\n"
        "MIME-Version: 1.0\n"
        "Content-Type: text/html\n"
        "\n"
        '<html><body><p>see <a href="https://x.example/p">this</a></p></body></html>\n'
    )
    text, _, _ = extract_eml_parts(raw)
    assert text.endswith("see this (https://x.example/p)")


def test_attachment_skipped_mixed_parts_kept():
    raw = _crlf(
        "From: f@example.com\n"
        "Subject: mixed\n"
        "MIME-Version: 1.0\n"
        'Content-Type: multipart/mixed; boundary="M"\n'
        "\n"
        "--M\n"
        "Content-Type: text/plain\n"
        "\n"
        "body text here\n"
        "--M\n"
        "Content-Type: text/plain\n"
        'Content-Disposition: attachment; filename="log.txt"\n'
        "\n"
        "SECRET ATTACHMENT CONTENT\n"
        "--M--\n"
    )
    text, _, _ = extract_eml_parts(raw)
    assert "body text here" in text
    assert "SECRET ATTACHMENT" not in text


def test_nested_rfc822_recurses_with_headers():
    raw = _crlf(
        "From: g@example.com\n"
        "Subject: fwd\n"
        "MIME-Version: 1.0\n"
        'Content-Type: multipart/mixed; boundary="N"\n'
        "\n"
        "--N\n"
        "Content-Type: text/plain\n"
        "\n"
        "see below\n"
        "--N\n"
        "Content-Type: message/rfc822\n"
        "\n"
        "From: h@example.com\n"
        "Subject: inner note\n"
        "\n"
        "inner body\n"
        "--N--\n"
    )
    text, _, _ = extract_eml_parts(raw)
    assert "see below" in text
    assert "Subject: inner note" in text and "inner body" in text
    # outer headers come before nested content
    assert text.index("Subject: fwd") < text.index("Subject: inner note")


def test_sniff_is_conservative():
    assert looks_like_eml(SIMPLE)
    assert not looks_like_eml(b"plain prose with no headers at all")
    assert not looks_like_eml(b"From: x")  # one header line only
    assert not looks_like_eml(b"Subject: a\nDate: b\n\nno strong header")
    assert not looks_like_eml(b"\xd0\xcf\x11\xe0" + b"\x00" * 100)  # CFB magic
    res = extract_payload_text(SIMPLE)
    assert res.status == "ok" and res.kind == "eml"


def test_bad_charset_degrades_not_raises():
    raw = _crlf(
        "From: i@example.com\n"
        "Subject: weird\n"
        "Content-Type: text/plain; charset=not-a-charset\n"
        "\n"
        "still readable\n"
    )
    res = extract_payload_text(raw)
    assert res.status == "ok"
    assert "still readable" in res.text


def test_hostile_mutation_soak():
    import numpy as np

    rng = np.random.default_rng(7070)
    base = bytearray(
        _crlf(
            "From: j@example.com\n"
            "Subject: =?utf-8?b?Y2Fmw6k=?=\n"
            "MIME-Version: 1.0\n"
            'Content-Type: multipart/alternative; boundary="Z"\n'
            "\n--Z\nContent-Type: text/plain\nContent-Transfer-Encoding: base64\n\n"
            "bGluZQo=\n--Z\nContent-Type: text/html\n\n<p>alt</p>\n--Z--\n"
        )
        * 3
    )
    for _ in range(120):
        mutated = bytearray(base)
        idx = rng.integers(0, len(mutated), size=int(rng.integers(1, 20)))
        vals = rng.integers(0, 256, size=len(idx))
        for i, v in zip(idx, vals):
            mutated[int(i)] = int(v)
        t0 = time.perf_counter()
        res = extract_payload_text(bytes(mutated))
        assert time.perf_counter() - t0 < 10
        assert res.status in ("ok", "parse_error", "unsupported", "timeout", "encrypted")


def test_pipeline_eml_payload_end_to_end(spark):
    import base64

    from b2xtranslator_spark.pipeline import PAYLOAD_PREFIX, run_extraction

    payload = PAYLOAD_PREFIX + base64.b64encode(SIMPLE).decode()
    df = spark.createDataFrame(
        [("c0", 0, "user", payload, None, 0.0)],
        "conv_id string, turn_idx long, role string, text string, tool string, ts double",
    )
    row = run_extraction(df).collect()[0]
    assert row["status"] == "ok"
    assert row["text"].startswith("From: alice@example.com")
    assert row["text"].endswith("line two")
