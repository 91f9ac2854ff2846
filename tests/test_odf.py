"""ODF leg (odt/ods/odp): golden conventions, dispatch, hostile inputs.

Conventions under test mirror the legacy/OOXML legs: paragraphs and table
rows are newline-delimited, cells tab-joined, hyperlinks render
``display (url)``, footnotes/annotations follow the body, ODF's
out-of-body tracked-deletion store is never emitted.
"""

from __future__ import annotations

import io
import time
import zipfile

from b2xtranslator_spark.extractors import extract_payload_text
from b2xtranslator_spark.formats.odf import (
    extract_odp_parts,
    extract_ods_parts,
    extract_odt_parts,
    odf_kind,
)

_OFFICE_NS = (
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
    'xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0" '
    'xmlns:presentation="urn:oasis:names:tc:opendocument:xmlns:presentation:1.0" '
    'xmlns:xlink="http://www.w3.org/1999/xlink"'
)

_MIMES = {
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
}


def make_odf(kind: str, body_inner: str, with_mimetype: bool = True) -> bytes:
    which = {"odt": "text", "ods": "spreadsheet", "odp": "presentation"}[kind]
    content = (
        f'<?xml version="1.0" encoding="UTF-8"?>'
        f"<office:document-content {_OFFICE_NS}>"
        f"<office:body><office:{which}>{body_inner}</office:{which}></office:body>"
        f"</office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        if with_mimetype:
            zf.writestr(
                zipfile.ZipInfo("mimetype"), _MIMES[kind], zipfile.ZIP_STORED
            )
        zf.writestr("content.xml", content)
    return buf.getvalue()


ODT_BODY = (
    "<text:h>Title</text:h>"
    "<text:p>first <text:span>styled</text:span> para</text:p>"
    "<text:p>gap<text:s text:c='3'/>tab<text:tab/>break<text:line-break/>done</text:p>"
    '<text:p>go <text:a xlink:href="http://ex.example/x">here</text:a> now</text:p>'
    "<text:list><text:list-item><text:p>item one</text:p></text:list-item>"
    "<text:list-item><text:p>item two</text:p></text:list-item></text:list>"
    "<table:table><table:table-row>"
    "<table:table-cell><text:p>a1</text:p></table:table-cell>"
    "<table:table-cell><text:p>b1</text:p></table:table-cell>"
    "</table:table-row></table:table>"
    "<text:p>body with<text:note text:note-class='footnote'>"
    "<text:note-citation>1</text:note-citation>"
    "<text:note-body><text:p>the footnote</text:p></text:note-body>"
    "</text:note> a note</text:p>"
)


def test_odt_golden():
    text, elements, spans = extract_odt_parts(make_odf("odt", ODT_BODY))
    assert text == (
        "Title\n"
        "first styled para\n"
        "gap   tab\tbreak\ndone\n"
        "go here (http://ex.example/x) now\n"
        "item one\n"
        "item two\n"
        "a1\tb1\n"
        "body with a note\n"
        "the footnote"
    )
    assert elements > 0
    # spans tile the text
    assert spans[0][1] == 0 and spans[-1][2] == len(text)
    for (_, _, e), (_, s, _) in zip(spans, spans[1:]):
        assert e == s


def test_odt_tracked_deletions_not_emitted_insertions_kept():
    body = (
        "<text:tracked-changes><text:changed-region text:id='c1'>"
        "<text:deletion><text:p>DELETED SECRET</text:p></text:deletion>"
        "</text:changed-region></text:tracked-changes>"
        "<text:p>kept <text:change-start text:change-id='c2'/>inserted"
        "<text:change-end text:change-id='c2'/> tail</text:p>"
    )
    text, _, _ = extract_odt_parts(make_odf("odt", body))
    assert "DELETED SECRET" not in text
    assert text == "kept inserted tail"


def test_odt_annotation_follows_body():
    body = (
        "<text:p>main<office:annotation><text:p>reviewer says hi</text:p>"
        "</office:annotation> text</text:p>"
    )
    text, _, _ = extract_odt_parts(make_odf("odt", body))
    assert text == "main text\nreviewer says hi"


ODS_BODY = (
    '<table:table table:name="Sheet1">'
    "<table:table-row>"
    '<table:table-cell office:value-type="string"><text:p>name</text:p></table:table-cell>'
    '<table:table-cell office:value-type="float" office:value="42"/>'
    '<table:table-cell office:value-type="float" office:value="2.5"/>'
    '<table:table-cell office:value-type="boolean" office:boolean-value="true"/>'
    "</table:table-row>"
    "<table:table-row>"
    '<table:table-cell table:number-columns-repeated="3" office:value-type="string">'
    "<text:p>x</text:p></table:table-cell>"
    '<table:table-cell table:number-columns-repeated="16000"/>'
    "</table:table-row>"
    "</table:table>"
    '<table:table table:name="Sheet2"><table:table-row>'
    '<table:table-cell office:value-type="string"><text:p>solo</text:p></table:table-cell>'
    "</table:table-row></table:table>"
)


def test_ods_golden_numbers_and_repeats():
    text, cells, _ = extract_ods_parts(make_odf("ods", ODS_BODY))
    # 42 formats integer-bare, 2.5 keeps the fraction (shared xls formatter);
    # the 16000-wide trailing empty repeat is trimmed, not ballooned
    assert text == ("Sheet1\nname\t42\t2.5\tTRUE\nx\tx\tx\nSheet2\nsolo")
    assert cells >= 7


def test_odp_pages_then_notes():
    body = (
        "<draw:page><draw:frame><draw:text-box>"
        "<text:p>slide one line</text:p></draw:text-box></draw:frame>"
        "<presentation:notes><draw:frame><draw:text-box>"
        "<text:p>note for one</text:p></draw:text-box></draw:frame>"
        "</presentation:notes></draw:page>"
        "<draw:page><draw:frame><draw:text-box>"
        "<text:p>slide two line</text:p></draw:text-box></draw:frame></draw:page>"
    )
    text, _, _ = extract_odp_parts(make_odf("odp", body))
    assert text == "slide one line\nnote for one\nslide two line"


def test_dispatch_by_mimetype_and_fallback():
    for kind in ("odt", "ods", "odp"):
        body = {
            "odt": "<text:p>hello odt</text:p>",
            "ods": '<table:table table:name="S"><table:table-row>'
            "<table:table-cell><text:p>c</text:p></table:table-cell>"
            "</table:table-row></table:table>",
            "odp": "<draw:page><draw:frame><draw:text-box><text:p>s</text:p>"
            "</draw:text-box></draw:frame></draw:page>",
        }[kind]
        for with_mime in (True, False):
            payload = make_odf(kind, body, with_mimetype=with_mime)
            assert odf_kind(payload) == kind, (kind, with_mime)
            res = extract_payload_text(payload)
            assert res.status == "ok" and res.kind == kind
            assert res.text != ""
            assert res.metrics["spans"], (kind, with_mime)


def test_plain_zip_still_unsupported():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("readme.txt", "nothing here")
    res = extract_payload_text(buf.getvalue())
    assert res.status == "unsupported"


def test_hostile_mutation_soak():
    import numpy as np

    rng = np.random.default_rng(5050)
    base = bytearray(make_odf("odt", ODT_BODY))
    for _ in range(80):
        mutated = bytearray(base)
        idx = rng.integers(0, len(mutated), size=int(rng.integers(1, 20)))
        vals = rng.integers(0, 256, size=len(idx))
        for i, v in zip(idx, vals):
            mutated[int(i)] = int(v)
        t0 = time.perf_counter()
        res = extract_payload_text(bytes(mutated))
        assert time.perf_counter() - t0 < 10
        assert res.status in ("ok", "parse_error", "unsupported", "timeout", "encrypted")


def test_truncations_never_raise():
    base = make_odf("ods", ODS_BODY)
    for frac in (0.02, 0.1, 0.4, 0.7, 0.95):
        res = extract_payload_text(base[: max(1, int(len(base) * frac))])
        assert res.status in ("ok", "parse_error", "unsupported", "timeout")


def test_unicode_content_round_trips():
    body = "<text:p>café 語 ß naïve</text:p>"
    text, _, _ = extract_odt_parts(make_odf("odt", body))
    assert text == "café 語 ß naïve"


def test_pipeline_odf_payload_end_to_end(spark):
    import base64

    from b2xtranslator_spark.pipeline import PAYLOAD_PREFIX, run_extraction

    rows = []
    for i, kind in enumerate(("odt", "ods", "odp")):
        body = {
            "odt": "<text:p>pipe odt</text:p>",
            "ods": '<table:table table:name="S"><table:table-row>'
            "<table:table-cell><text:p>pipe ods</text:p></table:table-cell>"
            "</table:table-row></table:table>",
            "odp": "<draw:page><draw:frame><draw:text-box><text:p>pipe odp"
            "</text:p></draw:text-box></draw:frame></draw:page>",
        }[kind]
        payload = PAYLOAD_PREFIX + base64.b64encode(make_odf(kind, body)).decode()
        rows.append((f"c{i}", 0, "user", payload, None, float(i)))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, role string, text string, tool string, ts double"
    )
    out = {r["conv_id"]: r for r in run_extraction(df).collect()}
    assert out["c0"]["status"] == "ok" and out["c0"]["text"] == "pipe odt"
    assert out["c1"]["status"] == "ok" and "pipe ods" in out["c1"]["text"]
    assert out["c2"]["status"] == "ok" and out["c2"]["text"] == "pipe odp"


def test_deeply_nested_spans_flatten_instead_of_recursion_error():
    """ADVICE r05: >_MAX_INLINE_DEPTH nested text:span must degrade to a
    flat-text walk of the subtree, not RecursionError -> parse_error."""
    deep = "<text:span>" * 3000 + "deep" + "</text:span>" * 3000
    payload = make_odf("odt", f"<text:p>lead {deep} tail</text:p>")
    res = extract_payload_text(payload)
    assert res.status == "ok", res.error
    assert "deep" in res.text and "lead" in res.text and "tail" in res.text
