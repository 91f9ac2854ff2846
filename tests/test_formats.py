"""Structure-level unit tests (no Spark): CFB container, XLS cells, PPT
record walk, encodings, normalization — mirroring the reference's UnitTests
(/root/reference/UnitTests/CompoundFileExtract.cs, DocFileFormat.cs,
SymbolHandlingTests.cs)."""

from __future__ import annotations

import os
import struct

import pytest

from b2xtranslator_spark.formats import ppt
from b2xtranslator_spark.formats.cfb import CfbError, CompoundFile
from b2xtranslator_spark.formats.word.document import WordBinaryDocument
from b2xtranslator_spark.formats.word.encodings import (
    decode_piece,
    decode_single_byte,
    decode_utf16le,
    resolve_single_byte_codepage,
)
from b2xtranslator_spark.formats.word.extract import normalize_text
from b2xtranslator_spark.formats.word.symbols import (
    convert_symbol_character,
    convert_symbol_hex,
)
from b2xtranslator_spark.formats.xls import extract_xls_text

SIMPLE_DOC = "/root/reference/UnitTests/files/simple.doc"
SIMPLE_XLS = "/root/reference/UnitTests/files/simple.xls"

needs_ref = pytest.mark.skipif(
    not os.path.exists(SIMPLE_DOC), reason="reference corpus unavailable"
)


@needs_ref
def test_cfb_streams_of_simple_doc():
    cf = CompoundFile(open(SIMPLE_DOC, "rb").read())
    names = {n for n, _ in cf.list_streams()}
    assert "WordDocument" in names
    assert "1Table" in names or "0Table" in names
    ws = cf.get_stream("WordDocument")
    assert struct.unpack_from("<H", ws, 0)[0] == 0xA5EC  # wIdent magic


def test_cfb_rejects_garbage():
    with pytest.raises(CfbError, match="Magic Number not found"):
        CompoundFile(b"{\\rtf1 this is not a compound file" + b"\x00" * 600)


@needs_ref
def test_word_document_structures():
    doc = WordBinaryDocument(CompoundFile(open(SIMPLE_DOC, "rb").read()))
    assert doc.fib.ccp_text > 0
    assert len(doc.piece_table.pieces) >= 1
    assert len(doc.text) >= doc.fib.ccp_text
    assert len(doc.all_papx) > 0
    # CP->FC mapping is monotone over the main document
    fcs = [doc.piece_table.cp_to_fc(cp) for cp in range(0, doc.fib.ccp_text, 7)]
    assert all(fc is not None for fc in fcs)


@needs_ref
def test_xls_simple_cells():
    text = extract_xls_text(open(SIMPLE_XLS, "rb").read())
    assert "Hello World" in text
    assert "1" in text and "4" in text


def test_single_byte_decode_dotnet_semantics():
    # cp1252 undefined bytes decode to same-valued C1 controls (as in .NET)
    assert decode_single_byte(b"\x81\x8d", 1252) == "\x81\x8d"
    assert decode_single_byte(b"\x93hi\x94", 1252) == "“hi”"


def test_utf16_odd_length_gets_replacement_char():
    assert decode_utf16le(b"a\x00b") == "a�"


def test_codepage_resolution_from_lid():
    assert resolve_single_byte_codepage(0x0419, 0, 0) == 1251  # ru
    assert resolve_single_byte_codepage(0x0407, 0, 0) == 1252  # de
    assert resolve_single_byte_codepage(0, 0, 1250) == 1250  # explicit DOP
    assert resolve_single_byte_codepage(0, 0, 0) == 1252  # default


def test_utf8_mojibake_repair():
    text = "Café – naïve".encode("utf-8")
    # decoded as cp1252 it shows Ã©/â€" mojibake; the heuristic repairs it
    assert decode_piece(text, 1252) == "Café – naïve"


def test_symbol_conversion():
    assert convert_symbol_character(0x61, "Symbol") == "α"
    assert convert_symbol_hex("f061", "Symbol") == "α"
    assert convert_symbol_character(0x4C, "Wingdings") == "♥"
    assert convert_symbol_character(0xB0, "Wingdings") == "?"
    assert convert_symbol_character(0x21, "Symbol") == "!"


def test_normalize_text_contract():
    # mirrors NormalizeText (SampleDocFileTextExtractionTests.cs:111-132)
    assert normalize_text("a\r\nb\rc") == "a\nb\nc"
    assert normalize_text("a\tb") == "ab"
    assert normalize_text("a\n\n\nb") == "a\nb"
    assert normalize_text("  a  \n   \n b ") == "a\nb"
    assert normalize_text("x \n\n") == "x"


def _rec(ver_inst: int, rtype: int, payload: bytes) -> bytes:
    return struct.pack("<HHI", ver_inst, rtype, len(payload)) + payload


def test_ppt_record_walk_collects_text_atoms():
    inner = _rec(0, ppt.RT_TEXT_CHARS, "Slide one".encode("utf-16-le")) + _rec(
        0, ppt.RT_TEXT_BYTES, b"Second\rline"
    )
    container = _rec(0x000F, ppt.RT_SLIDE, inner)
    out: list[str] = []
    ppt._collect_text(container, 0, len(container), out)
    assert out == ["Slide one", "Second\nline"]


def test_ppt_persist_directory_last_edit_wins():
    # stream layout: [dir2][dir1][edit1 -> dir1][edit2 -> dir2, lastEdit=edit1]
    dir2 = _rec(0, ppt.RT_PERSIST_DIRECTORY, struct.pack("<II", (1 << 20) | 1, 111))
    dir1_off = len(dir2)
    dir1 = _rec(0, ppt.RT_PERSIST_DIRECTORY, struct.pack("<II", (1 << 20) | 1, 222))
    edit1_off = dir1_off + len(dir1)
    edit1 = _rec(
        0,
        ppt.RT_USER_EDIT_ATOM,
        struct.pack("<IIIIII", 0, 0, 0, dir1_off, 1, 2) + b"\x00" * 4,
    )
    edit2_off = edit1_off + len(edit1)
    edit2 = _rec(
        0,
        ppt.RT_USER_EDIT_ATOM,
        struct.pack("<IIIIII", 0, 0, edit1_off, 0, 1, 2) + b"\x00" * 4,
    )
    stream = dir2 + dir1 + edit1 + edit2
    persist, doc_ref = ppt._persist_directory(stream, edit2_off)
    assert doc_ref == 1
    assert persist[1] == 111  # newest edit's directory entry wins


@needs_ref
def test_extract_urls_flag():
    from b2xtranslator_spark.formats.word.extract import extract_doc_text

    # a sample whose expected text carries "display (url)" hyperlinks
    doc = "/root/reference/samples/hyperlink.doc"
    if not os.path.exists(doc):
        pytest.skip("hyperlink sample missing")
    payload = open(doc, "rb").read()
    with_urls = extract_doc_text(payload, extract_urls=True)
    without = extract_doc_text(payload, extract_urls=False)
    assert "http" in with_urls
    assert len(without) <= len(with_urls)


def test_payload_size_cap():
    from b2xtranslator_spark.extractors import extract_payload_text

    class FakeHuge(bytes):
        def __len__(self):  # avoid allocating 256MB in the test
            return 300 * 1024 * 1024

    res = extract_payload_text(FakeHuge(b"x"))
    assert res.status == "skipped"
    assert "size cap" in res.error


# -- PictureDescriptor error-parity replay (ADVICE r03) -----------------------


def _pic_chpx(fc: int = 0):
    from b2xtranslator_spark.formats.word.sprm import SPRM_C_PIC_LOCATION

    return [(SPRM_C_PIC_LOCATION, struct.pack("<i", fc))]


def _pic_prefix(lcb: int = 1000, mm: int = 99) -> bytes:
    """Bytes up through cProps: lcb(4) cbHeader(2) mm(2) xExt/yExt/hMf(6)
    rcWinMf(14) 9x int16(18) 4 BorderCodes(16) dxaOrigin/dyaOrigin/cProps(6)."""
    return (
        struct.pack("<ihh", lcb, 0, mm)
        + b"\x00" * 6
        + b"\x00" * 14
        + b"\x00" * 18
        + b"\x00" * 16
        + b"\x00" * 6
    )


def test_picture_parity_truncation_at_record_header_raises():
    """A Data stream ending between cProps and Record.ReadRecord's 8-byte
    header throws EndOfStream in the reference (Record.cs:254-259)."""
    from b2xtranslator_spark.formats.word.mapping import (
        PictureParseError,
        _picture_error_parity,
    )

    stream = _pic_prefix()
    assert len(stream) == 68
    with pytest.raises(PictureParseError):
        _picture_error_parity(_pic_chpx(), stream)
    # a partial header (2 of 8 bytes) still throws
    with pytest.raises(PictureParseError):
        _picture_error_parity(_pic_chpx(), stream + b"\x00\x00")


def test_picture_parity_unknown_record_body_clamps_no_throw():
    """An unknown record type with an oversized declared body clamps via
    ReadBytes (Record.cs:67-74) — no exception, matching the reference."""
    from b2xtranslator_spark.formats.word.mapping import _picture_error_parity

    header = struct.pack("<HHI", 0, 0x1234, 0xFFFF)  # unknown type, huge size
    _picture_error_parity(_pic_chpx(), _pic_prefix() + header)  # must not raise


def test_picture_parity_container_truncated_child_header_raises():
    """A ShapeContainer whose RawData truncates mid-child-header replays
    RegularContainer.cs:25-47's EndOfStream."""
    from b2xtranslator_spark.formats.word.mapping import (
        PictureParseError,
        _picture_error_parity,
    )

    header = struct.pack("<HHI", 0x000F, 0xF004, 16)  # container, 16-byte body
    with pytest.raises(PictureParseError):
        _picture_error_parity(_pic_chpx(), _pic_prefix() + header + b"\x00" * 4)


def test_picture_parity_deep_container_nest_terminates():
    """A crafted self-similar container nest must terminate (depth cap), not
    crash the extractor with a RecursionError."""
    from b2xtranslator_spark.formats.word.mapping import _picture_error_parity

    # each level: header declaring a container child filling the rest
    depth_bytes = b""
    for level in range(200):
        size = 8 * (200 - level)
        depth_bytes += struct.pack("<HHI", 0x000F, 0xF003, size)
    header = struct.pack("<HHI", 0x000F, 0xF004, len(depth_bytes))
    _picture_error_parity(_pic_chpx(), _pic_prefix() + header + depth_bytes)
