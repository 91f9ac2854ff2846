"""Word binary document parse layer (WordDocument-equivalent).

Behavioral re-implementation of
/root/reference/Doc/DocFileFormat/WordDocument.cs:176-410 plus the small
table-stream structures it loads: PLCFs (Plex.cs:24-72), STTBs
(StringTable.cs:26-139, FontFamilyName.cs:64-115) and a minimal OfficeArt
record tree (Common/OfficeDrawing/Record.cs:250-272, OfficeArtContent.cs) —
just enough to resolve DrawnObject shapes to textbox indices.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

from ..cfb import CompoundFile
from .encodings import decode_ascii, resolve_single_byte_codepage
from .fib import EncryptedFileError, Fib, UnsupportedVersionError, parse_fib
from .fkp import ChpxIndex, Grpprl, get_all_chpx_fkps, get_all_papx_fkps
from .piecetable import PieceTable


# -- PLCF ---------------------------------------------------------------------


class Plex:
    """PLCF: n+1 CPs followed by n fixed-size structs (Plex.cs:24-72)."""

    def __init__(self, structure_length: int, data: bytes | None = None):
        self.cps: list[int] = []
        self.elements: list[bytes] = []
        if not data:
            return
        lcb = len(data)
        if structure_length > 0:
            n = (lcb - 4) // (structure_length + 4)
        else:
            n = (lcb - 4) // 4
        if n < 0:
            return
        try:
            self.cps = list(struct.unpack_from(f"<{n + 1}i", data, 0))
        except struct.error:
            return
        if structure_length > 0:
            base = (n + 1) * 4
            for i in range(n):
                off = base + i * structure_length
                self.elements.append(data[off : off + structure_length])

    def get_struct(self, cp: int) -> bytes | None:
        """Exact-CP match, like Plex.GetStruct (Plex.cs:78-100)."""
        for i, v in enumerate(self.cps):
            if v == cp:
                return self.elements[i] if i < len(self.elements) else None
        return None


def _read_plex(table: bytes | None, fc: int, lcb: int, struct_len: int) -> Plex:
    if table is None or lcb == 0:
        return Plex(struct_len)
    return Plex(struct_len, table[fc : fc + lcb])


# -- STTB ----------------------------------------------------------------------


def parse_sttb(data: bytes) -> tuple[list[str], list[bytes]]:
    """STTB walk (StringTable.cs:50-139): optional 0xFFFF fExtend marker,
    cData (2 or 4 bytes), cbExtra, then per-entry length-prefixed strings."""
    strings: list[str] = []
    raw: list[bytes] = []
    if len(data) < 4:
        return strings, raw
    pos = 0
    (marker,) = struct.unpack_from("<H", data, 0)
    extended = marker == 0xFFFF
    if extended:
        pos = 2
    (c,) = struct.unpack_from("<H", data, pos)
    if c != 0xFFFF:
        c_data = c
        pos += 2
    else:
        (c_data,) = struct.unpack_from("<i", data, pos)
        pos += 4
    if pos + 2 > len(data):
        return strings, raw
    (cb_extra,) = struct.unpack_from("<H", data, pos)
    pos += 2
    for _ in range(max(0, c_data)):
        if pos >= len(data):
            break
        if extended:
            if pos + 2 > len(data):
                break
            (cch,) = struct.unpack_from("<H", data, pos)
            pos += 2
            cb = cch * 2
            chunk = data[pos : pos + cb]
            strings.append(chunk.decode("utf-16-le", errors="replace"))
        else:
            cch = data[pos]
            pos += 1
            cb = cch
            chunk = data[pos : pos + cb]
            strings.append(decode_ascii(chunk))
        raw.append(chunk)
        pos += cb + cb_extra
    return strings, raw


def parse_font_names(data: bytes) -> list[str]:
    """Font table (SttbfFfn) -> xszFtn names (FontFamilyName.cs:64-111):
    each entry is FFID(1) weight(2) chs(1) pad(1) panose(10) fs(24) then a
    null-terminated UTF-16 name."""
    _, raws = parse_sttb(data)
    names = []
    for raw in raws:
        body = raw[39:]
        # find UTF-16 null terminator
        end = len(body)
        for i in range(0, len(body) - 1, 2):
            if body[i] == 0 and body[i + 1] == 0:
                end = i
                break
        names.append(body[:end].decode("utf-16-le", errors="replace"))
    return names


class HeaderFooterTable:
    """PlcfHdd -> per-section header/footer CP ranges
    (HeaderAndFooterTable.cs:16-112). Ranges are (cp, count) or None; CPs are
    offset by ccpText + ccpFtn."""

    def __init__(self, table_stream: bytes, fib) -> None:
        self.even_headers: list[tuple[int, int] | None] = []
        self.odd_headers: list[tuple[int, int] | None] = []
        self.first_headers: list[tuple[int, int] | None] = []
        self.even_footers: list[tuple[int, int] | None] = []
        self.odd_footers: list[tuple[int, int] | None] = []
        self.first_footers: list[tuple[int, int] | None] = []
        fc, lcb = fib.fclcb.get("plcf_hdd", (0, 0))
        n_ints = lcb // 4
        if n_ints < 8:
            return
        raw = table_stream[fc : fc + n_ints * 4]
        table = list(struct.unpack_from(f"<{len(raw) // 4}i", raw, 0))
        count = (len(table) - 8) // 6
        initial = fib.ccp_text + fib.ccp_ftn
        pos = 6  # first 6 entries describe footnote/endnote separators
        order = (
            self.even_headers,
            self.odd_headers,
            self.even_footers,
            self.odd_footers,
            self.first_headers,
            self.first_footers,
        )
        for _ in range(count):
            for bucket in order:
                if pos + 1 >= len(table) or table[pos] == table[pos + 1]:
                    bucket.append(None)
                else:
                    bucket.append(
                        (initial + table[pos], table[pos + 1] - table[pos])
                    )
                pos += 1


# -- OfficeArt (minimal) ----------------------------------------------------------


@dataclass
class ArtRecord:
    ver_instance: int
    type_code: int
    data: bytes
    children: list["ArtRecord"] = field(default_factory=list)

    @property
    def is_container(self) -> bool:
        return (self.ver_instance & 0x000F) == 0x000F

    def first_child(self, type_code: int) -> "ArtRecord | None":
        for c in self.children:
            if c.type_code == type_code:
                return c
        return None


def parse_art_records(data: bytes, pos: int, end: int, depth: int = 0) -> list[ArtRecord]:
    """8-byte record headers (ver/instance u16, type u16, size u32);
    containers recurse (Record.cs:250-272)."""
    out: list[ArtRecord] = []
    if depth > 32:
        return out
    while pos + 8 <= end:
        ver_inst, type_code, size = struct.unpack_from("<HHI", data, pos)
        body_end = min(end, pos + 8 + size)
        rec = ArtRecord(ver_inst, type_code, data[pos + 8 : body_end])
        if rec.is_container:
            rec.children = parse_art_records(data, pos + 8, body_end, depth + 1)
        out.append(rec)
        pos = body_end
    return out


class OfficeArt:
    """DggInfo content: drawing-group data + per-drawing containers
    (OfficeArtContent.cs:25-70); GetShapeContainer per cs:76-128."""

    SHAPE_CONTAINER = 0xF004
    GROUP_CONTAINER = 0xF003
    FSP = 0xF00A
    CLIENT_TEXTBOX = 0xF00D
    OPT = 0xF00B

    def __init__(self, data: bytes):
        self.drawings: list[ArtRecord] = []
        pos = 0
        end = len(data)
        if end < 8:
            return
        # first record: OfficeArtDggContainer
        try:
            _, _, size = struct.unpack_from("<HHI", data, 0)
            pos = min(end, 8 + size)
            while pos + 9 <= end:
                pos += 1  # dgglbl byte
                _, _, size = struct.unpack_from("<HHI", data, pos)
                recs = parse_art_records(data, pos, min(end, pos + 8 + size))
                if recs:
                    self.drawings.append(recs[0])
                pos = min(end, pos + 8 + size)
        except struct.error:
            return

    @staticmethod
    def _spid(shape_container: ArtRecord, child_index: int) -> int | None:
        if child_index >= len(shape_container.children):
            return None
        fsp = shape_container.children[child_index]
        if fsp.type_code != OfficeArt.FSP or len(fsp.data) < 4:
            return None
        return struct.unpack_from("<i", fsp.data, 0)[0]

    def get_shape_container(self, spid: int) -> ArtRecord | None:
        for drawing in self.drawings:
            group = drawing.first_child(self.GROUP_CONTAINER)
            if group is None:
                continue
            for child in group.children[1:]:
                if child.type_code == self.GROUP_CONTAINER and child.children:
                    container = child.children[0]
                    if container.type_code == self.SHAPE_CONTAINER:
                        if self._spid(container, 1) == spid:
                            return container
                elif child.type_code == self.SHAPE_CONTAINER:
                    if self._spid(child, 0) == spid:
                        return child
        return None


# -- WordDocument ------------------------------------------------------------------


class WordBinaryDocument:
    def __init__(self, storage: CompoundFile, fib_fc: int = 0):
        self.storage = storage
        self.word_stream = storage.get_stream("WordDocument")
        self.fib: Fib = parse_fib(self.word_stream, fib_fc)

        if self.fib.f_encrypted or self.fib.f_crypto:
            raise EncryptedFileError("The file is encrypted and cannot be processed.")

        is_word95 = self.fib.is_word95
        if not is_word95 and self.fib.n_fib and self.fib.n_fib < 190:
            raise UnsupportedVersionError(
                "Could not parse the file because it was created by an "
                "unsupported application (Word version older than Word 95)."
            )

        table_name = "1Table" if self.fib.f_which_tbl_stm else "0Table"
        self.table_stream: bytes | None = None
        if storage.has_stream(table_name):
            self.table_stream = storage.get_stream(table_name)
        elif storage.has_stream("0Table"):
            self.table_stream = storage.get_stream("0Table")
        elif storage.has_stream("1Table"):
            self.table_stream = storage.get_stream("1Table")
        elif not is_word95:
            raise KeyError(f"Stream with name '{table_name}' not found.")

        self.data_stream: bytes | None = (
            storage.get_stream("Data") if storage.has_stream("Data") else None
        )

        tbl = self.table_stream
        fib = self.fib

        # STTBs (WordDocument.cs:252-266)
        if tbl is not None:
            self.revision_authors, _ = parse_sttb(
                tbl[fib.fc("sttbf_rmark") : fib.fc("sttbf_rmark") + fib.lcb("sttbf_rmark")]
            ) if fib.lcb("sttbf_rmark") else ([], [])
            self.font_names = (
                parse_font_names(
                    tbl[fib.fc("sttbf_ffn") : fib.fc("sttbf_ffn") + fib.lcb("sttbf_ffn")]
                )
                if fib.lcb("sttbf_ffn")
                else []
            )
            self.bookmark_names, _ = parse_sttb(
                tbl[fib.fc("sttbf_bkmk") : fib.fc("sttbf_bkmk") + fib.lcb("sttbf_bkmk")]
            ) if fib.lcb("sttbf_bkmk") else ([], [])
            self.autotext_names, _ = parse_sttb(
                tbl[fib.fc("sttbf_glsy") : fib.fc("sttbf_glsy") + fib.lcb("sttbf_glsy")]
            ) if fib.lcb("sttbf_glsy") else ([], [])
        else:
            self.revision_authors = []
            self.font_names = []
            self.bookmark_names = []
            self.autotext_names = []

        # PLCFs (WordDocument.cs:273-297)
        self.section_plex = _read_plex(tbl, fib.fc("plcf_sed"), fib.lcb("plcf_sed"), 12)
        self.footnote_ref_plex = _read_plex(
            tbl, fib.fc("plcffnd_ref"), fib.lcb("plcffnd_ref"), 2
        )
        self.endnote_ref_plex = _read_plex(
            tbl, fib.fc("plcfend_ref"), fib.lcb("plcfend_ref"), 2
        )
        self.annotation_ref_plex = _read_plex(
            tbl, fib.fc("plcfand_ref"), fib.lcb("plcfand_ref"), 30
        )
        self.textbox_break_plex = _read_plex(
            tbl, fib.fc("plcf_txbx_bkd"), fib.lcb("plcf_txbx_bkd"), 6
        )
        self.textbox_break_plex_header = _read_plex(
            tbl, fib.fc("plcf_txbx_hdr_bkd"), fib.lcb("plcf_txbx_hdr_bkd"), 6
        )
        self.office_drawing_plex = _read_plex(
            tbl, fib.fc("plc_spa_mom"), fib.lcb("plc_spa_mom"), 26
        )
        self.office_drawing_plex_header = _read_plex(
            tbl, fib.fc("plc_spa_hdr"), fib.lcb("plc_spa_hdr"), 26
        )
        self.bookmark_start_plex = _read_plex(
            tbl, fib.fc("plcf_bkf"), fib.lcb("plcf_bkf"), 4
        )
        self.bookmark_end_plex = _read_plex(
            tbl, fib.fc("plcf_bkl"), fib.lcb("plcf_bkl"), 0
        )
        self.autotext_plex = _read_plex(
            tbl, fib.fc("plcf_glsy"), fib.lcb("plcf_glsy"), 0
        )

        # FKPs (WordDocument.cs:300-311)
        if tbl is not None:
            papx_fkps = get_all_papx_fkps(
                fib.fc("plcf_bte_papx"),
                fib.lcb("plcf_bte_papx"),
                self.word_stream,
                tbl,
                self.data_stream,
            )
            chpx_fkps = get_all_chpx_fkps(
                fib.fc("plcf_bte_chpx"),
                fib.lcb("plcf_bte_chpx"),
                self.word_stream,
                tbl,
            )
        else:
            papx_fkps, chpx_fkps = [], []
        self.papx_fkps = papx_fkps
        self.chpx_index = ChpxIndex(chpx_fkps)

        # STSH structure walk for reference error parity: the reference
        # parses the stylesheet before extraction (WordDocument.cs:319,
        # StyleSheet.cs:24-59) and some fixture expected-texts ARE its
        # failure messages on corrupt STSH. Content is text-neutral.
        self.styles_walked = 0
        if tbl is not None and not is_word95:
            from .stylesheet import parse_stylesheet

            self.styles_walked = parse_stylesheet(fib, tbl)

        # DOP cpgText (DocumentProperties.cs:1565)
        cpg_text = 0
        if tbl is not None and fib.lcb("dop") >= 560:
            dop = tbl[fib.fc("dop") : fib.fc("dop") + fib.lcb("dop")]
            if len(dop) >= 560:
                (cpg_text,) = struct.unpack_from("<H", dop, 558)

        # OfficeArt drawings for DrawnObject/textbox resolution
        self.office_art: OfficeArt | None = None
        self._load_office_art(tbl)

        # piece table + full text (WordDocument.cs:345-360)
        sb_cp = resolve_single_byte_codepage(fib.lid, fib.lid_fe, cpg_text)
        if is_word95 and tbl is None:
            self.piece_table = PieceTable.single_piece(
                fib.fc_min, fib.fc_mac, fib.ccp_text, sb_cp
            )
        else:
            clx_src = tbl if tbl is not None else self.word_stream
            clx = clx_src[fib.fc("clx") : fib.fc("clx") + fib.lcb("clx")]
            self.piece_table = PieceTable.from_clx(clx, fib.fc_mac, sb_cp)
            if not self.piece_table.pieces and is_word95:
                self.piece_table = PieceTable.single_piece(
                    fib.fc_min, fib.fc_mac, fib.ccp_text, sb_cp
                )
        self.text: str = self.piece_table.get_all_chars(self.word_stream)

        # AllPapx: fc -> grpprl, first-add-wins (WordDocument.cs:363-377)
        self.all_papx: dict[int, Grpprl] = {}
        for fkp in papx_fkps:
            for j, grppapx in enumerate(fkp.grppapx):
                if grppapx is not None and fkp.rgfc[j] not in self.all_papx:
                    self.all_papx[fkp.rgfc[j]] = grppapx
        if is_word95 and not self.all_papx:
            self.all_papx[fib.fc_min] = []

        # AllSepx keys: CPs at which sections end (WordDocument.cs:380-397);
        # the SEPX bytes themselves feed only non-text section properties.
        self.all_sepx: dict[int, bool] = {}
        for i, sed in enumerate(self.section_plex.elements):
            if i + 1 >= len(self.section_plex.cps) or len(sed) < 6:
                break
            cp = self.section_plex.cps[i + 1]
            (fc_sepx,) = struct.unpack_from("<I", sed, 2)
            if fc_sepx + 2 > len(self.word_stream):
                break
            (cb_sepx,) = struct.unpack_from("<h", self.word_stream, fc_sepx)
            if cb_sepx - 2 <= 0:
                break
            self.all_sepx[cp] = True

        # header/footer CP ranges (HeaderAndFooterTable.cs:16-112)
        self.header_footer = (
            HeaderFooterTable(tbl, fib) if tbl is not None else None
        )

        # glossary subdocument (WordDocument.cs:404-408)
        self.glossary: WordBinaryDocument | None = None
        if fib.pn_next > 0 and fib_fc == 0:
            try:
                self.glossary = WordBinaryDocument(storage, fib.pn_next * 512)
            except Exception:
                self.glossary = None

    def _load_office_art(self, tbl: bytes | None) -> None:
        if tbl is None:
            return
        # fcDggInfo is pair 50 of fibRgFcLcb97 (FileInformationBlock.cs:680)
        fib = self.fib
        fc, lcb = fib.fclcb.get("dgg_info", (0, 0))
        if lcb:
            self.office_art = OfficeArt(tbl[fc : fc + lcb])

    # lookups mirroring WordDocument.GetCharacterPropertyExceptions /
    # GetFileCharacterPositions (WordDocument.cs:413-500)
    def get_chpx_fcs(self, fc_min: int, fc_max: int) -> list[int]:
        return self.chpx_index.get_fcs(fc_min, fc_max)

    def get_chpxs(self, fc_min: int, fc_max: int) -> list[Grpprl]:
        return self.chpx_index.get_chpxs(fc_min, fc_max)
