"""Formatted Disk Pages (FKPs): CHPX / PAPX run- and paragraph-property pages.

Behavioral re-implementation of
/root/reference/Doc/DocFileFormat/FormattedDiskPageCHPX.cs and
FormattedDiskPagePAPX.cs, plus the per-paragraph lookups from
WordDocument.GetCharacterPropertyExceptions / GetFileCharacterPositions
(WordDocument.cs:419-500). The reference scans every FKP per paragraph (its
documented O(n²) hazard, ISSUE-002); here a bisect over each FKP's first/last
FC bound skips non-overlapping pages while producing identical lists.
"""

from __future__ import annotations

import struct
from bisect import bisect_left

from .sprm import (
    SPRM_P_HUGE_PAPX,
    SPRM_P_HUGE_PAPX_ALT,
    parse_grpprl,
)

Grpprl = list[tuple[int, bytes]]


class ChpxFkp:
    """Raises exactly where the C# ctor (FormattedDiskPageCHPX.cs:19-71)
    throws on corrupt pages — the raise matters as much as the parse, because
    GetAllCHPXFKPs swallows it and thereby TRUNCATES the FKP list at the
    first bad page (all later pages, valid or not, are dropped). Fuzzed
    fixtures' expected text encodes that truncation."""

    __slots__ = ("rgfc", "grpchpx")

    def __init__(self, page: bytes):
        crun = page[511]
        # C# reads crun+1 int32s with no bounds guard: BitConverter throws
        # once the offset passes 508 (struct.error here is the same signal)
        self.rgfc = list(struct.unpack_from(f"<{crun + 1}i", page, 0))
        self.grpchpx: list[Grpprl] = []
        j = 4 * (crun + 1)
        for _ in range(crun):
            word_offset = page[j]
            j += 1
            if word_offset != 0:
                cb = page[word_offset * 2]
                if word_offset * 2 + 1 + cb > 512:
                    raise ValueError("CHPX bytes out of page")  # C# Array.Copy
                chpx = page[word_offset * 2 + 1 : word_offset * 2 + 1 + cb]
                self.grpchpx.append(parse_grpprl(chpx))
            else:
                self.grpchpx.append([])


class PapxFkp:
    """Same C#-exact throw semantics as ChpxFkp (FormattedDiskPagePAPX.cs:
    27-98): a corrupt page must raise so get_all_papx_fkps truncates the
    list at that page, reproducing the reference's defacto behavior on
    fuzzed files. Note the C# PAPX rgfc loop IS guarded (partial zeros, no
    throw) — but any crun >= 125 then throws immediately in the PHE copy,
    so raising from the rgfc unpack for crun >= 128 is net-identical."""

    __slots__ = ("rgfc", "grppapx")

    def __init__(self, page: bytes, data_stream: bytes | None):
        crun = page[511]
        if 4 * (crun + 1) > 512:
            # C#: rgfc partial-fills, then PHE Array.Copy at j=4*(crun+1)
            # immediately exceeds the page
            raise ValueError("PAPX crun exceeds page")
        self.rgfc = list(struct.unpack_from(f"<{crun + 1}i", page, 0))
        self.grppapx: list[Grpprl | None] = []
        j = 4 * (crun + 1)
        for _ in range(crun):
            if j + 13 > 512:
                raise ValueError("PAPX BX out of page")  # C# PHE Array.Copy
            word_offset = page[j]
            j += 13  # 1 byte offset + 12 bytes PHE
            if word_offset != 0:
                pad = 0
                cw = page[word_offset * 2]
                if cw == 0:
                    pad = 1
                    cw = page[word_offset * 2 + 1]
                if cw != 0:
                    start = word_offset * 2 + pad + 1
                    if start + cw * 2 > 512:
                        raise ValueError("PAPX bytes out of page")  # C# Array.Copy
                    papx = page[start : start + cw * 2]
                    # first 2 bytes are the istd; the rest is the grpprl
                    grpprl = parse_grpprl(papx[2:])
                    grpprl = _resolve_huge_papx(grpprl, data_stream)
                    self.grppapx.append(grpprl)
                else:
                    self.grppapx.append(None)
            else:
                self.grppapx.append([])


def _resolve_huge_papx(grpprl: Grpprl, data_stream: bytes | None) -> Grpprl:
    """sprmPHugePapx redirects to an external grpprl in the Data stream
    (ParagraphPropertyExceptions.cs:38-66)."""
    for opcode, args in grpprl:
        if opcode in (SPRM_P_HUGE_PAPX, SPRM_P_HUGE_PAPX_ALT) and len(args) >= 4:
            if data_stream is None:
                continue
            (fc,) = struct.unpack_from("<I", args, 0)
            if fc + 2 > len(data_stream):
                continue
            (size,) = struct.unpack_from("<H", data_stream, fc)
            external = parse_grpprl(data_stream[fc + 2 : fc + 2 + size])
            return external
    return grpprl


def _bin_table_pages(bin_table: bytes) -> list[int]:
    """PlcfBte walk (FormattedDiskPageCHPX.cs:81-109): n FCs then n-1 page
    numbers; each page number addresses a 512-byte FKP in the word stream."""
    lcb = len(bin_table)
    if lcb < 4:
        return []
    n = ((lcb - 4) // 8) + 1
    pages = []
    for i in range(n * 4, lcb - 3, 4):
        (pn,) = struct.unpack_from("<i", bin_table, i)
        pages.append(pn)
    return pages


def _page(word_stream: bytes, offset: int) -> bytes:
    page = word_stream[offset : offset + 512]
    if len(page) < 512:
        page = page + b"\x00" * (512 - len(page))
    return page


def get_all_chpx_fkps(
    fc_bte: int, lcb_bte: int, word_stream: bytes, table_stream: bytes
) -> list[ChpxFkp]:
    out: list[ChpxFkp] = []
    try:
        bin_table = table_stream[fc_bte : fc_bte + lcb_bte]
        for pn in _bin_table_pages(bin_table):
            out.append(ChpxFkp(_page(word_stream, pn * 512)))
    except Exception:
        pass  # reference swallows bin-table failures (GetAllCHPXFKPs)
    return out


def get_all_papx_fkps(
    fc_bte: int,
    lcb_bte: int,
    word_stream: bytes,
    table_stream: bytes,
    data_stream: bytes | None,
) -> list[PapxFkp]:
    out: list[PapxFkp] = []
    try:
        bin_table = table_stream[fc_bte : fc_bte + lcb_bte]
        for pn in _bin_table_pages(bin_table):
            out.append(PapxFkp(_page(word_stream, pn * 512), data_stream))
    except Exception:
        pass
    return out


class ChpxIndex:
    """Bisect-accelerated equivalents of WordDocument.GetFileCharacterPositions
    and GetCharacterPropertyExceptions (WordDocument.cs:413-500).

    The bisect fast path applies only to FKPs whose rgfc is actually sorted;
    corrupt/fuzzed pages fall back to the reference's linear scan so the
    produced lists are identical entry-for-entry (this drives the fallback-
    extraction heuristics, so it is parity-critical)."""

    def __init__(self, fkps: list[ChpxFkp]):
        self.fkps = fkps
        self._min = [min(f.rgfc) if f.rgfc else 0 for f in fkps]
        self._max = [max(f.rgfc) if f.rgfc else 0 for f in fkps]
        self._sorted = [
            all(f.rgfc[k] <= f.rgfc[k + 1] for k in range(len(f.rgfc) - 1))
            for f in fkps
        ]

    def get_fcs(self, fc_min: int, fc_max: int) -> list[int]:
        out: list[int] = []
        n_fkps = len(self.fkps)
        for i in range(n_fkps):
            fkp = self.fkps[i]
            rgfc = fkp.rgfc
            # reference skip conditions use rgfc[last] / rgfc[0] verbatim
            if rgfc[-1] < fc_min:
                continue
            if rgfc[0] > fc_max:
                break
            max_j = len(rgfc) - 1
            if i == n_fkps - 1:
                max_j = len(rgfc)
            if self._sorted[i]:
                lo = max(0, bisect_left(rgfc, fc_min) - 1)
            else:
                lo = 0
            for j in range(lo, max_j):
                v = rgfc[j]
                if v < fc_min:
                    if j + 1 < len(rgfc) and rgfc[j + 1] > fc_min:
                        out.append(v)
                elif v < fc_max:
                    out.append(v)
                elif self._sorted[i]:
                    break
        return out

    def get_chpxs(self, fc_min: int, fc_max: int) -> list[Grpprl]:
        out: list[Grpprl] = []
        for i, fkp in enumerate(self.fkps):
            # safe skips (hold for unsorted pages too: no j can satisfy
            # either include-condition); the reference scans every FKP
            if self._max[i] < fc_min:
                continue
            if self._min[i] >= fc_max and fc_min <= fc_max:
                continue
            rgfc = fkp.rgfc
            if self._sorted[i]:
                lo = max(0, bisect_left(rgfc, fc_min) - 1)
            else:
                lo = 0
            for j in range(lo, len(fkp.grpchpx)):
                v = rgfc[j]
                if v < fc_min:
                    if rgfc[j + 1] > fc_min:
                        out.append(fkp.grpchpx[j])
                elif v < fc_max:
                    out.append(fkp.grpchpx[j])
                elif self._sorted[i]:
                    break
        return out
