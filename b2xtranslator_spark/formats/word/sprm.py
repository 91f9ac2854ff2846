"""SPRM (single property modifier) decoding for Word binary documents.

Re-implements the table-driven grpprl walk of the reference
(/root/reference/Doc/DocFileFormat/SinglePropertyModifier.cs:478-548 and
PropertyExceptions.cs:20-105): a SPRM is a 2-byte opcode whose top 3 bits
(spra) encode the operand size {1,1,2,4,2,2,var,3}, followed by the operand.

Only the opcodes actually consumed by text extraction are named; everything
else is walked (to advance correctly) and ignored.
"""

from __future__ import annotations

import struct

# opcodes consumed by text extraction (SinglePropertyModifier.cs enum)
SPRM_PF_IN_TABLE = 0x2416
SPRM_PF_TTP = 0x2417
SPRM_PF_INNER_TABLE_CELL = 0x244B
SPRM_PF_INNER_TTP = 0x244C
SPRM_P_ITAP = 0x6649
SPRM_P_ITAP_ADD = 0x066A  # TableInfo.cs:57-63 treats 0x66A as additive itap
SPRM_P_WALL = 0x2664
SPRM_P_HUGE_PAPX = 0x6645
SPRM_P_HUGE_PAPX_ALT = 0x6646
SPRM_C_FRMARK_DEL = 0x0800
SPRM_C_FRMARK = 0x0801
SPRM_C_PIC_LOCATION = 0x6A03
SPRM_C_IBST_RMARK = 0x4804
SPRM_C_DTTM_RMARK = 0x6805
SPRM_C_SYMBOL = 0x6A09
SPRM_C_FSPEC = 0x0855
SPRM_C_HSP = 0x6A12
SPRM_C_RSID_PROP = 0x6815
SPRM_C_RSID_TEXT = 0x6816
SPRM_C_RSID_RM_DEL = 0x6817
SPRM_C_RMARK_INS_FULL = 0xCA89
SPRM_T_DEF_TABLE = 0xD608
SPRM_T_DEF_TABLE_10 = 0xD606
SPRM_P_CHG_TABS = 0xC615

_OPERAND_SIZE = (1, 1, 2, 4, 2, 2, 255, 3)


def parse_grpprl(data: bytes) -> list[tuple[int, bytes]]:
    """Walk a grpprl byte blob into [(opcode, operand bytes)].

    Matches PropertyExceptions.cs semantics: stops when fewer than 3 bytes
    remain or a SPRM would overrun the buffer; sprmTDefTable carries a 2-byte
    length (minus one compensation byte); sprmPChgTabs has the 255-length
    special case.
    """
    out: list[tuple[int, bytes]] = []
    pos = 0
    n = len(data)
    while pos + 2 < n:
        opcode = data[pos] | (data[pos + 1] << 8)
        spra = opcode >> 13
        op_size = _OPERAND_SIZE[spra]
        len_bytes = 0
        if op_size == 255:
            if opcode in (SPRM_T_DEF_TABLE, SPRM_T_DEF_TABLE_10):
                len_bytes = 2
                if pos + 4 > n:
                    break
                op_size = struct.unpack_from("<h", data, pos + 2)[0] - 1
            elif opcode == SPRM_P_CHG_TABS:
                len_bytes = 1
                op_size = data[pos + 2]
                if op_size == 255:
                    if pos + 4 > n:
                        break
                    itbd_del = data[pos + 3]
                    add_idx = pos + 3 + 2 * itbd_del
                    if add_idx >= n:
                        break
                    itbd_add = data[add_idx]
                    op_size = itbd_del * 4 + itbd_add * 3 - 1
            else:
                len_bytes = 1
                op_size = data[pos + 2]
        if op_size < 0:
            break
        total = 2 + len_bytes + op_size
        if pos + total > n:
            break
        out.append((opcode, data[pos + 2 + len_bytes : pos + total]))
        pos += total
    return out


class TableInfo:
    """Table flags from a PAPX grpprl (Text/TextMapping/TableInfo.cs:34-68)."""

    __slots__ = ("f_in_table", "f_ttp", "f_inner_ttp", "f_inner_table_cell", "itap")

    def __init__(self, grpprl: list[tuple[int, bytes]] | None):
        self.f_in_table = False
        self.f_ttp = False
        self.f_inner_ttp = False
        self.f_inner_table_cell = False
        self.itap = 0
        if not grpprl:
            return
        for opcode, args in grpprl:
            if opcode == SPRM_PF_IN_TABLE and args:
                self.f_in_table = args[0] != 0
            elif opcode == SPRM_PF_TTP and args:
                self.f_ttp = args[0] != 0
            elif opcode == SPRM_PF_INNER_TABLE_CELL and args:
                self.f_inner_table_cell = args[0] != 0
            elif opcode == SPRM_PF_INNER_TTP and args:
                self.f_inner_ttp = args[0] != 0
            elif opcode in (SPRM_P_ITAP, SPRM_P_ITAP_ADD) and len(args) >= 4:
                self.itap = struct.unpack_from("<I", args, 0)[0]
                if self.itap > 0:
                    self.f_in_table = True


def is_special(grpprl: list[tuple[int, bytes]]) -> bool:
    """chp.fSpec detection (DocumentMapping.cs:1683-1709): picture location,
    shape, or symbol sprms imply special; sprmCFSpec carries a bool."""
    for opcode, args in grpprl:
        if opcode in (SPRM_C_PIC_LOCATION, SPRM_C_HSP, SPRM_C_SYMBOL):
            return True
        if opcode == SPRM_C_FSPEC:
            return bool(args and args[0] != 0)
    return False


def get_symbol(grpprl: list[tuple[int, bytes]]) -> tuple[int, int] | None:
    """Return (font_index, char_code) from sprmCSymbol
    (DocumentMapping.cs:1713-1735)."""
    for opcode, args in grpprl:
        if opcode == SPRM_C_SYMBOL and len(args) >= 4:
            font_index = struct.unpack_from("<h", args, 0)[0]
            code = struct.unpack_from("<h", args, 2)[0]
            return font_index, code
    return None


def revision_is_deleted(grpprl: list[tuple[int, bytes]]) -> bool:
    """RevisionData.cs:66-69 marks a run Deleted when sprmCFRMarkDel is
    present — regardless of its bool operand (reference quirk, kept)."""
    return any(opcode == SPRM_C_FRMARK_DEL for opcode, _ in grpprl)
