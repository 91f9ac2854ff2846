"""File Information Block (FIB) parsing.

Field layout follows the reference's reader order
(/root/reference/Doc/DocFileFormat/FileInformationBlock.cs:438-830), which in
turn follows [MS-DOC]: 32-byte FibBase, csw + fibRgW (28 B), cslw + fibRgLw
(88 B), cbRgFcLcb, then the fc/lcb pair blob. Only the ~40 fields actually
consumed by text extraction are materialized.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

NFIB_WORD2 = 0x000B
NFIB_WORD6 = 101
NFIB_WORD95 = 104  # some Word95 files use 104
NFIB_97BETA = 190
NFIB_97 = 193


class UnsupportedVersionError(ValueError):
    pass


class EncryptedFileError(ValueError):
    pass


# (attribute name, pair index into fibRgFcLcb97 blob); indices derive from the
# sequential reads at FileInformationBlock.cs:577-765.
_FCLCB97 = {
    "stshf": 1,
    "plcffnd_ref": 2,
    "plcfand_ref": 4,
    "plcf_sed": 6,
    "sttbf_glsy": 9,
    "plcf_glsy": 10,
    "plcf_hdd": 11,
    "plcf_bte_chpx": 12,
    "plcf_bte_papx": 13,
    "sttbf_ffn": 15,
    "sttbf_bkmk": 21,
    "plcf_bkf": 22,
    "plcf_bkl": 23,
    "dop": 31,
    "clx": 33,
    "sttbf_atn_bkmk": 37,
    "plc_spa_mom": 40,
    "plc_spa_hdr": 41,
    "plcfend_ref": 46,
    "dgg_info": 50,
    "sttbf_rmark": 51,
    "plcf_txbx_txt": 56,
    "plcf_hdrtxbx_txt": 58,
    "plf_lst": 73,
    "plf_lfo": 74,
    "plcf_txbx_bkd": 75,
    "plcf_txbx_hdr_bkd": 76,
}


@dataclass
class Fib:
    n_fib: int = 0
    n_fib_new: int = 0
    lid: int = 0
    lid_fe: int = 0
    pn_next: int = 0
    f_complex: bool = False
    c_quick_saves: int = 0
    f_encrypted: bool = False
    f_which_tbl_stm: bool = False
    f_crypto: bool = False
    f_fast_saved: bool = False
    fc_min: int = 0
    fc_mac: int = 0
    ccp_text: int = 0
    ccp_ftn: int = 0
    ccp_hdr: int = 0
    ccp_atn: int = 0
    ccp_edn: int = 0
    ccp_txbx: int = 0
    ccp_hdr_txbx: int = 0
    is_word95: bool = False
    fclcb: dict[str, tuple[int, int]] = field(default_factory=dict)

    def fc(self, name: str) -> int:
        return self.fclcb.get(name, (0, 0))[0]

    def lcb(self, name: str) -> int:
        return self.fclcb.get(name, (0, 0))[1]


def parse_fib(ws: bytes, offset: int = 0) -> Fib:
    """Parse the FIB at ``offset`` in the WordDocument stream bytes."""
    fib = Fib()
    if len(ws) < offset + 0x9A:
        raise UnsupportedVersionError("WordDocument stream too small for a FIB")
    w_ident, n_fib_raw = struct.unpack_from("<HH", ws, offset)
    if w_ident == 0xA5EC and n_fib_raw == NFIB_WORD2:
        raise UnsupportedVersionError("Word 2.0 files are not supported.")
    fib.n_fib = n_fib_raw
    (fib.lid,) = struct.unpack_from("<H", ws, offset + 6)
    (fib.pn_next,) = struct.unpack_from("<h", ws, offset + 8)
    (flag16,) = struct.unpack_from("<H", ws, offset + 0x0A)
    fib.f_complex = bool(flag16 & 0x0004)
    fib.c_quick_saves = (flag16 & 0x00F0) >> 4
    fib.f_encrypted = bool(flag16 & 0x0100)
    fib.f_which_tbl_stm = bool(flag16 & 0x0200)
    fib.f_crypto = bool(flag16 & 0x8000)
    flag8 = ws[offset + 0x11]
    fib.f_fast_saved = bool(flag8 & 0x20)
    fib.fc_min, fib.fc_mac = struct.unpack_from("<ii", ws, offset + 0x18)

    # fibRgW at +0x22 (28 bytes); lidFE is its last int16
    (fib.lid_fe,) = struct.unpack_from("<h", ws, offset + 0x22 + 26)

    # fibRgLw at +0x40 (FileInformationBlock.cs:494-505)
    lw = offset + 0x40
    fib.ccp_text = struct.unpack_from("<i", ws, lw + 0x0C)[0]
    fib.ccp_ftn = struct.unpack_from("<i", ws, lw + 0x10)[0]
    fib.ccp_hdr = struct.unpack_from("<i", ws, lw + 0x14)[0]
    fib.ccp_atn = struct.unpack_from("<i", ws, lw + 0x1C)[0]
    fib.ccp_edn = struct.unpack_from("<i", ws, lw + 0x20)[0]
    fib.ccp_txbx = struct.unpack_from("<i", ws, lw + 0x24)[0]
    fib.ccp_hdr_txbx = struct.unpack_from("<i", ws, lw + 0x28)[0]

    (cb_rg_fclcb,) = struct.unpack_from("<H", ws, offset + 0x98)
    blob_off = offset + 0x9A

    fib.is_word95 = fib.n_fib in (NFIB_WORD6, NFIB_WORD95, 100)
    if fib.is_word95:
        # Word95 offsets (FileInformationBlock.cs:516-575): CLX at FIB-relative
        # 0x00A4, most table structures absent; ccpText fallback from
        # fcMin/fcMac. Offset-relative so a Word95-format glossary subdocument
        # FIB (parsed at pn_next*512) reads its own CLX pointer, not the main
        # FIB's (ADVICE r01).
        if len(ws) >= offset + 0xAC:
            fc_clx, lcb_clx = struct.unpack_from("<II", ws, offset + 0xA4)
            fib.fclcb["clx"] = (fc_clx, lcb_clx)
        if fib.ccp_text == 0 and fib.fc_mac > fib.fc_min:
            fib.ccp_text = fib.fc_mac - fib.fc_min
        return fib

    if fib.n_fib and fib.n_fib < NFIB_97BETA:
        raise UnsupportedVersionError(
            "Could not parse the file because it was created by an unsupported "
            "application (Word version older than Word 95)."
        )

    n_pairs = min(cb_rg_fclcb, (len(ws) - blob_off) // 8)
    for name, idx in _FCLCB97.items():
        if idx < n_pairs:
            fc, lcb = struct.unpack_from("<II", ws, blob_off + idx * 8)
            fib.fclcb[name] = (fc, lcb)
    return fib
