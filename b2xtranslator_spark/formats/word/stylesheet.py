"""STSH (stylesheet) parse for error parity.

Replicates the reference's StyleSheet read sequence
(/root/reference/Doc/DocFileFormat/StyleSheet.cs:24-59,
StyleSheetInformation.cs:64-102) including WHERE it fails on corrupt input:
the fixture corpus encodes those failures as expected output (e.g.
clusterfuzz-…4892…'s "Unable to read beyond the end of the stream." comes
from BinaryReader.ReadUInt16 hitting the table-stream end inside the STD
loop). The style content itself is text-neutral for extraction — only the
structure walk and its C#-equivalent exceptions matter, so STD payloads are
skipped by length rather than parsed."""

from __future__ import annotations

import struct


class StylesheetParseError(ValueError):
    pass


_EOS = "Unable to read beyond the end of the stream."
_DEST = (
    "Destination array is not long enough to copy all the items in the "
    "collection. Check array index and length."
)
_OOR = (
    "Index was out of range. Must be non-negative and less than the size of "
    "the collection. (Parameter 'startIndex')"
)
_OOB = "Index was outside the bounds of the array."


def _u16(b: bytes, i: int) -> int:
    """System.BitConverter.ToUInt16 semantics."""
    if i < 0 or i >= len(b):
        raise StylesheetParseError(_OOR)
    if i + 2 > len(b):
        raise StylesheetParseError(_DEST)
    return struct.unpack_from("<H", b, i)[0]


def _u32(b: bytes, i: int) -> int:
    if i < 0 or i >= len(b):
        raise StylesheetParseError(_OOR)
    if i + 4 > len(b):
        raise StylesheetParseError(_DEST)
    return struct.unpack_from("<I", b, i)[0]


def parse_stylesheet(fib, table: bytes) -> int:
    """Walk the STSH exactly as the reference does; returns the number of
    style descriptors walked (feeds records_decoded). Raises
    StylesheetParseError with the C#-equivalent message on the same inputs
    the reference fails on."""
    fc, _lcb = fib.fclcb.get("stshf", (0, 0))

    # VirtualStream.Read into a 2-byte zero-initialized buffer (short reads
    # leave the zero tail) then BitConverter.ToInt16
    two = table[max(0, fc) : max(0, fc) + 2]
    two = two + b"\x00" * (2 - len(two))
    (cb_stshi,) = struct.unpack("<h", two)

    # VirtualStreamReader.ReadBytes(position, count): BinaryReader.ReadBytes
    # returns short on EOF but rejects a negative count
    if cb_stshi < 0:
        raise StylesheetParseError("Non-negative number required. (Parameter 'count')")
    stshi = table[max(0, fc) + 2 : max(0, fc) + 2 + cb_stshi]

    # StyleSheetInformation(stshi) — field reads in declared order
    cstd = _u16(stshi, 0)
    _cb_std_base = _u16(stshi, 2)
    if len(stshi) <= 4:
        raise StylesheetParseError(_OOB)  # bytes[4]
    _u16(stshi, 6)
    _u16(stshi, 8)
    _u16(stshi, 10)
    _u16(stshi, 12)
    _u16(stshi, 14)
    _u16(stshi, 16)
    if len(stshi) > 18:
        _u16(stshi, 18)
    if len(stshi) > 20:
        cb_lsd = _u16(stshi, 20)
        sti_max = _u16(stshi, 6)
        for i in range(sti_max):
            _u32(stshi, 22 + i * cb_lsd)

    # STD loop: ReadUInt16 throws EndOfStream past the stream end; the STD
    # payload read itself is short-tolerant (BinaryReader.ReadBytes)
    pos = max(0, fc) + 2 + cb_stshi
    walked = 0
    for _ in range(cstd):
        if pos + 2 > len(table):
            raise StylesheetParseError(_EOS)
        (cb_std,) = struct.unpack_from("<H", table, pos)
        pos += 2
        if cb_std:
            pos += cb_std  # skip-by-length; content is text-neutral
            walked += 1
    return walked
