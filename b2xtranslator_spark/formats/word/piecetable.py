"""Piece table (CLX/PlcPcd) parsing and CP<->FC mapping.

Behavioral re-implementation of /root/reference/Doc/DocFileFormat/PieceTable.cs
and PieceDescriptor.cs with one deliberate physical change (SURVEY.md §2.3 J1,
§4): the reference builds a per-character ``Dictionary<int,int>`` (O(ccpText)
memory, flagged in its own perf tracker) — here CP->FC is a sorted boundary
array + ``bisect`` lookup, byte-identical in observable behavior.
"""

from __future__ import annotations

import struct
from bisect import bisect_right
from dataclasses import dataclass

from ...budget import check_deadline
from .encodings import UNICODE, decode_piece


@dataclass
class Piece:
    cp_start: int
    cp_end: int
    fc: int
    codepage: int  # UNICODE for UTF-16LE pieces, else a single-byte code page

    @property
    def multi(self) -> int:
        return 2 if self.codepage == UNICODE else 1

    @property
    def fc_end(self) -> int:
        return self.fc + (self.cp_end - self.cp_start) * self.multi


class PieceTable:
    def __init__(self, pieces: list[Piece], fc_mac: int):
        self.pieces = pieces
        self.fc_mac = fc_mac
        self._cp_starts = [p.cp_start for p in pieces]
        # max key of the C# FileCharacterPositions dict == count of CPs added
        self.max_cp = sum(p.cp_end - p.cp_start for p in pieces)

    # -- constructors ---------------------------------------------------------

    @classmethod
    def from_clx(
        cls, clx: bytes, fc_mac: int, single_byte_codepage: int
    ) -> "PieceTable":
        """Walk the CLX: skip type-1 Prc blocks, parse the type-2 PlcPcd
        (PieceTable.cs:82-171). PCD flag bit 0x40000000 -> compressed ANSI at
        fc/2, else UTF-16LE at fc (PieceDescriptor.cs:41-59)."""
        pieces: list[Piece] = []
        pos = 0
        n_bytes = len(clx)
        while pos < n_bytes:
            t = clx[pos]
            if t == 2:
                if pos + 5 > n_bytes:
                    break
                (lcb,) = struct.unpack_from("<i", clx, pos + 1)
                table = clx[pos + 5 : pos + 5 + lcb]
                n = (lcb - 4) // 12
                try:
                    for i in range(n):
                        cp = struct.unpack_from("<i", table, i * 4)[0]
                        cp_next = struct.unpack_from("<i", table, (i + 1) * 4)[0]
                        fc_value = struct.unpack_from(
                            "<I", table, (n + 1) * 4 + i * 8 + 2
                        )[0]
                        if fc_value & 0x40000000:
                            codepage = single_byte_codepage
                            fc = (fc_value & 0xBFFFFFFF) // 2
                        else:
                            codepage = UNICODE
                            fc = fc_value
                        pieces.append(Piece(cp, cp_next, fc, codepage))
                except struct.error:
                    pass
                break
            elif t == 1:
                if pos + 3 > n_bytes:
                    break
                (cb,) = struct.unpack_from("<h", clx, pos + 1)
                pos = pos + 1 + 2 + cb
            else:
                break
        return cls(pieces, fc_mac)

    @classmethod
    def single_piece(
        cls, fc_min: int, fc_mac: int, ccp_text: int, single_byte_codepage: int
    ) -> "PieceTable":
        """Word 95 fallback: one ANSI piece covering fcMin..fcMac
        (PieceTable.cs:30-64)."""
        return cls([Piece(0, ccp_text, fc_min, single_byte_codepage)], fc_mac)

    # -- CP <-> FC -------------------------------------------------------------

    def cp_to_fc(self, cp: int) -> int | None:
        """FileCharacterPositions[cp]; None when the dict would miss."""
        if cp == self.max_cp:
            return self.fc_mac
        i = bisect_right(self._cp_starts, cp) - 1
        if i < 0:
            return None
        p = self.pieces[i]
        if p.cp_start <= cp < p.cp_end:
            return p.fc + (cp - p.cp_start) * p.multi
        return None

    def contains_cp(self, cp: int) -> bool:
        return self.cp_to_fc(cp) is not None

    # -- decoding ---------------------------------------------------------------

    def get_all_chars(self, word_stream: bytes) -> str:
        """PieceTable.GetAllChars (PieceTable.cs:174-201)."""
        parts = []
        for p in self.pieces:
            check_deadline()
            parts.append(decode_piece(_read(word_stream, p.fc, p.fc_end), p.codepage))
        return "".join(parts)

    def get_chars(self, fc_start: int, fc_end: int, word_stream: bytes) -> str:
        """PieceTable.GetChars (PieceTable.cs:204-320) — the same 6-branch
        interval walk, including the branch-5 quirk where a fully-contained
        range REPLACES anything accumulated so far."""
        parts: list[str] = []
        for p in self.pieces:
            fc_piece_end = p.fc_end
            if fc_piece_end < fc_start:
                continue
            if fc_start >= p.fc and fc_end > fc_piece_end:
                parts.append(
                    decode_piece(_read(word_stream, fc_start, fc_piece_end), p.codepage)
                )
            elif fc_start <= p.fc and fc_end >= fc_piece_end:
                parts.append(
                    decode_piece(_read(word_stream, p.fc, fc_piece_end), p.codepage)
                )
            elif fc_start < p.fc and p.fc <= fc_end <= fc_piece_end:
                parts.append(
                    decode_piece(_read(word_stream, p.fc, fc_end), p.codepage)
                )
                break
            elif fc_start >= p.fc and fc_end <= fc_piece_end:
                if fc_end - fc_start <= 0:
                    return ""
                parts = [
                    decode_piece(_read(word_stream, fc_start, fc_end), p.codepage)
                ]
                break
            elif fc_end < p.fc:
                break
        return "".join(parts)


# Maximum zero-fill beyond the physical end of the WordDocument stream. Real
# documents only ever need a few bytes of tail padding (a piece whose declared
# fc_end marginally overruns the stream); a fuzzed piece descriptor can declare
# a ~4 GiB extent, and an unbounded pad would allocate it all — defeating the
# executor-memory cap (ADVICE r01, profiled 11.5s in one _read). 1 MiB is
# >1000x any legitimate pad observed across the 205-sample corpus.
_MAX_PAD_BYTES = 1 << 20


def _read(stream: bytes, start: int, end: int) -> bytes:
    """VirtualStream.Read semantics: short reads leave the zero-initialized
    tail in place, so pad to the requested length — but clamp the pad so a
    corrupt piece descriptor cannot force a multi-GiB allocation."""
    cb = end - start
    if cb <= 0:
        return b""
    chunk = stream[max(0, start) : max(0, end)]
    if len(chunk) < cb:
        chunk = chunk + b"\x00" * min(cb - len(chunk), _MAX_PAD_BYTES)
    return chunk
