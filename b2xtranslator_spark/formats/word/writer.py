"""Plain-text fold over WordprocessingML-shaped element events.

Behavioral re-implementation of the reference's TextWriter
(/root/reference/Text/TextModel/TextWriter.cs): mappings emit element events
(paragraphs, runs, w:t text, tabs, breaks, field chars, symbols) and this
writer folds them into plain text. Semantics preserved exactly:

- only ``w:t`` content propagates (TextWriter.cs:264-278);
- ``tc`` end -> tab, ``tr`` end -> newline, non-cell ``p`` end -> newline,
  with the first-structural-element suppression (TextWriter.cs:177-199);
- hyperlink field state machine: begin collects instrText, separate parses
  ``HYPERLINK`` instructions, end emits ``description (url)``
  (TextWriter.cs:208-232, 354-440);
- ``w:sym`` converts through the symbol font maps (TextWriter.cs:233-258).
"""

from __future__ import annotations

import re

from .symbols import convert_symbol_hex

_BOOKMARK_RE = re.compile(r'^HYPERLINK\s+\\l\s+"([^"]+)"', re.IGNORECASE)
_QUOTED_RE = re.compile(r'"([^"]+)"')
_UNQUOTED_RE = re.compile(r"^HYPERLINK\s+([^\s]+)", re.IGNORECASE)
_WS_RE = re.compile(r"\s+")


class _Element:
    __slots__ = ("prefix", "local_name", "content", "pure", "parent", "attrs")

    def __init__(self, parent, prefix, local_name):
        self.prefix = prefix
        self.local_name = local_name
        self.content: list[str] = []
        self.pure: list[str] = []
        self.parent = parent
        self.attrs: list[tuple[str, str | None]] = []


class TextEventWriter:
    def __init__(self, extract_urls: bool = True):
        self._root = _Element(None, None, "root")
        self._cur = self._root
        self._stack: list[_Element] = []
        self._extract_urls = extract_urls
        self._pending_url: str | None = None
        self._hyperlink_desc: list[str] = []
        self._in_hyperlink_desc = False
        self._inside_field = False
        self._field_instruction: list[str] = []
        self._first_structural = True
        self._in_sym = False
        self._sym_font: str | None = None
        self._sym_char: str | None = None

    # -- event surface ------------------------------------------------------

    def start_element(self, prefix: str | None, local_name: str) -> None:
        self._cur = _Element(self._cur, prefix, local_name)
        self._stack.append(self._cur)
        if prefix == "w" and local_name == "sym":
            self._in_sym = True
            self._sym_font = None
            self._sym_char = None

    def attribute(self, prefix: str | None, local_name: str, value: str | None) -> None:
        self._cur.attrs.append((local_name, value))
        if self._in_sym and prefix == "w":
            if local_name == "font":
                self._sym_font = value
            elif local_name == "char":
                self._sym_char = value

    def element_string(self, prefix: str | None, local_name: str) -> None:
        """WriteElementString: w:tab -> tab, w:br -> newline
        (TextWriter.cs:163-186)."""
        if prefix == "w":
            if local_name == "tab":
                self._cur.pure.append("\t")
            elif local_name == "br":
                self._cur.pure.append("\n")

    def write_string(self, value: str) -> None:
        if value:
            self._cur.content.append(value)

    write_chars = write_string

    def end_element(self) -> None:
        if not self._stack:
            return
        element = self._stack.pop()
        self._cur = element.parent or self._root
        ln = element.local_name
        if element.prefix == "w":
            if ln == "tc":
                self._cur.pure.append("\t")
            elif ln == "tr":
                if not self._first_structural:
                    self._cur.pure.append("\n")
                self._first_structural = False
            elif ln == "p":
                if not (element.parent and element.parent.local_name == "tc"):
                    if not self._first_structural:
                        self._cur.pure.append("\n")
                    self._first_structural = False
            elif ln == "instrText":
                if self._inside_field:
                    self._field_instruction.append("".join(element.content))
            elif ln == "fldChar":
                fld_type = next(
                    (v for k, v in element.attrs if k == "fldCharType"), None
                )
                if fld_type and fld_type.lower() == "begin":
                    self._inside_field = True
                    self._field_instruction.clear()
                    self._in_hyperlink_desc = False
                elif fld_type and fld_type.lower() == "separate":
                    self._begin_field_result()
                elif fld_type and fld_type.lower() == "end":
                    if self._pending_url is not None:
                        self._output_hyperlink()
                    self._inside_field = False
                    self._field_instruction.clear()
                    self._in_hyperlink_desc = False
            elif ln == "sym":
                if self._sym_font is not None and self._sym_char is not None:
                    self._cur.pure.append(
                        convert_symbol_hex(self._sym_char, self._sym_font)
                    )
                else:
                    self._cur.pure.append("?")
                self._in_sym = False
                self._sym_font = None
                self._sym_char = None

        self._cur.pure.extend(element.pure)

        if element.prefix == "w" and ln == "t":
            text = "".join(element.content)
            if self._in_hyperlink_desc and self._pending_url is not None:
                self._hyperlink_desc.append(text)
            else:
                self._cur.pure.append(text)

    def text_element(self, text: str) -> None:
        """Short-circuit for a complete plain ``w:t`` element: exactly the
        end_element('t') propagation path (hyperlink-description capture or
        parent pure-content append) without allocating the element. Only
        valid when no w:t-specific attribute/state logic applies — i.e. the
        caller is the plain-run fast path."""
        if self._in_hyperlink_desc and self._pending_url is not None:
            self._hyperlink_desc.append(text)
        else:
            self._cur.pure.append(text)

    def to_string(self) -> str:
        while self._stack:
            self.end_element()
        return "".join(self._root.pure)

    def current_length(self) -> int:
        """Length of text accumulated at the root so far. Only meaningful
        between mappings (each mapping balances its elements), which is when
        the extraction layer snapshots subdocument span boundaries."""
        return sum(len(s) for s in self._root.pure)

    # -- hyperlink machinery (TextWriter.cs:354-474) --------------------------

    def _begin_field_result(self) -> None:
        instruction = "".join(self._field_instruction).strip()
        self._field_instruction.clear()
        if instruction.upper().startswith("HYPERLINK "):
            self._pending_url = _extract_hyperlink_url(instruction)
            self._hyperlink_desc.clear()
            self._in_hyperlink_desc = self._pending_url is not None
        else:
            self._in_hyperlink_desc = False

    def _output_hyperlink(self) -> None:
        if self._pending_url is None:
            return
        description = "".join(self._hyperlink_desc).strip()
        if self._extract_urls:
            if description and description.lower() != self._pending_url.lower():
                self._cur.pure.append(f"{description} ({self._pending_url})")
            else:
                self._cur.pure.append(self._pending_url)
        else:
            if description:
                self._cur.pure.append(description)
        self._pending_url = None
        self._hyperlink_desc.clear()
        self._in_hyperlink_desc = False


def _sanitize_field_instruction(instruction: str) -> str:
    out = []
    for c in instruction:
        if c in "\r\n\t":
            out.append(" ")
        elif not _is_control(c):
            out.append(c)
    return _WS_RE.sub(" ", "".join(out)).strip()


def _is_control(c: str) -> bool:
    o = ord(c)
    return o < 32 or 127 <= o <= 159


def _extract_hyperlink_url(instruction: str) -> str | None:
    instruction = _sanitize_field_instruction(instruction)
    m = _BOOKMARK_RE.match(instruction)
    if m:
        return f'\\l "{m.group(1)}"'
    if instruction.upper().startswith('HYPERLINK "'):
        m = _QUOTED_RE.search(instruction)
        if m:
            return m.group(1)
        return instruction.replace('HYPERLINK "', "").replace('"', "").strip()
    m = _UNQUOTED_RE.match(instruction)
    if m:
        return m.group(1).strip()
    return None
