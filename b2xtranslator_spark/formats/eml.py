"""RFC 822/2045 email (.eml) -> plain-text extraction.

Mail archives are a standing LLM-training-data source; an .eml message is
MIME text, so this leg is stdlib `email` parsing plus the repo's text
conventions: the transport headers a reader actually wants (From / To /
Cc / Subject / Date) as ``Header: value`` lines in that fixed order, then
the body. RFC 2047 encoded-words in headers and base64/quoted-printable
transfer encodings in bodies are decoded by the stdlib policy machinery;
charset lookups that fail fall back to latin-1 (never raise — row-level
tolerance like every other leg).

Body selection walks MIME parts in document order: text/plain parts are
taken verbatim, text/html parts run through the markup fold
(formats/markup.py) ONLY when no plain sibling exists in the same
multipart/alternative (the standard preference), attachments
(Content-Disposition: attachment) are skipped, and nested message/rfc822
parts recurse depth-bounded with their own header block.

Dispatch sniff is conservative on purpose (the same policy as
looks_like_markup): only a payload whose head carries at least two known
message-header lines including one of From/Received/Return-Path is
routed here — a byte-flipped CFB or random text keeps flowing to the CFB
error path.
"""

from __future__ import annotations

import email
import email.policy
import re

from ..budget import check_deadline
from .markup import extract_html_parts
from .ooxml import _tiled_spans

__all__ = ["extract_eml_parts", "looks_like_eml"]

_HEADER_LINE_RE = re.compile(
    rb"^(From|To|Cc|Subject|Date|Received|Return-Path|Message-ID|MIME-Version"
    rb"|Content-Type|Delivered-To|Reply-To|Sender|X-[A-Za-z0-9-]+):",
    re.IGNORECASE,
)
_STRONG = (b"from:", b"received:", b"return-path:", b"delivered-to:")

_SHOWN_HEADERS = ("From", "To", "Cc", "Subject", "Date")
_MAX_DEPTH = 8
_MAX_PARTS = 512


class _MemoEmailPolicy(email.policy.EmailPolicy):
    """policy.default with a memoized header_fetch_parse.

    Structured header parsing (address lists, RFC 2047 decode through the
    header registry) dominated the per-message extract cost (~70% of
    1.3 ms/doc, profiled optimization round 6), and header VALUES repeat
    massively across a mail archive (the same From/To/Content-Type lines
    on thousands of messages). header_fetch_parse is a pure function of
    (name, value) and returns immutable str-subclass objects, so a
    bounded per-worker memo returns the identical object with identical
    semantics on every input — a repeat costs a dict hit instead of a
    registry parse."""

    _cache: dict[tuple[str, str], object] = {}
    _max_entries = 65536

    def header_fetch_parse(self, name, value):  # noqa: D102 — see class doc
        key = (name.lower(), value)
        got = self._cache.get(key)
        if got is None:
            got = super().header_fetch_parse(name, value)
            if len(self._cache) < self._max_entries:
                self._cache[key] = got
        return got


_POLICY = _MemoEmailPolicy()


def looks_like_eml(payload: bytes) -> bool:
    """Two header-shaped lines in the head, one of them a strong mail
    header (From/Received/Return-Path/Delivered-To)."""
    head = payload[:4096]
    if b"\x00" in head:
        return False
    hits = 0
    strong = False
    for line in head.splitlines()[:40]:
        if _HEADER_LINE_RE.match(line):
            hits += 1
            if line.split(b":", 1)[0].lower() + b":" in _STRONG:
                strong = True
    return strong and hits >= 2


def _decoded_body(part) -> str:
    """One leaf part's text with transfer-encoding and charset applied;
    latin-1 fallback on any charset failure."""
    try:
        text = part.get_content()
    except Exception:  # noqa: BLE001 — unknown charset/defect: degrade
        raw = part.get_payload(decode=True) or b""
        text = raw.decode("latin-1", "replace")
    # SMTP transports CRLF; the repo's text convention is \n
    return text.replace("\r\n", "\n").replace("\r", "\n")


def _walk(msg, lines: list[str], depth: int, budget: list[int], extract_urls: bool) -> None:
    check_deadline()
    if depth > _MAX_DEPTH or budget[0] <= 0:
        return
    budget[0] -= 1
    for name in _SHOWN_HEADERS:
        try:
            value = msg.get(name)
        except Exception:  # noqa: BLE001 — undecodable header: skip it
            value = None
        if value:
            lines.append(f"{name}: {str(value).strip()}")
    body_parts: list[str] = []

    def walk_part(part, in_alternative: bool) -> None:
        check_deadline()
        if budget[0] <= 0:
            return
        ctype = part.get_content_type()
        if ctype == "message/rfc822":
            # note: is_multipart() is True for rfc822 parts, so this must
            # precede the generic multipart walk or headers are lost
            sub = part.get_payload()
            inner = sub[0] if isinstance(sub, list) and sub else None
            if inner is not None:
                nested: list[str] = []
                _walk(inner, nested, depth + 1, budget, extract_urls)
                body_parts.append("\n".join(nested))
            return
        if part.is_multipart():
            if ctype == "multipart/alternative":
                children = part.get_payload()
                # standard preference: the LAST understood alternative,
                # plain beating html when both exist
                plain = [c for c in children if c.get_content_type() == "text/plain"]
                html = [c for c in children if c.get_content_type() == "text/html"]
                pick = (plain or html or children[-1:])
                for c in pick[-1:]:
                    walk_part(c, True)
            else:
                for c in part.get_payload():
                    walk_part(c, in_alternative)
            return
        budget[0] -= 1
        if part.get_content_disposition() == "attachment":
            return
        if ctype == "text/plain":
            body_parts.append(_decoded_body(part).rstrip("\n"))
        elif ctype == "text/html":
            text, _, _ = extract_html_parts(
                _decoded_body(part), extract_urls=extract_urls
            )
            if text:
                body_parts.append(text)

    walk_part(msg, False)
    lines.extend(p for p in body_parts if p != "")


def extract_eml_parts(
    payload: bytes, extract_urls: bool = True
) -> tuple[str, int, list[tuple[str, int, int]]]:
    """(text, parts_decoded, spans). Shown headers in fixed order, then
    the selected body parts; spans tile per line."""
    msg = email.message_from_bytes(payload, policy=_POLICY)
    lines: list[str] = []
    budget = [_MAX_PARTS]
    _walk(msg, lines, 0, budget, extract_urls)
    text = "\n".join(lines).rstrip("\n")
    return text, _MAX_PARTS - budget[0], _tiled_spans(text, "part")
