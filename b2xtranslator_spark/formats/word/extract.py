"""Per-document Word text extraction entry point + fixture normalization.

Mirrors DocTextExtractor.ExtractTextFromFile / ConvertToString
(/root/reference/Text/DocTextExtractor.cs:39-108): one shared text writer,
mappings applied in order Main -> Footnotes -> Endnotes -> Comments, final
en-space cleanup; and the test normalization contract
(IntegrationTests/SampleDocFileTextExtractionTests.cs:111-132).
"""

from __future__ import annotations

from ..cfb import CompoundFile
from .document import WordBinaryDocument
from .mapping import (
    DocumentMapping,
    apply_comments,
    apply_endnotes,
    apply_footnotes,
    apply_main,
)
from .writer import TextEventWriter


def extract_doc_text(payload: bytes, extract_urls: bool = True) -> str:
    """Extract plain text from a .doc payload (bytes of a CFB file)."""
    storage = CompoundFile(payload)
    return extract_doc_text_from_storage(storage, extract_urls)


def extract_doc_text_from_storage(
    storage: CompoundFile, extract_urls: bool = True
) -> str:
    doc = WordBinaryDocument(storage)
    writer = TextEventWriter(extract_urls)
    shared = {"textbox_count": 0}

    apply_main(DocumentMapping(doc, writer, extract_urls, "main", shared))
    apply_footnotes(DocumentMapping(doc, writer, extract_urls, "footnotes", shared))
    apply_endnotes(DocumentMapping(doc, writer, extract_urls, "endnotes", shared))
    apply_comments(DocumentMapping(doc, writer, extract_urls, "comments", shared))

    # final en-space cleanup (DocTextExtractor.cs:105)
    return writer.to_string().replace(" ", " ")


def normalize_text(text: str | None) -> str | None:
    """NormalizeText (SampleDocFileTextExtractionTests.cs:111-132), with C#
    string.Replace semantics (single left-to-right non-overlapping pass —
    Python's str.replace matches exactly)."""
    if text is None:
        return None
    normalized = (
        text.replace("\r\n", "\n")
        .replace("\r", "\n")
        .replace("\t", "")
        .replace("  ", " ")
        .replace("\n\n", "\n")
        .replace("\n\n", "\n")
    )
    lines = [line.strip() for line in normalized.split("\n")]
    lines = [line for line in lines if line]
    return "\n".join(lines).rstrip(" \n\r")
