"""Per-payload format dispatch: one binary document in, plain text out.

This is the pure-Python core the Spark pipeline batches over (SURVEY.md
§2.10): callable without Spark for pytest parity with the reference's sample
corpus. Dispatch mirrors the reference shells: a CFB container with a
``WordDocument`` stream is a .doc (doc2text), ``Workbook``/``Book`` is a .xls
(xls2x front-end), ``PowerPoint Document`` is a .ppt (ppt2x front-end).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from .budget import (
    DEFAULT_BUDGET_SECONDS,
    DocumentTimeout,
    clear_deadline,
    set_deadline,
)
from .formats import cfb
from .formats.markup import extract_html_parts, looks_like_markup
from .formats.pdf import PDF_MAGIC, extract_pdf_parts
from .formats.ppt import extract_ppt_text_parts
from .formats.eml import extract_eml_parts, looks_like_eml
from .formats.plaintext import extract_text_parts, looks_like_text, maybe_gunzip
from .formats.epub import epub_kind, extract_epub_parts
from .formats.odf import (
    extract_odp_parts,
    extract_ods_parts,
    extract_odt_parts,
    odf_kind,
)
from .formats.ooxml import (
    extract_docx_parts,
    extract_pptx_parts,
    extract_xlsx_parts,
    looks_like_ooxml,
    ooxml_kind,
)
from .formats.rtf import extract_rtf_parts, looks_like_rtf
from .formats.word.extract import extract_doc_text_parts, normalize_text
from .formats.xls import extract_xls_text_parts

__all__ = ["ExtractResult", "extract_payload_text", "normalize_text"]


@dataclass
class ExtractResult:
    text: str = ""
    status: str = "ok"
    error: str | None = None
    kind: str = "unknown"
    metrics: dict = field(default_factory=dict)


MAX_PAYLOAD_BYTES = 256 * 1024 * 1024  # per-document size cap (SCALING.md §2)


def extract_payload_text(
    payload: bytes,
    extract_urls: bool = True,
    budget_seconds: float = DEFAULT_BUDGET_SECONDS,
    force_kind: str | None = None,
    html_main_content: bool = False,
) -> ExtractResult:
    """Extract plain text from one binary document payload.

    Never raises: per-document failure tolerance is a row-level contract
    (reference: per-file try/catch in Shell/doc2text/Program.cs:56-100 —
    at corpus scale one hostile document must not fail a task). Documents
    over MAX_PAYLOAD_BYTES are skipped rather than risking executor memory;
    documents exceeding ``budget_seconds`` of decode wall time return
    ``status='timeout'`` rather than stalling the partition (SURVEY.md §7:
    hard timeouts/size caps per document)."""
    t0 = time.perf_counter()
    res = ExtractResult()
    if len(payload) > MAX_PAYLOAD_BYTES:
        res.status = "skipped"
        res.error = f"payload exceeds size cap ({len(payload)} bytes)"
        res.metrics["bytes_decoded"] = 0
        res.metrics["wall_ms"] = 0
        return res
    set_deadline(budget_seconds)
    try:
        # single-document gzip unwraps transparently (bounded) so
        # page.html.gz / notes.txt.gz dispatch like their plain twins
        payload = maybe_gunzip(payload)
        # format dispatch: an explicitly-declared kind (the pipeline's
        # `markup:` payload prefix) bypasses the sniff; otherwise markup is
        # detected by a conservative head probe (looks_like_markup — strict,
        # so byte-flipped CFB keeps flowing to the CFB error path) and
        # everything else is treated as a CFB container exactly as before
        if force_kind == "html" or (
            force_kind is None and looks_like_markup(payload)
        ):
            res.kind = "html"
            res.text, elements, spans = extract_html_parts(
                payload,
                main_content=html_main_content,
                extract_urls=extract_urls,
            )
            res.metrics["records_decoded"] = elements
            res.metrics["spans"] = spans
        elif force_kind == "rtf" or (
            force_kind is None and looks_like_rtf(payload)
        ):
            res.kind = "rtf"
            res.text, records, spans = extract_rtf_parts(
                payload, extract_urls=extract_urls
            )
            res.metrics["records_decoded"] = records
            res.metrics["spans"] = spans
        elif force_kind == "eml" or (
            force_kind is None and looks_like_eml(payload)
        ):
            res.kind = "eml"
            res.text, records, spans = extract_eml_parts(
                payload, extract_urls=extract_urls
            )
            res.metrics["records_decoded"] = records
            res.metrics["spans"] = spans
        elif payload.startswith(PDF_MAGIC):
            res.kind = "pdf"
            res.text, records, spans = extract_pdf_parts(payload)
            res.metrics["records_decoded"] = records
            res.metrics["spans"] = spans
        elif looks_like_ooxml(payload):
            # open the container ONCE and share it across the kind sniffs
            # and the extractor: the central directory was re-parsed up to
            # 4x per document before (guide §1.2 per-task work). A corrupt
            # zip keeps the exact pre-refactor semantics: every sniff
            # returns None, so the row is "unsupported" with the same
            # message.
            import io as _io
            import zipfile as _zipfile

            try:
                zf = _zipfile.ZipFile(_io.BytesIO(payload))
            except (_zipfile.BadZipFile, OSError, ValueError):
                zf = None
            kind = None
            if zf is not None:
                with zf:
                    kind = (
                        ooxml_kind(payload, zf=zf)
                        or odf_kind(payload, zf=zf)
                        or epub_kind(payload, zf=zf)
                    )
                    if kind == "docx":
                        res.text, records, spans = extract_docx_parts(
                            payload, extract_urls=extract_urls, zf=zf
                        )
                    elif kind == "xlsx":
                        res.text, records, spans = extract_xlsx_parts(
                            payload, zf=zf
                        )
                    elif kind == "pptx":
                        res.text, records, spans = extract_pptx_parts(
                            payload, zf=zf
                        )
                    elif kind == "odt":
                        res.text, records, spans = extract_odt_parts(
                            payload, extract_urls=extract_urls, zf=zf
                        )
                    elif kind == "ods":
                        res.text, records, spans = extract_ods_parts(
                            payload, zf=zf
                        )
                    elif kind == "odp":
                        res.text, records, spans = extract_odp_parts(
                            payload, zf=zf
                        )
                    elif kind == "epub":
                        res.text, records, spans = extract_epub_parts(
                            payload, extract_urls=extract_urls, zf=zf
                        )
            if kind is None:
                res.status = "unsupported"
                res.error = "zip container without a recognized OOXML/ODF part"
            if res.status == "ok":
                res.kind = kind
                res.metrics["records_decoded"] = records
                res.metrics["spans"] = spans
        elif force_kind == "text" or (
            force_kind is None and looks_like_text(payload)
        ):
            # LAST sniff in the chain: NUL-free strict-UTF-8 (or BOM) with
            # a letter-ratio floor, so binary garbage still reaches the
            # CFB magic error path below
            res.kind = "text"
            res.text, records, spans = extract_text_parts(payload)
            res.metrics["records_decoded"] = records
            res.metrics["spans"] = spans
        else:
            storage = cfb.CompoundFile(payload)  # raises the magic-number error
            if storage.has_stream("WordDocument"):
                res.kind = "doc"
                res.text, spans, records = extract_doc_text_parts(
                    storage, extract_urls
                )
                res.metrics["spans"] = spans
                res.metrics["records_decoded"] = records
            elif storage.has_stream("Workbook") or storage.has_stream("Book"):
                res.kind = "xls"
                res.text, records = extract_xls_text_parts(storage)
                res.metrics["records_decoded"] = records
            elif storage.has_stream("PowerPoint Document"):
                res.kind = "ppt"
                res.text, records = extract_ppt_text_parts(storage)
                res.metrics["records_decoded"] = records
            else:
                res.status = "unsupported"
                res.error = "no recognized document stream in container"
    except DocumentTimeout as exc:
        res.status = "timeout"
        res.error = str(exc)
        res.text = ""
    except Exception as exc:  # noqa: BLE001 — row-level tolerance by design
        msg = str(exc)
        if "encrypted" in msg.lower():
            res.status = "encrypted"
        else:
            res.status = "parse_error"
        res.error = msg
    finally:
        clear_deadline()
    res.metrics["bytes_decoded"] = len(payload)
    res.metrics["wall_ms"] = int((time.perf_counter() - t0) * 1000)
    return res
