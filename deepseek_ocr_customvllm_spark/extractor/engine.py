"""Per-document extraction pipeline: (url, html-bytes) -> ExtractResult.

This is the rebuild of the reference worker's per-job lifecycle
(``app/services/ocr_service.py:60-212``) as a pure function:

1. gate:      oversize rejection (``app/api/routes/ocr.py:42-43``,
              ``MAX_UPLOAD_MB=200``) and content-type dispatch on magic
              bytes (``%PDF-`` vs HTML) — the rebuild accepts both
              branches where the reference's upload gate rejected
              non-PDF (``app/api/routes/ocr.py:33``)
2. "model":   deterministic extractor per branch — HTML boilerplate
              strip (:mod:`.html_extract`) or PDF text-layer assembly
              (:mod:`.pdf_extract`) — followed by n-gram repetition
              suppression (:mod:`.norepeat`), producing per-page tagged
              markdown, the same contract the reference's vLLM call
              produced (deterministic: greedy temp-0.0 analogue)
3. folds:     raw markdown (page-split join), clean markdown (chunked
              per-page clean), block tree from the P1-cleaned text
              (``ocr_service.py:123-141``), spans from the grounding tags
4. envelope:  ``{document:{metadata, content:[{page_number, blocks}]}}``
              (``ocr_service.py:157-176``); ``processed_at`` is derived
              from the row's ``warc_ts`` (NOT wall clock) so output is a
              pure function of the input row

Error isolation mirrors the reference's per-job try/except
(``ocr_service.py:200-207``): any exception becomes a FAILED result row,
never a raised error (a Spark task must not die for one bad document).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from .blocks import parse_blocks
from .html_extract import extract_html_page
from .markdown import assemble_clean, assemble_raw
from .norepeat import suppress_repeated_ngrams
from .pdf_crypt import declares_encrypt
from .pdf_extract import extract_pdf_pages
from .tags import extract_spans, resolve_tags_document

# Reference upload cap: MAX_UPLOAD_MB=200 (app/config.py:57, routes/ocr.py:42).
MAX_BYTES = 200 * 1024 * 1024

# Status values mirror the reference state machine (app/models/documents.py:12-17);
# REJECTED is the rebuild's quarantine state for the oversize gate.
STATUS_SUCCESS = "SUCCESS"
STATUS_FAILED = "FAILED"
STATUS_REJECTED = "REJECTED"

CONTENT_TYPE_PDF = "pdf"
CONTENT_TYPE_HTML = "html"
CONTENT_TYPE_EMPTY = "empty"

# Trailer-scoped /Encrypt detection lives with the decryption code; the
# alias keeps this module's historical import surface for tests.
_is_encrypted_pdf = declares_encrypt


@dataclass
class ExtractResult:
    url: str
    content_type: str
    status: str
    n_pages: int = 0
    markdown_raw: str = ""
    markdown: str = ""
    pages: List[Dict[str, Any]] = field(default_factory=list)  # [{page_number, blocks}]
    spans: List[Dict[str, Any]] = field(default_factory=list)
    error: Optional[str] = None
    n_chars: int = 0
    n_blocks: int = 0


def doc_id_for_url(url: str) -> str:
    """Deterministic job-id analogue: the reference keys jobs by uuid4
    (``app/api/routes/ocr.py:36``); the rebuild derives a stable 12-hex
    id from the url so image-link paths are reproducible."""
    return hashlib.md5(url.encode("utf-8")).hexdigest()[:12]


def detect_content_type(payload: bytes) -> str:
    """Magic-byte dispatch (replaces the filename-extension gate at
    routes/ocr.py:33)."""
    if not payload or not payload.strip():
        return CONTENT_TYPE_EMPTY
    if payload[:5] == b"%PDF-":
        return CONTENT_TYPE_PDF
    return CONTENT_TYPE_HTML


def extract_document(
    url: str, payload: Optional[bytes], max_bytes: int = MAX_BYTES
) -> ExtractResult:
    """Full deterministic pipeline for one document."""
    if payload is None:
        payload = b""
    try:
        if len(payload) > max_bytes:
            return ExtractResult(
                url=url,
                # 4 KiB prefix: enough for any realistic whitespace/BOM preamble
                # before the HTML, while never strip()-ing a huge payload
                content_type=detect_content_type(payload[:4096]),
                status=STATUS_REJECTED,
                error=f"payload {len(payload)} bytes exceeds cap {max_bytes}",
            )
        ctype = detect_content_type(payload)
        if ctype == CONTENT_TYPE_EMPTY:
            return ExtractResult(url=url, content_type=ctype, status=STATUS_SUCCESS)

        if ctype == CONTENT_TYPE_PDF:
            # Standard-security-handler files that the EMPTY user/owner
            # password opens are decrypted transparently (pdf_crypt —
            # the reference's PyMuPDF path does the same); files that
            # genuinely need a password raise EncryptedPdfError inside
            # extract_pdf_pages and QUARANTINE as FAILED-with-reason
            # rather than passing through as empty SUCCESS rows.
            pages = extract_pdf_pages(payload)
        else:
            text = payload.decode("utf-8", errors="replace")
            pages = [extract_html_page(text)]

        pages = [suppress_repeated_ngrams(p) for p in pages]

        doc_id = doc_id_for_url(url)
        markdown_raw = assemble_raw(pages)
        markdown = assemble_clean(pages)

        page_entries: List[Dict[str, Any]] = []
        all_spans: List[Dict[str, Any]] = []
        n_blocks = 0
        for page_idx, page in enumerate(pages):
            cleaned = resolve_tags_document(page, doc_id)
            blocks = parse_blocks(cleaned)
            n_blocks += len(blocks)
            page_entries.append({"page_number": page_idx + 1, "blocks": blocks})
            all_spans.extend(extract_spans(page))

        return ExtractResult(
            url=url,
            content_type=ctype,
            status=STATUS_SUCCESS,
            n_pages=len(pages),
            markdown_raw=markdown_raw,
            markdown=markdown,
            pages=page_entries,
            spans=all_spans,
            n_chars=len(markdown),
            n_blocks=n_blocks,
        )
    except Exception as exc:  # noqa: BLE001 — per-row isolation, never raise
        # Re-detect rather than assume HTML: a PDF that raises mid-parse must
        # be quarantined under its true type or content_type/status rollups skew.
        try:
            failed_ctype = detect_content_type(payload[:4096])
        except Exception:  # noqa: BLE001
            failed_ctype = CONTENT_TYPE_HTML
        return ExtractResult(
            url=url,
            content_type=failed_ctype,
            status=STATUS_FAILED,
            error=str(exc),
        )


def document_envelope(
    result: ExtractResult, source_filename: str, processed_at: str
) -> Dict[str, Any]:
    """The reference's JSON result envelope (ocr_service.py:160-171).

    ``processed_at`` must be supplied by the caller (derive it from
    ``warc_ts``) — wall clock would break determinism.
    """
    return {
        "document": {
            "metadata": {
                "source_filename": source_filename,
                "total_pages": result.n_pages,
                "processed_at": processed_at,
            },
            "content": result.pages,
        }
    }


def envelope_json(envelope: Dict[str, Any]) -> str:
    """Canonical serialization matching ocr_service.py:172-174
    (``ensure_ascii=False, indent=2``)."""
    return json.dumps(envelope, ensure_ascii=False, indent=2)
