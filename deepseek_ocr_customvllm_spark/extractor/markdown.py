"""Markdown assembly folds — the byte-identity core.

Reproduces, byte-for-byte, the reference's three output folds:

- raw markdown:   per-page text joined with ``\\n\\n<--- Page Split --->\\n\\n``
  (``app/services/ocr_service.py:123-125``)
- clean markdown: the per-page clean in ``process_ocr_output``
  (``app/utils/postprocess_md.py:229-300``) accumulated per 40-page chunk
  with a trailing ``"\\n"`` per chunk (``ocr_service.py:99-131``,
  ``CHUNK_SIZE=40`` at ``app/config.py:60``)
- batch-CLI clean: the ``Scripts/run_batch.py:133-143`` variant
  (``clean_formula`` + all-tag strip + ``<center>`` removal)

Two reference quirks are preserved deliberately (do NOT "fix"):

1. ``\\eqqcolon`` becomes ``=:`` in the document-level P1 clean
   (postprocess_md.py:48) but ``=: `` — trailing space — in the per-page
   clean (postprocess_md.py:281).
2. With ``SKIP_REPEAT`` (app/config.py:20, default True) blank pages are
   dropped from clean markdown but still occupy a page slot in the raw
   fold and the block tree.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from .tags import EOS_TOKEN, find_tags

# Reference app/config.py:60 — pages per inner batch; the clean fold gets
# one extra "\n" per chunk, so the constant is load-bearing for byte-identity.
CHUNK_SIZE = 40
# Reference app/config.py:20.
SKIP_REPEAT = True

PAGE_SPLIT = "\n\n<--- Page Split --->\n\n"
PAGE_MARKER = "\n\n\n\n"

_HEADING_RE = re.compile(r"^(#+)\s+", re.MULTILINE)
_BLANK_SQUEEZE_RE = re.compile(r"\n{3,}")
_FORMULA_RE = re.compile(r"\\\[(.*?)\\\]")
_QUAD_PAREN_RE = re.compile(r"\\quad\s*\([^)]*\)")


def assemble_raw(pages: List[str]) -> str:
    """Raw-markdown fold (ocr_service.py:123-125): every page — including
    blank ones — contributes ``page + PAGE_SPLIT``."""
    out = []
    for page in pages:
        out.append(page)
        out.append(PAGE_SPLIT)
    return "".join(out)


def clean_page(
    content: str, page_idx: int, skip_repeat: bool = SKIP_REPEAT
) -> Tuple[Optional[str], int]:
    """Per-page clean — the loop body of ``process_ocr_output``
    (postprocess_md.py:240-288).

    Returns ``(cleaned_text, last_heading_level)``; ``cleaned_text`` is
    ``None`` when the page is skipped (blank + SKIP_REPEAT).
    ``last_heading_level`` is the level of the final markdown heading on
    the page (0 if none) — the reference tracks it as cross-page context
    (postprocess_md.py:267-269); we surface it as metadata.
    """
    content = content.replace(EOS_TOKEN, "").strip()
    if skip_repeat and not content:
        return None, 0

    _, image_tags, other_tags = find_tags(content)

    heading_level = 0
    if "#" in content:  # cheap guard: ^(#+)\s+ needs a '#' somewhere
        found = _HEADING_RE.findall(content)
        if found:
            heading_level = len(found[-1])

    for img_idx, tag in enumerate(image_tags):
        content = content.replace(tag, f"![](images/{page_idx}_{img_idx}.jpg)\n")
    for tag in other_tags:
        content = content.replace(tag, "")

    # NB: trailing space after "=:" — differs from the P1 variant on purpose
    # (postprocess_md.py:281 vs :48).
    content = content.replace("\\coloneqq", ":=").replace("\\eqqcolon", "=: ")
    content = _BLANK_SQUEEZE_RE.sub("\n\n", content)
    return content, heading_level


def assemble_clean(
    pages: List[str],
    chunk_size: int = CHUNK_SIZE,
    skip_repeat: bool = SKIP_REPEAT,
) -> str:
    """Clean-markdown fold across the whole document.

    Chunked exactly like the reference worker (ocr_service.py:99-131):
    pages are processed in ``chunk_size`` batches; within a chunk each
    surviving page contributes ``clean + "\\n\\n\\n\\n"``; each chunk's
    result gets one extra ``"\\n"`` appended.  Page indices (used in the
    image link names) are chunk-local, matching ``enumerate`` inside
    ``process_ocr_output`` being called per chunk.
    """
    parts: List[str] = []
    for start in range(0, len(pages), chunk_size):
        chunk = pages[start : start + chunk_size]
        for idx, page in enumerate(chunk):
            cleaned, _ = clean_page(page, idx, skip_repeat=skip_repeat)
            if cleaned is None:
                continue
            parts.append(cleaned)
            parts.append(PAGE_MARKER)
        parts.append("\n")
    return "".join(parts)


def clean_formula(text: str) -> str:
    """Batch-CLI formula normalizer (Scripts/run_batch.py:53-68): inside
    every ``\\[...\\]`` span, drop ``\\quad (…)`` annotations and strip."""

    def _one(match: "re.Match[str]") -> str:
        formula = _QUAD_PAREN_RE.sub("", match.group(1)).strip()
        return r"\[" + formula + r"\]"

    return _FORMULA_RE.sub(_one, text)


def clean_batch_cli(text: str) -> str:
    """The batch CLI's per-image clean (Scripts/run_batch.py:133-143):
    ``clean_formula`` then, per removed tag, the chained replaces — note
    the blank-squeeze and ``<center>`` strip run once per tag occurrence,
    exactly as the reference chains them inside the loop."""
    text = clean_formula(text)
    matches, _, _ = find_tags(text)
    for m in matches:
        text = (
            text.replace(m[0], "")
            .replace("\n\n\n\n", "\n\n")
            .replace("\n\n\n", "\n\n")
            .replace("<center>", "")
            .replace("</center>", "")
        )
    return text
