"""HTML main-content extraction (boilerplate stripping) — from scratch.

Replaces the reference's GPU OCR model (``app/core/ocr_engine.py``) for
the HTML branch with a deterministic DOM-walk extractor producing the
same *kind* of tagged markdown the model emits, which the shared
post-processing folds (:mod:`.markdown`, :mod:`.blocks`) then consume.

Heuristics are the published boilerpipe / Readability family
(Kohlschütter et al., WSDM 2010): structural boilerplate containers are
dropped outright, and remaining text blocks are kept or dropped by
**link density**.  All thresholds are frozen constants — they define the
golden fixtures, so changing them is a breaking change.

Implementation: stdlib ``html.parser.HTMLParser`` (tolerant of tag soup;
no third-party HTML library is available in the runtime).  Grounding
tags like ``<|ref|>…<|/ref|>`` pass through the parser as character data
because ``<|`` is not a valid markup start, so tagged passages embedded
in page text survive verbatim for the span pipeline.

Emission rules (one markdown "page" per HTML document):

- ``h1..h6``      -> ``#`` * level + `` `` + text
- ``p/li/...``    -> whitespace-normalized paragraph line
- ``<table>``     -> reconstructed single-line
  ``<table><tr><td>…</td></tr></table>`` so the block state machine's
  HTML-table path (postprocess_json.py:231) triggers; ``<th>`` cells are
  emitted as ``<td>`` (the reference's table regex drops ``<th>``)
- ``<pre>``       -> verbatim lines (lets markdown pipe-tables through)
- ``<img>``       -> a full-page image grounding tag, so HTML images flow
  through the same image-placeholder path OCR images do
- blocks are joined with blank lines
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional

# ---- frozen heuristics (define golden-fixture bytes; do not tune) ----
# A block survives iff 3 * link_chars <= chars (link density <= 1/3).
LINK_DENSITY_NUM = 3
# Containers whose entire subtree is boilerplate.
BOILERPLATE_TAGS = frozenset(
    {
        "nav",
        "header",
        "footer",
        "aside",
        "script",
        "style",
        "noscript",
        "form",
        "button",
        "select",
        "option",
        "iframe",
        "svg",
        "head",
        "template",
    }
)
# Tags that open/close a text block.
BLOCK_TAGS = frozenset(
    {
        "p",
        "div",
        "section",
        "article",
        "main",
        "blockquote",
        "li",
        "ul",
        "ol",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "pre",
        "table",
        "tr",
        "td",
        "th",
        "body",
        "html",
        "figure",
        "figcaption",
        "dl",
        "dt",
        "dd",
    }
)
_HEADING_LEVELS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

# Synthetic grounding tag emitted for content <img> elements: full page
# box in the 0-999 space (no pixel data exists in the input table).
IMG_GROUNDING_TAG = "<|ref|>image<|/ref|><|det|>[[0, 0, 999, 999]]<|/det|>"

class _Block:
    __slots__ = ("kind", "text", "chars", "link_chars", "heading_level")

    def __init__(self, kind: str, text: str, chars: int, link_chars: int, heading_level: int = 0):
        self.kind = kind
        self.text = text
        self.chars = chars
        self.link_chars = link_chars
        self.heading_level = heading_level


# Every ASCII char for which str.isspace() is true (incl. \x1c-\x1f file/
# group/record/unit separators) so the fast path agrees with the fallback.
_ASCII_WS = " \t\n\r\x0b\f\x1c\x1d\x1e\x1f"


_ASCII_WS_BYTES = _ASCII_WS.encode("ascii")


def _nonspace_len(s: str) -> int:
    if s.isascii():  # C-speed path; identical result for ASCII
        # one encode (latin-1 memcpy fast path) + one translate pass,
        # instead of nine per-char count() scans
        return len(s.encode("ascii").translate(None, _ASCII_WS_BYTES))
    return sum(1 for c in s if not c.isspace())


class _ContentParser(HTMLParser):
    """Single-pass DOM walk collecting candidate text blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[_Block] = []
        self._boiler_depth = 0
        self._a_depth = 0
        self._pre_depth = 0
        self._heading: Optional[str] = None
        # current flowing-text buffer
        self._buf: List[str] = []
        self._buf_link_chars = 0
        # table capture state
        self._table_depth = 0
        self._table_rows: List[List[str]] = []
        self._cell: Optional[List[str]] = None

    # -- buffer management -------------------------------------------------
    def _flush(self) -> None:
        if not self._buf:
            # nothing buffered: an empty join would produce norm == ""
            # and return below anyway — skip the string work (block tags
            # call _flush far more often than text actually flows)
            self._buf_link_chars = 0
            return
        text = "".join(self._buf)
        self._buf = []
        link_chars = self._buf_link_chars
        self._buf_link_chars = 0
        if self._heading is not None:
            kind = "heading"
            level = _HEADING_LEVELS[self._heading]
        else:
            kind = "pre" if self._pre_depth > 0 else "p"
            level = 0
        if kind == "pre":
            lines = [ln.rstrip() for ln in text.split("\n")]
            while lines and not lines[0]:
                lines.pop(0)
            while lines and not lines[-1]:
                lines.pop()
            norm = "\n".join(lines)
        else:
            norm = " ".join(text.split())
        if not norm:
            return
        self.blocks.append(
            _Block(kind, norm, _nonspace_len(norm), link_chars, level)
        )

    # -- tag events --------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in BOILERPLATE_TAGS:
            self._flush()
            self._boiler_depth += 1
            return
        if self._boiler_depth > 0:
            return
        if tag == "a":
            self._a_depth += 1
            return
        if tag == "img":
            if self._table_depth == 0:
                self._flush()
                self.blocks.append(_Block("img", IMG_GROUNDING_TAG, 1, 0))
            return
        if tag == "br":
            if self._cell is not None:
                self._cell.append(" ")
            else:
                self._buf.append("\n" if self._pre_depth > 0 else " ")
            return
        if tag == "table":
            if self._table_depth == 0:
                self._flush()
                self._table_rows = []
                self._cell = None
            self._table_depth += 1
            return
        if self._table_depth > 0:
            if tag == "tr" and self._table_depth == 1:
                self._table_rows.append([])
                self._cell = None
            elif tag in ("td", "th") and self._table_depth == 1:
                if not self._table_rows:
                    self._table_rows.append([])
                self._cell = []
                self._table_rows[-1].append(self._cell)  # type: ignore[arg-type]
            return
        if tag in _HEADING_LEVELS:
            self._flush()
            self._heading = tag
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag == "pre":
                self._pre_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in BOILERPLATE_TAGS:
            if self._boiler_depth > 0:
                self._boiler_depth -= 1
            return
        if self._boiler_depth > 0:
            return
        if tag == "a":
            if self._a_depth > 0:
                self._a_depth -= 1
            return
        if tag == "table":
            if self._table_depth > 0:
                self._table_depth -= 1
                if self._table_depth == 0:
                    self._emit_table()
            return
        if self._table_depth > 0:
            if tag in ("td", "th") and self._table_depth == 1:
                self._cell = None
            return
        if tag in _HEADING_LEVELS:
            self._flush()
            self._heading = None
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag == "pre" and self._pre_depth > 0:
                self._pre_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._boiler_depth > 0:
            return
        if self._cell is not None:
            self._cell.append(data)
            return
        if self._table_depth > 0:
            return  # inter-cell whitespace / junk inside a table
        self._buf.append(data)
        if self._a_depth > 0:
            self._buf_link_chars += _nonspace_len(data)

    def close(self) -> None:  # flush trailing text at EOF
        super().close()
        self._flush()

    # -- table reconstruction ---------------------------------------------
    def _emit_table(self) -> None:
        rows = []
        for row in self._table_rows:
            cells = []
            for cell in row:
                cell_text = " ".join("".join(cell).split())
                cells.append(f"<td>{cell_text}</td>")
            if cells:
                rows.append("<tr>" + "".join(cells) + "</tr>")
        if not rows:
            return
        html_line = "<table>" + "".join(rows) + "</table>"
        self.blocks.append(_Block("table", html_line, _nonspace_len(html_line), 0))


# ---------------------------------------------------------------------------
# fast tokenizer for "simple" documents
# ---------------------------------------------------------------------------
#
# The stdlib HTMLParser.feed loop is the extractor's largest remaining cost
# (~35% of per-doc time) while _ContentParser consumes only three event
# kinds (starttag name, endtag name, data — attrs and charrefs unused).
# For documents built ONLY from unambiguous constructs, a single-regex
# tokenizer reproduces the stdlib event stream EXACTLY; anything outside
# that grammar — entities (&), comments/declarations (<!), processing
# instructions (<?), script/style CDATA modes, malformed or exotic tags,
# attrs on end tags, dangling '<' — falls back to the stdlib parser BEFORE
# any event is dispatched (validation completes first), so outputs are
# byte-identical by construction.  Equivalence is additionally fuzzed in
# tests/test_realistic_html.py against forced-stdlib parses.

_RISKY_RE = re.compile(r"&|<!|<\?|<script|<style", re.IGNORECASE)
# '<' followed by a letter (starttag) or '/' (endtag) opens a tag candidate;
# any other '<' is literal data per the stdlib parser (the corpus embeds
# grounding pseudo-tags like '<|ref|>' in text, which MUST stay data).
_TOKEN_RE = re.compile(r"<[a-zA-Z/][^>]*>|[^<]+|<")
_SIMPLE_TAG_RE = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[^\s<>\"'=]+(?:=(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s<>\"'`=]+))?)*)"
    r"\s*(/?)>"
)

_EV_DATA, _EV_START, _EV_END, _EV_STARTEND = 0, 1, 2, 3

# Memoized tag-token -> event (False = token needs the stdlib fallback).
# Real documents repeat a tiny tag vocabulary ('<p>', '</td>', ...)
# endlessly, so the per-token classification (isascii/isalnum/lower or
# the _SIMPLE_TAG_RE match) runs once per distinct token instead of per
# occurrence.  Pure function of the token, so the cache is correct in a
# reused Python worker; size-capped against adversarial tag storms.
_TAG_EVENT_CACHE: dict = {}
_TAG_EVENT_CACHE_MAX = 8192


def _classify_tag(tok: str):
    """Event tuple for one ``<...>`` token, or False for stdlib quirks.

    attr-less shortcut: '<p>' / '</div>' style tags are the vast
    majority; ASCII-alnum names match _SIMPLE_TAG_RE exactly (leading
    letter enforced), so the regex is skipped.  The isascii() guard
    keeps unicode-alnum names on the regex path, which rejects them
    just like the stdlib tokenizer."""
    if tok[1] != "/":
        body = tok[1:-1]
        if body.isascii() and body.isalnum() and body[0].isalpha():
            return (_EV_START, body.lower())
    else:
        name = tok[2:-1]
        if name.isascii() and name.isalnum() and name[:1].isalpha():
            return (_EV_END, name.lower())
    t = _SIMPLE_TAG_RE.fullmatch(tok)
    if t is None:
        return False
    closing, name, attrs, selfclose = t.groups()
    if closing and (selfclose or attrs.strip()):
        return False  # '</x/>' / '</x a=b>' -> stdlib quirk paths
    if closing:
        return (_EV_END, name.lower())
    if selfclose:
        return (_EV_STARTEND, name.lower())
    return (_EV_START, name.lower())


def _fast_events(html_text: str):
    """Token events mirroring HTMLParser, or None when the document needs
    the stdlib parser (never dispatches anything on failure)."""
    if _RISKY_RE.search(html_text):
        return None
    # findall, not finditer: _TOKEN_RE's alternation TILES any string —
    # at a non-'<' position the [^<]+ branch matches, at a '<' either
    # the tag branch or the lone-'<' branch does — so consecutive
    # matches are provably gap-free and the per-match start/end
    # bookkeeping (a Match object per token) is pure overhead.  A
    # dangling '<abc' at EOF tokenizes as '<' + 'abc', two DATA events
    # whose concatenation handle_data sees identically to the stdlib
    # parser's single flushed-'<abc' data call (byte-equality fuzzed in
    # tests/test_realistic_html.py).
    events = []
    append = events.append
    cache = _TAG_EVENT_CACHE
    for tok in _TOKEN_RE.findall(html_text):
        if tok[0] == "<" and len(tok) > 1:
            ev = cache.get(tok)
            if ev is None:
                ev = _classify_tag(tok)
                if len(cache) < _TAG_EVENT_CACHE_MAX:
                    cache[tok] = ev
            if ev is False:
                return None
            append(ev)
        else:
            append((_EV_DATA, tok))
    return events


def extract_html_page(html_text: str) -> str:
    """HTML document -> one page of tagged markdown text.

    Boilerplate containers and high-link-density blocks are removed; the
    surviving blocks are rendered in document order, separated by blank
    lines.  Pure function of the input string.
    """
    parser = _ContentParser()
    events = _fast_events(html_text)
    if events is None:
        parser.feed(html_text)
        parser.close()
    else:
        handle_start = parser.handle_starttag
        handle_end = parser.handle_endtag
        handle_data = parser.handle_data
        for kind, val in events:
            if kind == _EV_DATA:
                handle_data(val)
            elif kind == _EV_START:
                handle_start(val, [])
            elif kind == _EV_END:
                handle_end(val)
            else:  # <x/> : stdlib default handle_startendtag = start + end
                handle_start(val, [])
                handle_end(val)
        parser._flush()  # the close() tail without the stdlib goahead

    out: List[str] = []
    for b in parser.blocks:
        if b.kind == "table" or b.kind == "img":
            out.append(b.text)
            continue
        if b.chars == 0:
            continue
        if LINK_DENSITY_NUM * b.link_chars > b.chars:
            continue  # link-dense -> boilerplate (menus, footers)
        if b.kind == "heading":
            out.append("#" * b.heading_level + " " + b.text)
        else:
            out.append(b.text)
    return "\n\n".join(out)
