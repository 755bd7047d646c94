"""Deterministic synthetic Common-Crawl-style ``pages`` corpus.

Implements FIXTURES.md §1: each row is a pure function of its index
``i`` (seeded per-document — NOT per-process — so any subset, ordering,
or partitioning of the corpus yields identical rows).  The corpus
exercises every fixture family the extractor must handle:

- nav/header/footer boilerplate with high link density (must be stripped)
- main ``<article>`` with headings, paragraphs, low-density inline links
- HTML tables incl. the "financial" variant whose declared total is
  (a) consistent or (b) off by >2 (-> Low Confidence validation,
  reference ``app/utils/utils.py:185-218``)
- markdown pipe-table blocks inside ``<pre>``
- grounding-tag passages (image + non-image labels, inverted corners,
  degenerate <2px boxes — reference ``app/utils/postprocess_md.py:54-118``)
- ``d/m/yyyy`` dates and letter-digit adjacency (``utils.py:164-183``)
- latex ``\\coloneqq`` / ``\\eqqcolon`` tokens (both cleaning variants)
- repeated nav n-grams (>=20-token repeats within a 50-token window)
- blank documents (SKIP_REPEAT path) and oversize documents
- multi-page PDF documents with margin page-furniture

Input-table shape is fixed by ``BASELINE.json`` ``input_hint``:
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``.
"""

from __future__ import annotations

import datetime as _dt
import random
import zlib
from typing import Dict, List, Optional

SEED = 42
N_DOMAINS = 200
ZIPF_S = 1.3
# Synthetic-corpus oversize cap (the reference's 200 MB upload cap scaled
# down so tests stay fast; the extractor's cap is a parameter).
SYNTH_MAX_BYTES = 64 * 1024

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_EPOCH = _dt.datetime(2025, 1, 1, 0, 0, 0)

_WORDS = (
    "data spark engine corpus markdown extract table page block heading "
    "paragraph document crawl web index token stream batch shuffle "
    "partition schema column filter join window query plan vector arrow "
    "pandas cluster executor driver salt hash merge state resume lineage"
).split()

_NAV_ITEMS = [
    "Home", "About", "Products", "Services", "Contact", "Blog", "Careers",
    "Support", "Login", "Register", "Privacy", "Terms", "Sitemap", "Press",
]

_LANGS = ["vi", "en", "und"]

# Cumulative Zipf weights for the domain distribution (seed-free: the
# distribution itself is a constant; per-doc sampling uses the doc rng).
_ZIPF_W = [1.0 / (k ** ZIPF_S) for k in range(1, N_DOMAINS + 1)]
_ZIPF_TOTAL = sum(_ZIPF_W)
_ZIPF_CUM = []
_acc = 0.0
for _w in _ZIPF_W:
    _acc += _w
    _ZIPF_CUM.append(_acc / _ZIPF_TOTAL)


def _zipf_domain(rng: random.Random) -> int:
    u = rng.random()
    lo, hi = 0, N_DOMAINS - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if _ZIPF_CUM[mid] < u:
            lo = mid + 1
        else:
            hi = mid
    return lo


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _sentence(rng: random.Random) -> str:
    s = _words(rng, rng.randint(6, 18))
    return s[0].upper() + s[1:] + "."


def _nav_block(rng: random.Random) -> str:
    items = "".join(
        f'<li><a href="/{x.lower()}">{x}</a></li>' for x in _NAV_ITEMS
    )
    return f"<nav><ul>{items}</ul></nav>"


def _footer_block(rng: random.Random) -> str:
    links = " ".join(
        f'<a href="/f{k}">{rng.choice(_NAV_ITEMS)}</a>' for k in range(8)
    )
    return f"<footer><div>{links}</div><div>© 2025 example</div></footer>"


def _linkfarm_div(rng: random.Random) -> str:
    """High-link-density div OUTSIDE semantic boilerplate tags — must be
    dropped by the link-density rule alone."""
    links = " ".join(
        f'<a href="/t{k}">{rng.choice(_WORDS)}</a>' for k in range(12)
    )
    return f"<div>{links}</div>"


def _financial_table(rng: random.Random, consistent: bool) -> str:
    n = rng.randint(3, 5)
    vals = [rng.randint(100, 9999) for _ in range(n)]
    total = sum(vals) if consistent else sum(vals) + rng.randint(5, 500)
    rows = "".join(
        f"<tr><td>item {k}</td><td>{v}</td></tr>" for k, v in enumerate(vals)
    )
    kw = rng.choice(["total", "tổng cộng", "cộng"])
    rows += f"<tr><td>{kw}</td><td>{total}</td></tr>"
    return f"<table>{rows}</table>"


def _plain_table(rng: random.Random) -> str:
    rows = "".join(
        "<tr>" + "".join(f"<td>{rng.choice(_WORDS)}</td>" for _ in range(3)) + "</tr>"
        for _ in range(rng.randint(2, 4))
    )
    return f"<table>{rows}</table>"


def _pipe_table(rng: random.Random) -> str:
    header = "|col a|col b|col c|"
    sep = "|---|---|---|"
    rows = "\n".join(
        f"|{rng.choice(_WORDS)}|{rng.randint(1, 99)}|{rng.choice(_WORDS)}|"
        for _ in range(rng.randint(2, 4))
    )
    return f"<pre>{header}\n{sep}\n{rows}</pre>"


def _grounding_passage(rng: random.Random) -> str:
    kind = rng.randint(0, 4)
    if kind == 0:  # image tag, normal box
        x1, y1 = rng.randint(0, 500), rng.randint(0, 500)
        x2, y2 = x1 + rng.randint(50, 400), y1 + rng.randint(50, 400)
        tag = f"<|ref|>image<|/ref|><|det|>[[{x1}, {y1}, {min(x2,999)}, {min(y2,999)}]]<|/det|>"
    elif kind == 4:  # image tag standing alone (-> image block in the tree)
        x1, y1 = rng.randint(0, 400), rng.randint(0, 400)
        return (
            f"<|ref|>image<|/ref|><|det|>[[{x1}, {y1}, "
            f"{min(x1 + 300, 999)}, {min(y1 + 200, 999)}]]<|/det|>"
        )
    elif kind == 1:  # non-image label
        x1, y1 = rng.randint(0, 800), rng.randint(0, 800)
        tag = f"<|ref|>title<|/ref|><|det|>[[{x1}, {y1}, {min(x1+100,999)}, {min(y1+30,999)}]]<|/det|>"
    elif kind == 2:  # inverted corners
        tag = "<|ref|>image<|/ref|><|det|>[[700, 650, 100, 50]]<|/det|>"
    else:  # degenerate (<2 px) box
        tag = "<|ref|>image<|/ref|><|det|>[[10, 10, 11, 11]]<|/det|>"
    return f"{_sentence(rng)} {tag} {_sentence(rng)}"


def _heuristic_paragraph(rng: random.Random) -> str:
    if rng.random() < 0.5:
        d = f"{rng.randint(1,28)}/{rng.randint(1,12)}/{rng.randint(2000,2025)}"
        return f"Signed on {d} by the board"
    return f"ref{rng.randint(1,999)} invoice {rng.choice(_WORDS)}{rng.randint(10,99)}"


def _latex_paragraph(rng: random.Random) -> str:
    return (
        f"Define x \\coloneqq {rng.randint(1, 9)} and "
        f"y \\eqqcolon {rng.randint(1, 9)} in the model."
    )


def _repeat_menu(rng: random.Random) -> str:
    """A >=20-token run duplicated within a 50-token window, outside any
    boilerplate container, to exercise the n-gram suppressor."""
    run = _words(rng, 22)
    return f"<div><p>{run}</p><p>{run}</p></div>"


def _html_doc(rng: random.Random, i: int, scale: int = 1) -> bytes:
    """``scale`` multiplies body size (for benchmarking with
    realistically sized pages).  ``scale=1`` consumes the rng stream
    exactly as the committed golden fixtures expect — do not reorder."""
    parts: List[str] = ["<html><head><title>synthetic page</title></head><body>"]
    parts.append(_nav_block(rng))
    parts.append("<header><h1><a href='/'>Example Site</a></h1></header>")
    parts.append("<article>")
    parts.append(f"<h1>Document {i}</h1>")
    n_sections = rng.randint(1, 4) * scale
    for s in range(n_sections):
        parts.append(f"<h{min(s + 2, 4)}>Section {_words(rng, 2)}</h{min(s + 2, 4)}>")
        for _ in range(rng.randint(1, 4)):
            para = _sentence(rng) + " " + _sentence(rng)
            if rng.random() < 0.15:
                para += f' See <a href="/ref">{rng.choice(_WORDS)}</a> for details.'
            parts.append(f"<p>{para}</p>")
        roll = rng.random()
        if roll < 0.18:
            parts.append(_financial_table(rng, consistent=rng.random() < 0.6))
        elif roll < 0.30:
            parts.append(_plain_table(rng))
        elif roll < 0.40:
            parts.append(_pipe_table(rng))
        if rng.random() < 0.30:
            parts.append(f"<p>{_grounding_passage(rng)}</p>")
        if rng.random() < 0.25:
            parts.append(f"<p>{_heuristic_paragraph(rng)}</p>")
        if rng.random() < 0.20:
            parts.append(f"<p>{_latex_paragraph(rng)}</p>")
    if rng.random() < 0.20:
        parts.append(_repeat_menu(rng))
    parts.append("</article>")
    parts.append(_linkfarm_div(rng))
    parts.append(_footer_block(rng))
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


# ---------------------------------------------------------------------------
# Minimal PDF writer (for the synthetic corpus only)
# ---------------------------------------------------------------------------

def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _pdf_page_stream(lines: List[str], furniture: Optional[str]) -> bytes:
    """One page's content stream: body text top-down from y=720 within the
    safe area; page furniture at y=20 (inside the 30 pt margin, so the
    extractor's margin filter must drop it)."""
    ops: List[str] = ["BT", "/F1 12 Tf", "1 0 0 1 72 720 Tm", "14 TL"]
    y = 720.0
    for ln in lines:
        if ln == "":
            ops.append("0 -28 Td")  # paragraph gap > PARA_GAP_PT
            y -= 28
        else:
            ops.append(f"({_pdf_escape(ln)}) Tj")
            ops.append("T*")
            y -= 14
    ops.append("ET")
    if furniture:
        ops += ["BT", "/F1 9 Tf", "1 0 0 1 300 20 Tm", f"({_pdf_escape(furniture)}) Tj", "ET"]
    return "\n".join(ops).encode("utf-8")


def synth_pages_pdf(page_texts: List[List[str]], compress: bool = False) -> bytes:
    """Assemble a minimal but well-formed PDF with one content stream per
    page.  ``page_texts`` is a list of pages, each a list of lines (empty
    line = paragraph break)."""
    objects: List[bytes] = []
    n_pages = len(page_texts)
    # obj 1: catalog, obj 2: pages, obj 3..: page objs, then streams, then font
    kids = " ".join(f"{3 + k} 0 R" for k in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} /MediaBox [0 0 612 792] >>".encode()
    )
    stream_obj_base = 3 + n_pages
    font_obj = stream_obj_base + n_pages
    for k in range(n_pages):
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /Contents {stream_obj_base + k} 0 R "
            f"/Resources << /Font << /F1 {font_obj} 0 R >> >> >>".encode()
        )
    for k, page in enumerate(page_texts):
        payload = _pdf_page_stream(page, furniture=f"Page {k + 1}")
        filt = b""
        if compress:
            payload = zlib.compress(payload)
            filt = b" /Filter /FlateDecode"
        objects.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(payload), filt, payload)
        )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for idx, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % idx + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_pos)
    )
    return bytes(out)


def _pdf_doc(rng: random.Random, i: int, scale: int = 1) -> bytes:
    n_pages = rng.randint(1, 3) * scale
    pages: List[List[str]] = []
    for p in range(n_pages):
        lines: List[str] = [f"# Report {i} page {p + 1}", ""]
        for _ in range(rng.randint(2, 4)):
            lines.append(_sentence(rng))
            lines.append(_sentence(rng))
            lines.append("")
        if rng.random() < 0.4:
            lines += ["|metric|value|", "|---|---|", f"|docs|{rng.randint(1, 999)}|", ""]
        if rng.random() < 0.3:
            lines.append(_heuristic_paragraph(rng))
        pages.append(lines)
    return synth_pages_pdf(pages, compress=rng.random() < 0.5)


# ---------------------------------------------------------------------------
# Row synthesis
# ---------------------------------------------------------------------------

def synth_page(i: int, scale: int = 1) -> Dict[str, object]:
    """Row ``i`` of the synthetic pages corpus — pure function of
    ``(i, scale)``.  ``scale=1`` is the fixture-locked corpus; larger
    scales produce proportionally bigger documents (bench realism)."""
    rng = random.Random(SEED * 1_000_000_007 + i)
    domain = _zipf_domain(rng)
    url = f"https://example-{domain:04d}.test/doc/{i:06d}"
    warc_ts = _EPOCH + _dt.timedelta(seconds=37 * i)
    lang = _LANGS[i % 3]

    roll = rng.random()
    if roll < 0.85:
        html = _html_doc(rng, i, scale)
    elif roll < 0.95:
        html = _pdf_doc(rng, i, scale)
    else:
        edge = rng.randint(0, 3)
        if edge == 0:
            html = b""
        elif edge == 1:
            html = b"   \n\t  "
        elif edge == 2:  # truncated tag soup
            html = (
                b"<html><body><p>truncated " + _words(rng, 8).encode() + b" <div><span"
            )
        else:  # oversize (> SYNTH_MAX_BYTES)
            html = b"<html><body>" + (b"<p>" + b"x" * 100 + b"</p>") * 700

    text = _words(rng, 20) if rng.random() < 0.30 else None
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": text,
        "lang": lang,
    }


def synth_pages_batch(start: int, end: int) -> List[Dict[str, object]]:
    return [synth_page(i) for i in range(start, end)]
