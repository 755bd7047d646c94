"""Deterministic PDF text-layer extraction — from scratch, stdlib only.

Replaces the reference's rasterize-then-OCR path
(``app/utils/utils.py:70-102`` renders pages at 144 DPI; the GPU model
reads them) with pdfminer-style **ordered text-box assembly** over the
PDF's text layer: tokenize content streams, interpret the text-positioning
operators (``BT/ET, Td, TD, Tm, T*, TL, Tj, TJ, ', "``), collect
positioned text boxes, drop page-furniture boxes in the outer margin,
sort into reading order (top-to-bottom, left-to-right) and assemble
lines/paragraphs.

The margin filter mirrors the reference's fixed 60 px crop at 144 DPI
(``process/image_process.py:21-61``): 60 px / 144 DPI = 30 pt at PDF
user-space resolution — boxes whose origin falls within 30 pt of the
page edge are page furniture (running headers, page numbers) and are
dropped.

Scope (documented limitations, deterministic by construction):
- content streams are taken in byte order; each stream containing text
  operators is one page (matches any writer that emits one content
  stream per page, including our synthetic corpus)
- ``/FlateDecode`` streams are inflated with zlib; other filters are
  skipped
- string bytes are decoded as UTF-8 with latin-1 fallback (no font
  ToUnicode CMaps)
- glyph widths are not modelled: boxes on the same baseline are joined
  with single spaces in x-order
"""

from __future__ import annotations

import re
import zlib
from typing import List, Optional, Tuple

# 60 px at 144 DPI == 30 pt in PDF user space (image_process.py:34-37).
MARGIN_PT = 30.0
# Baseline grouping tolerance and paragraph-gap threshold (frozen).
LINE_TOL_PT = 2.0
PARA_GAP_PT = 20.0
DEFAULT_MEDIABOX = (0.0, 0.0, 612.0, 792.0)

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_FLATE_RE = re.compile(rb"/FlateDecode")
_NUM_RE = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")


class TextBox:
    __slots__ = ("x", "y", "seq", "text")

    def __init__(self, x: float, y: float, seq: int, text: str):
        self.x = x
        self.y = y
        self.seq = seq
        self.text = text


def _decode_pdf_string(raw: bytes) -> str:
    """Literal-string unescape per PDF spec §7.3.4.2."""
    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = raw[i + 1]
            mapping = {
                ord("n"): b"\n",
                ord("r"): b"\r",
                ord("t"): b"\t",
                ord("b"): b"\b",
                ord("f"): b"\f",
                ord("("): b"(",
                ord(")"): b")",
                ord("\\"): b"\\",
            }
            if nxt in mapping:
                out += mapping[nxt]
                i += 2
                continue
            if nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < n and raw[i] == 0x0A:
                    i += 1
                continue
            if 0x30 <= nxt <= 0x37:  # octal escape, up to 3 digits
                j = i + 1
                oct_digits = b""
                while j < n and len(oct_digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    oct_digits += bytes([raw[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            out.append(nxt)
            i += 2
            continue
        out.append(c)
        i += 1
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return out.decode("latin-1")


def _tokenize(data: bytes):
    """Yield ('str', text) | ('num', float) | ('op', name) | ('arr', list)."""
    i = 0
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c.isspace():
            i += 1
            continue
        if c == b"(":
            depth = 1
            j = i + 1
            buf = bytearray()
            while j < n and depth > 0:
                ch = data[j]
                if ch == 0x5C and j + 1 < n:
                    buf += data[j : j + 2]
                    j += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth == 0:
                        j += 1
                        break
                buf.append(ch)
                j += 1
            yield ("str", _decode_pdf_string(bytes(buf)))
            i = j
            continue
        if c == b"<" and data[i : i + 2] != b"<<":
            j = data.find(b">", i)
            if j == -1:
                break
            hexs = re.sub(rb"\s", b"", data[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            try:
                raw = bytes.fromhex(hexs.decode("ascii"))
                yield ("str", raw.decode("utf-8", errors="replace"))
            except ValueError:
                pass
            i = j + 1
            continue
        if c == b"<":  # dict <<
            i += 2
            continue
        if c == b">":
            i += 1
            continue
        if c == b"[":
            # collect until matching ]; only strings matter (TJ arrays)
            j = i + 1
            elems: List[Tuple[str, object]] = []
            while j < n and data[j : j + 1] != b"]":
                sub = data[j : j + 1]
                if sub.isspace():
                    j += 1
                    continue
                if sub == b"(":
                    depth = 1
                    k = j + 1
                    buf = bytearray()
                    while k < n and depth > 0:
                        ch = data[k]
                        if ch == 0x5C and k + 1 < n:
                            buf += data[k : k + 2]
                            k += 2
                            continue
                        if ch == 0x28:
                            depth += 1
                        elif ch == 0x29:
                            depth -= 1
                            if depth == 0:
                                k += 1
                                break
                        buf.append(ch)
                        k += 1
                    elems.append(("str", _decode_pdf_string(bytes(buf))))
                    j = k
                    continue
                m = _NUM_RE.match(data, j)
                if m:
                    elems.append(("num", float(m.group())))
                    j = m.end()
                    continue
                j += 1
            yield ("arr", elems)
            i = j + 1
            continue
        if c == b"/":
            m = re.match(rb"/[^\s\[\]<>()/]*", data[i:])
            i += m.end() if m else 1
            continue
        m = _NUM_RE.match(data, i)
        if m:
            yield ("num", float(m.group()))
            i = m.end()
            continue
        m = re.match(rb"[A-Za-z'\"*]+", data[i:])
        if m:
            yield ("op", m.group().decode("latin-1"))
            i += m.end()
            continue
        i += 1


def _interpret_stream(data: bytes) -> List[TextBox]:
    """Run the text operators of one content stream, collecting boxes."""
    boxes: List[TextBox] = []
    stack: List[object] = []  # operand stack (numbers / strings / arrays)
    lx = ly = 0.0  # line start
    cx = cy = 0.0  # current position
    leading = 0.0
    seq = 0
    in_text = False

    def emit(text: str) -> None:
        nonlocal seq
        if text:
            boxes.append(TextBox(cx, cy, seq, text))
            seq += 1

    for kind, val in _tokenize(data):
        if kind in ("num", "str", "arr"):
            stack.append((kind, val))
            continue
        op = val
        try:
            if op == "BT":
                in_text = True
                lx = ly = cx = cy = 0.0
            elif op == "ET":
                in_text = False
            elif op == "Td" and len(stack) >= 2:
                ty = stack[-1][1]
                tx = stack[-2][1]
                lx += float(tx)  # type: ignore[arg-type]
                ly += float(ty)  # type: ignore[arg-type]
                cx, cy = lx, ly
            elif op == "TD" and len(stack) >= 2:
                ty = float(stack[-1][1])  # type: ignore[arg-type]
                tx = float(stack[-2][1])  # type: ignore[arg-type]
                leading = -ty
                lx += tx
                ly += ty
                cx, cy = lx, ly
            elif op == "Tm" and len(stack) >= 6:
                f = float(stack[-1][1])  # type: ignore[arg-type]
                e = float(stack[-2][1])  # type: ignore[arg-type]
                lx, ly = e, f
                cx, cy = e, f
            elif op == "TL" and len(stack) >= 1:
                leading = float(stack[-1][1])  # type: ignore[arg-type]
            elif op == "T*":
                ly -= leading
                cx, cy = lx, ly
            elif op == "Tj" and stack and in_text:
                k, s = stack[-1]
                if k == "str":
                    emit(s)  # type: ignore[arg-type]
            elif op == "TJ" and stack and in_text:
                k, arr = stack[-1]
                if k == "arr":
                    emit("".join(v for ek, v in arr if ek == "str"))  # type: ignore[union-attr]
            elif op == "'" and stack and in_text:
                ly -= leading
                cx, cy = lx, ly
                k, s = stack[-1]
                if k == "str":
                    emit(s)  # type: ignore[arg-type]
            elif op == '"' and stack and in_text:
                ly -= leading
                cx, cy = lx, ly
                k, s = stack[-1]
                if k == "str":
                    emit(s)  # type: ignore[arg-type]
        finally:
            stack.clear()
    return boxes


def _assemble_page(
    boxes: List[TextBox], mediabox: Tuple[float, float, float, float]
) -> str:
    """Margin-filter, reading-order sort, line/paragraph assembly."""
    x0, y0, x1, y1 = mediabox
    kept = [
        b
        for b in boxes
        if (x0 + MARGIN_PT) <= b.x <= (x1 - MARGIN_PT)
        and (y0 + MARGIN_PT) <= b.y <= (y1 - MARGIN_PT)
    ]
    if not kept:
        return ""
    kept.sort(key=lambda b: (-b.y, b.x, b.seq))

    # group into baselines
    lines: List[Tuple[float, List[TextBox]]] = []
    for b in kept:
        if lines and abs(lines[-1][0] - b.y) <= LINE_TOL_PT:
            lines[-1][1].append(b)
        else:
            lines.append((b.y, [b]))

    parts: List[str] = []
    prev_y: Optional[float] = None
    for y, line_boxes in lines:
        line_boxes.sort(key=lambda b: (b.x, b.seq))
        text = " ".join(b.text for b in line_boxes)
        if prev_y is not None and (prev_y - y) > PARA_GAP_PT:
            parts.append("")  # paragraph break
        parts.append(text)
        prev_y = y
    return "\n".join(parts)


def extract_pdf_pages(pdf_bytes: bytes) -> List[str]:
    """PDF bytes -> list of per-page tagged-markdown text.

    Pure function; malformed inputs produce as many pages as have
    parseable text streams (possibly zero) rather than raising.
    """
    m = _MEDIABOX_RE.search(pdf_bytes)
    if m:
        mediabox = tuple(float(v) for v in m.groups())  # type: ignore[assignment]
    else:
        mediabox = DEFAULT_MEDIABOX

    pages: List[str] = []
    for sm in _STREAM_RE.finditer(pdf_bytes):
        payload = sm.group(1)
        # the stream dict sits just before the `stream` keyword
        head_start = max(0, sm.start() - 400)
        header = pdf_bytes[head_start : sm.start()]
        if _FLATE_RE.search(header):
            try:
                payload = zlib.decompress(payload)
            except zlib.error:
                continue
        if b"BT" not in payload:
            continue
        boxes = _interpret_stream(payload)
        if not boxes:
            continue
        pages.append(_assemble_page(boxes, mediabox))  # type: ignore[arg-type]
    return pages
