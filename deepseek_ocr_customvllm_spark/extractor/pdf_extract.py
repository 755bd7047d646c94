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

Page traversal (round 2): the document structure is parsed for real —
``N G obj … endobj`` definitions build an object map (last definition
wins, which absorbs incremental updates without trusting the xref
table), the trailer's ``/Root`` leads to the catalog, and pages are
visited in **page-tree order** (``/Pages`` → ``/Kids`` recursion), so a
writer that scatters objects through the file in any byte order still
extracts in logical page order.  ``/MediaBox`` and ``/Resources``
inherit down the tree per spec §7.7.3.4.  Simple-font ``/Encoding``
handling covers the named base encodings (``/WinAnsiEncoding`` — the
cp1252 curly-quote/dash range — and ``/MacRomanEncoding``) overlaid
with ``/Differences`` glyph-name remaps (spec §9.6.5 precedence;
``/ToUnicode`` wins over both).  Files without a parseable catalog fall
back to the original byte-order stream scan.

Round 3: object bodies are sliced by verified stream extents (a Flate
payload containing ``endobj`` or a phantom ``N 0 obj`` can neither
truncate nor shadow objects), ``/Type /ObjStm`` object streams (PDF 1.5
compressed objects) are unpacked, and ``/ToUnicode`` CMaps
(``bfchar``/``bfrange``, 1- and 2-byte code spaces) drive text decoding —
including 2-byte Identity-H codes for composite Type0/CID fonts.  A
referenced content stream that fails to decode triggers the byte-order
fallback instead of silently dropping the page.

Scope (documented limitations, deterministic by construction):
- stream filters: FlateDecode (+ PNG predictors), LZWDecode,
  ASCII85Decode, ASCIIHexDecode, RunLengthDecode, and chains thereof all
  decode for real; image codecs (DCT/JPX/JBIG2/CCITT) and /Crypt return
  None and trigger the byte-order fallback for the page
- Type0/CID fonts without a ``/ToUnicode`` CMap decode to nothing
  (CIDs are glyph ids, not characters); with one, they decode exactly
- Form XObjects execute for real (``Do`` under the tracked CTM with the
  form's ``/Matrix`` and own ``/Resources``, depth-capped recursion);
  image XObjects are ignored by construction (their payloads fail the
  ``/Subtype /Form`` gate)
- glyph advances ARE modelled (``/Widths``, CID ``/W``/``/DW``, default
  em/2, plus the ``Tc``/``Tw``/``Tz`` spacing parameters and the
  ``\"`` operator's spacing operands): successive show ops land at their
  true x positions, and TJ kerning beyond ``TJ_SPACE_UNITS`` decodes as
  an inter-word space; inline images (``BI..ID..EI``) are skipped
  wholesale so raster bytes cannot desync the operand stream
- Type3 fonts scale advances through their ``/FontMatrix`` (§9.6.5;
  decoding goes through ``/Differences`` like any simple font); the
  advance scale is the matrix ``a`` component — full per-glyph matrix
  transforms (rare rotated-glyph fonts) are approximated by ``|b|``
- vertical writing (``WMode 1`` via Identity-V / predefined ``-V``
  CMaps, §9.7.5.2) advances DOWN the line using CID ``/W2``/``/DW2``
  vertical metrics, so columns read top-to-bottom; the position vector
  (v1x, v1y) of /W2 is ignored (origin shift, not line flow), and
  right-to-left COLUMN ordering is out of scope for the line assembler
"""

from __future__ import annotations

import re
import zlib
from typing import Callable, List, Optional, Tuple

from .pdf_crypt import (
    EncryptedPdfError,
    StandardDecryptor,
    authenticate,
    find_encrypt_ref,
    heuristic_trailer_regions,
    is_trailer_dict,
)

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
_NUM_RE = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")


class TextBox:
    __slots__ = ("x", "y", "seq", "text")

    def __init__(self, x: float, y: float, seq: int, text: str):
        self.x = x
        self.y = y
        self.seq = seq
        self.text = text


def _default_decode(raw: bytes) -> str:
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


_ESC_MAP = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\f",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
}


def _unescape_literal(raw: bytes) -> bytes:
    """Literal-string unescape per PDF spec §7.3.4.2 (bytes -> bytes; the
    character decode happens later so font ``/Differences`` maps can act
    on the raw codes)."""
    if 0x5C not in raw and 0x0D not in raw:
        # no backslash, no CR: nothing to rewrite (the common case)
        return raw
    out = bytearray()
    i = 0
    n = len(raw)
    mapping = _ESC_MAP
    while i < n:
        c = raw[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = raw[i + 1]
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
        if c == 0x0D:
            # an un-escaped EOL inside a literal string reads as a single
            # LF byte (spec §7.3.4.2) — CR and CRLF both normalize
            out.append(0x0A)
            i += 1
            if i < n and raw[i] == 0x0A:
                i += 1
            continue
        out.append(c)
        i += 1
    return bytes(out)


def _skip_dict_token(data: bytes, pos: int):
    """End position just past the ``>>`` matching the ``<<`` at ``pos``,
    or None when unterminated.  Depth-counted, and hex/literal strings
    are opaque (a ``>>`` or nested ``<<`` inside a string value is
    data, not a delimiter) — the same contract pdf_crypt's
    _balanced_dict keeps.  Used to swallow malformed dicts inside TJ
    arrays WHOLE so their numeric values never leak as kerns."""
    depth = 0
    i = pos
    n = len(data)
    while i < n:
        pair = data[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return i
        elif data[i : i + 1] == b"<":  # hex string: skip to its '>'
            end = data.find(b">", i + 1)
            if end < 0:
                return None
            i = end + 1
        elif data[i : i + 1] == b"(":  # literal string: balanced + escapes
            pdepth = 1
            i += 1
            while i < n and pdepth:
                c = data[i : i + 1]
                if c == b"\\":
                    i += 2
                    continue
                if c == b"(":
                    pdepth += 1
                elif c == b")":
                    pdepth -= 1
                i += 1
            if pdepth:
                return None
        else:
            i += 1
    return None


def _hex_string_at(data: bytes, pos: int):
    """Parse the hex string whose ``<`` sits at ``pos`` (§7.3.4.3):
    ``(decoded bytes | None, position after the closing '>')``.
    Odd nibble counts pad with 0; whitespace is ignored; non-hex bytes
    yield ``None``; an unterminated string consumes to end-of-data.
    Shared by the top-level tokenizer and the array parser so the two
    can never drift."""
    j = data.find(b">", pos)
    if j == -1:
        return None, len(data)
    hexs = re.sub(rb"\s", b"", data[pos + 1 : j])
    if len(hexs) % 2:
        hexs += b"0"
    try:
        return bytes.fromhex(hexs.decode("ascii")), j + 1
    except ValueError:
        return None, j + 1


# bytes.isspace()'s exact character set, for int-membership tests in the
# per-byte tokenizer loop (a 1-byte slice per character allocates; an
# index yields an int and `int in bytes` is a C memchr)
_PY_WS = b" \t\n\r\x0b\x0c"
_NAME_RE = re.compile(rb"/[^\s\[\]<>()/]*")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _tokenize(data: bytes):
    """Yield ('str', raw_bytes) | ('num', float) | ('name', str) |
    ('op', name) | ('arr', list)."""
    i = 0
    n = len(data)
    while i < n:
        ch0 = data[i]
        if ch0 in _PY_WS:
            i += 1
            continue
        c = data[i : i + 1]
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
            yield ("str", _unescape_literal(bytes(buf)))
            i = j
            continue
        if c == b"<" and data[i : i + 2] != b"<<":
            s, i = _hex_string_at(data, i)
            if s is not None:
                yield ("str", s)
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
            while j < n and data[j] != 0x5D:  # ']'
                sj = data[j]
                if sj in _PY_WS:
                    j += 1
                    continue
                if sj == 0x28:  # '('
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
                    elems.append(("str", _unescape_literal(bytes(buf))))
                    j = k
                    continue
                if sj == 0x3C:  # '<' hex string (CID TJ arrays kern these)
                    if data[j : j + 2] == b"<<":
                        # malformed: a dict inside a TJ array — swallow
                        # it WHOLE (depth-matched, string-aware), or its
                        # numeric values would leak into the array as
                        # phantom kern adjustments.  Unterminated dict:
                        # skip only the token, so the array's ']' and
                        # every later show op survive
                        end = _skip_dict_token(data, j)
                        j = end if end is not None else j + 2
                        continue
                    s, j = _hex_string_at(data, j)
                    if s is not None:
                        elems.append(("str", s))
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
            # position-anchored match: re.match on data[i:] copies the
            # whole remaining stream per name token (quadratic on long
            # streams)
            m = _NAME_RE.match(data, i)
            if m:
                yield ("name", m.group()[1:].decode("latin-1"))
                i = m.end()
            else:
                i += 1
            continue
        m = _NUM_RE.match(data, i)
        if m:
            yield ("num", float(m.group()))
            i = m.end()
            continue
        m = _OP_RE.match(data, i)
        if m:
            if m.group() == b"BI":
                # inline image (spec §8.9.7): skip dict + BINARY payload
                # to the whitespace-delimited EI keyword — tokenizing the
                # raster bytes would desync the operand stream
                k = i + 2
                while True:
                    j = data.find(b"EI", k)
                    if j == -1:
                        i = n
                        break
                    before = data[j - 1 : j]
                    after = data[j + 2 : j + 3]
                    if (j == 0 or before in (b" ", b"\t", b"\r", b"\n")) and (
                        after == b"" or not after.isalnum()
                    ):
                        i = j + 2
                        break
                    k = j + 2
                continue
            yield ("op", m.group().decode("latin-1"))
            i = m.end()
            continue
        i += 1


# A TJ kerning adjustment at or beyond this many thousandths of an em is
# an inter-word gap, not a kern: insert a space (LaTeX and many word
# processors encode spaces this way instead of space glyphs).
TJ_SPACE_UNITS = -180.0
DEFAULT_GLYPH_W = 500.0  # em/2: the classic simple-font fallback advance


_IDENTITY_CTM = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)

# Per-page budget of Do invocations: recursion depth alone cannot bound
# the WORK (a 12-form chain invoking each other k times amplifies to
# k^depth interpretations from a few KB of input — a billion-laughs
# shape); the shared counter caps total form executions per page.
_DO_BUDGET = 256


def _mat_mul(m: Tuple[float, ...], n: Tuple[float, ...]) -> Tuple[float, ...]:
    """Affine 2x3 composition: apply ``m``, then ``n``."""
    return (
        m[0] * n[0] + m[1] * n[2],
        m[0] * n[1] + m[1] * n[3],
        m[2] * n[0] + m[3] * n[2],
        m[2] * n[1] + m[3] * n[3],
        m[4] * n[0] + m[5] * n[2] + n[4],
        m[4] * n[1] + m[5] * n[3] + n[5],
    )


def _interpret_stream(
    data: bytes,
    font_maps: Optional[dict] = None,
    ctm0: Tuple[float, ...] = _IDENTITY_CTM,
    form_resolver=None,
    _boxes: Optional[List[TextBox]] = None,
    _depth: int = 0,
    _budget: Optional[List[int]] = None,
    _text_state: Optional[tuple] = None,
) -> List[TextBox]:
    """Run the text operators of one content stream, collecting boxes.

    ``font_maps`` maps resource font names (e.g. ``"F1"``) to dicts
    ``{code_width, cmap, widths, default_w}`` built from the font's
    ``/ToUnicode`` CMap, ``/Differences`` array, and ``/Widths`` (simple)
    or descendant ``/W`` (CID) arrays.  Strings shown while such a font
    is selected (via ``Tf``) decode through the cmap — byte-at-a-time
    for width 1, big-endian code units for width 2 (Identity-H CID
    fonts) — all others through utf-8/latin-1.

    Glyph ADVANCE is modelled: after every show op, the current position
    moves by the shown string's width (``/Widths``-aware, in text-space
    units scaled by the ``Tf`` size), and TJ numeric adjustments shift
    it back — adjustments beyond :data:`TJ_SPACE_UNITS` decode as spaces.
    Successive show ops without explicit repositioning therefore land at
    their true x order.

    The graphics state's CTM is tracked (``cm`` concatenation, ``q/Q``
    save/restore): box positions are CTM-mapped user-space points, so
    content positioned via ``cm`` translations and Form-XObject
    invocations (``Do`` — resolved through ``form_resolver(name) ->
    (payload, fonts, matrix, resolver')``) land where a viewer shows
    them.  With the identity CTM every emit reduces to the raw text-space
    point, which is what the golden fixtures pinned.  Advance DIRECTIONS
    stay in text space (exact for translation CTMs — the common case;
    a scaled/rotated ``cm`` still places boxes correctly but inter-glyph
    advances keep their text-space scale, documented approximation).
    """
    boxes: List[TextBox] = [] if _boxes is None else _boxes
    budget = [_DO_BUDGET] if _budget is None else _budget
    stack: List[object] = []  # operand stack (numbers / strings / arrays)
    ctm = tuple(ctm0)
    # q/Q save-restore: the spec's graphics state includes the text-state
    # parameters (Tf font+size, Tc, Tw, Tz, TL — spec 9.3.1), not just
    # the CTM, and Do preserves it into the invoked form (8.10.2)
    gs_stack: List[tuple] = []
    lx = ly = 0.0  # line start
    cx = cy = 0.0  # current position
    # text-matrix 2x2 (a b c d): line moves travel along (c, d), glyph
    # advances along (a, b).  Identity reduces every update below to the
    # plain scalar arithmetic the fixtures were built on; a rotated Tm
    # ([0 1 -1 0] — how /Rotate pages usually write their text) makes the
    # collected boxes TRUE content coordinates, which _apply_rotation
    # then maps to display space
    ma, mb, mc, md = 1.0, 0.0, 0.0, 1.0
    # continue ABOVE the highest existing seq, not at len(boxes): after
    # an earlier sibling form's /BBox filter, retained seqs can exceed
    # the list length, and a reused seq would hand the (y, x, seq)
    # reading-order tiebreak back to list order
    seq = (max(b.seq for b in boxes) + 1) if boxes else 0
    in_text = False
    if _text_state is not None:  # inherited from the invoking context (Do)
        cur_font, font_size, char_spacing, word_spacing, hscale, leading = (
            _text_state
        )
    else:
        leading = 0.0
        font_size = 0.0  # advance is zero until a Tf sets the size, per spec
        char_spacing = 0.0  # Tc
        word_spacing = 0.0  # Tw (single-byte code 32 only, §9.3.3)
        hscale = 1.0  # Tz / 100
        cur_font = None

    def _codes(raw: bytes, w: int) -> List[int]:
        if w == 1:
            return list(raw)
        return [
            int.from_bytes(raw[i : i + w], "big")
            for i in range(0, len(raw) - w + 1, w)
        ]

    def decode(raw: bytes) -> str:
        mp = cur_font.get("cmap") if cur_font else None
        width = cur_font["code_width"] if cur_font else 1
        if mp is None:
            if width > 1:
                # multi-byte CIDs without a ToUnicode CMap are glyph ids
                # with no textual meaning: emit nothing, never raw bytes
                return ""
            return _default_decode(raw)
        if width == 1:
            # unmapped codes keep their base-encoding (latin-1 ~ Standard
            # for the printable range) interpretation
            return "".join(mp.get(b, chr(b)) for b in raw)
        # multi-byte code space: unmapped CIDs have no unicode meaning
        return "".join(mp.get(c, "") for c in _codes(raw, width))

    def advance_units(raw: bytes) -> float:
        """Width of ``raw`` in thousandths of an em."""
        if cur_font is None:
            return DEFAULT_GLYPH_W * len(raw)
        ws = cur_font["widths"]
        dw = cur_font["default_w"]
        return sum(ws.get(c, dw) for c in _codes(raw, cur_font["code_width"]))

    def emit(text: str) -> None:
        nonlocal seq
        if text:
            a, b, c, d, e, f_ = ctm
            boxes.append(
                TextBox(cx * a + cy * c + e, cx * b + cy * d + f_, seq, text)
            )
            seq += 1

    def advance_pts(raw: bytes) -> float:
        """Full advance of one shown string in points (spec §9.4.4):
        glyph widths scaled by size, plus Tc per glyph and Tw per
        single-byte space, all scaled by Tz.  Type3 fonts map glyph
        space through /FontMatrix instead of the standard 1/1000
        (``unit_scale``, §9.6.5); the standard case keeps the exact
        ``/ 1000.0`` arithmetic the fixtures were built on."""
        cw = cur_font["code_width"] if cur_font else 1
        n_glyphs = len(raw) // cw
        n_spaces = raw.count(b" ") if cw == 1 else 0
        us = cur_font.get("unit_scale") if cur_font else None
        base = (
            advance_units(raw) * us if us is not None
            else advance_units(raw) / 1000.0
        )
        return (
            base * font_size
            + n_glyphs * char_spacing
            + n_spaces * word_spacing
        ) * hscale

    def v_advance_pts(raw: bytes) -> float:
        """DOWNWARD displacement of one shown string in WMode 1, in
        points.  Spec §9.4.4: ``ty = (w1 - Tj/1000)*Tfs + Tc + Tw`` per
        glyph with w1 NEGATIVE (the /W2 values are stored as magnitudes
        here), so the downward magnitude is ``|w1|*Tfs - Tc`` —
        positive Tc SHRINKS the gap, per the signed formula.  Tz is
        horizontal-only (§9.3.2); Tw DOES appear in the vertical
        formula but only for single-byte code 32, unreachable here
        because WMode 1 is only set on Type0 fonts whose code space is
        forced to >= 2 bytes — revisit if 1-byte vertical CMaps are
        ever supported."""
        if cur_font is None:
            return 0.0
        cw = cur_font["code_width"]
        vw = cur_font.get("v_widths") or {}
        vd = cur_font.get("v_default", 1000.0)
        units = sum(vw.get(c, vd) for c in _codes(raw, cw))
        n_glyphs = len(raw) // cw
        return units / 1000.0 * font_size - n_glyphs * char_spacing

    def _wmode() -> int:
        return cur_font.get("wmode", 0) if cur_font else 0

    def show(raw: bytes) -> None:
        nonlocal cx, cy
        emit(decode(raw))
        if _wmode():
            # vertical writing: displacement (0, -v) in text space,
            # mapped through the Tm 2x2 — the line flows DOWN
            adv = v_advance_pts(raw)
            cx -= adv * mc
            cy -= adv * md
        else:
            adv = advance_pts(raw)
            cx += adv * ma
            cy += adv * mb

    for kind, val in _tokenize(data):
        if kind in ("num", "str", "arr", "name"):
            stack.append((kind, val))
            continue
        op = val
        try:
            if op == "BT":
                in_text = True
                lx = ly = cx = cy = 0.0
                ma, mb, mc, md = 1.0, 0.0, 0.0, 1.0
            elif op == "ET":
                in_text = False
            elif op == "Tf" and len(stack) >= 2:
                k, name = stack[-2]
                if k == "name" and font_maps is not None:
                    cur_font = font_maps.get(name)
                if stack[-1][0] == "num":
                    font_size = float(stack[-1][1])  # type: ignore[arg-type]
            elif op == "Td" and len(stack) >= 2:
                ty = float(stack[-1][1])  # type: ignore[arg-type]
                tx = float(stack[-2][1])  # type: ignore[arg-type]
                lx += tx * ma + ty * mc
                ly += tx * mb + ty * md
                cx, cy = lx, ly
            elif op == "TD" and len(stack) >= 2:
                ty = float(stack[-1][1])  # type: ignore[arg-type]
                tx = float(stack[-2][1])  # type: ignore[arg-type]
                leading = -ty
                lx += tx * ma + ty * mc
                ly += tx * mb + ty * md
                cx, cy = lx, ly
            elif op == "Tm" and len(stack) >= 6:
                # malformed operands (e.g. strings where numbers belong)
                # skip the op wholesale — degrading ONE matrix set must
                # not fail the whole document's extraction
                try:
                    vals = [float(stack[k][1]) for k in range(-6, 0)]  # type: ignore[arg-type]
                except (TypeError, ValueError):
                    vals = None
                if vals is not None:
                    ma, mb, mc, md, e, f = vals
                    lx, ly = e, f
                    cx, cy = e, f
            elif op == "TL" and len(stack) >= 1:
                leading = float(stack[-1][1])  # type: ignore[arg-type]
            elif op == "Tc" and len(stack) >= 1:
                char_spacing = float(stack[-1][1])  # type: ignore[arg-type]
            elif op == "Tw" and len(stack) >= 1:
                word_spacing = float(stack[-1][1])  # type: ignore[arg-type]
            elif op == "Tz" and len(stack) >= 1:
                hscale = float(stack[-1][1]) / 100.0  # type: ignore[arg-type]
            elif op == "T*":
                lx -= leading * mc
                ly -= leading * md
                cx, cy = lx, ly
            elif op == "Tj" and stack and in_text:
                k, s = stack[-1]
                if k == "str":
                    show(s)  # type: ignore[arg-type]
            elif op == "TJ" and stack and in_text:
                k, arr = stack[-1]
                if k == "arr":
                    # one logical box at the start position; strings
                    # accumulate advance, numbers kern it back, and a
                    # word-sized negative kern decodes as a space
                    parts: List[str] = []
                    pts = 0.0
                    vertical = bool(_wmode())
                    for ek, v in arr:  # type: ignore[union-attr]
                        if ek == "str":
                            dv = decode(v)
                            # an inserted word-gap space collapses with a
                            # decoded leading space — never double up
                            if dv.startswith(" ") and parts and parts[-1] == " ":
                                parts.pop()
                            parts.append(dv)
                            pts += (
                                v_advance_pts(v) if vertical
                                else advance_pts(v)
                            )
                        else:  # num
                            # Table 109: a positive adjustment moves the
                            # next glyph LEFT (horizontal) or DOWN
                            # (vertical) — the sign flips with the mode;
                            # Tz scales horizontal displacement only
                            if vertical:
                                pts += float(v) / 1000.0 * font_size  # type: ignore[arg-type]
                            else:
                                pts -= float(v) / 1000.0 * font_size * hscale  # type: ignore[arg-type]
                            # word-gap heuristic: a spreading adjustment
                            # beyond |TJ_SPACE_UNITS| decodes as a space
                            # (negative spreads horizontally, POSITIVE
                            # spreads downward), only BETWEEN glyphs (a
                            # kern before the first or after the last
                            # string is positioning), and not after a
                            # trailing decoded space
                            spreads = (
                                float(v) >= -TJ_SPACE_UNITS  # type: ignore[arg-type]
                                if vertical
                                else float(v) <= TJ_SPACE_UNITS  # type: ignore[arg-type]
                            )
                            if (
                                spreads
                                and parts
                                and not parts[-1].endswith(" ")
                            ):
                                parts.append(" ")
                    if parts and parts[-1] == " ":
                        parts.pop()
                    emit("".join(parts))
                    if vertical:
                        cx -= pts * mc
                        cy -= pts * md
                    else:
                        cx += pts * ma
                        cy += pts * mb
            elif op == "'" and stack and in_text:
                lx -= leading * mc
                ly -= leading * md
                cx, cy = lx, ly
                k, s = stack[-1]
                if k == "str":
                    show(s)  # type: ignore[arg-type]
            elif op == "q":
                gs_stack.append(
                    (ctm, cur_font, font_size, char_spacing,
                     word_spacing, hscale, leading)
                )
            elif op == "Q":
                if gs_stack:
                    (ctm, cur_font, font_size, char_spacing,
                     word_spacing, hscale, leading) = gs_stack.pop()
            elif op == "cm" and len(stack) >= 6:
                try:
                    m = tuple(float(stack[k][1]) for k in range(-6, 0))  # type: ignore[arg-type]
                except (TypeError, ValueError):
                    m = None
                if m is not None:
                    ctm = _mat_mul(m, ctm)
            elif op == "Do" and stack and form_resolver is not None:
                k, name = stack[-1]
                if k == "name" and _depth < 8 and budget[0] > 0:
                    form = form_resolver(name)
                    if form is not None:
                        budget[0] -= 1
                        fdata, ffonts, fmatrix, fbbox, fresolver = form
                        sub_ctm = _mat_mul(fmatrix or _IDENTITY_CTM, ctm)
                        # forms paint with an implicitly saved/restored
                        # graphics state (spec 8.10.2), INHERITING the
                        # invoker's text-state parameters; the shared box
                        # list preserves document order.  The form's own
                        # fonts win when it has them.
                        start = len(boxes)
                        _interpret_stream(
                            fdata,
                            font_maps=ffonts if ffonts else font_maps,
                            ctm0=sub_ctm,
                            form_resolver=fresolver,
                            _boxes=boxes,
                            _depth=_depth + 1,
                            _budget=budget,
                            _text_state=(
                                cur_font, font_size, char_spacing,
                                word_spacing, hscale, leading,
                            ),
                        )
                        if fbbox is not None:
                            # /BBox clips form content (spec 8.10.1):
                            # drop boxes whose origin lands outside the
                            # transformed (axis-aligned hull) bbox
                            x0, y0, x1, y1 = fbbox
                            corners = [
                                (
                                    px * sub_ctm[0] + py * sub_ctm[2] + sub_ctm[4],
                                    px * sub_ctm[1] + py * sub_ctm[3] + sub_ctm[5],
                                )
                                for px, py in (
                                    (x0, y0), (x0, y1), (x1, y0), (x1, y1),
                                )
                            ]
                            bx0 = min(c[0] for c in corners) - 1e-6
                            bx1 = max(c[0] for c in corners) + 1e-6
                            by0 = min(c[1] for c in corners) - 1e-6
                            by1 = max(c[1] for c in corners) + 1e-6
                            boxes[start:] = [
                                b
                                for b in boxes[start:]
                                if bx0 <= b.x <= bx1 and by0 <= b.y <= by1
                            ]
                        # seq must never reuse a retained box's value:
                        # after the BBox filter len(boxes) can fall below
                        # a kept box's seq, and a duplicate would leave
                        # the (y, x, seq) reading-order tiebreak to list
                        # order
                        seq = (
                            max(b.seq for b in boxes) + 1 if boxes
                            else 0
                        )
            elif op == '"' and stack and in_text:
                if len(stack) >= 3:  # aw ac string " (sets Tw and Tc)
                    if stack[-3][0] == "num":
                        word_spacing = float(stack[-3][1])  # type: ignore[arg-type]
                    if stack[-2][0] == "num":
                        char_spacing = float(stack[-2][1])  # type: ignore[arg-type]
                lx -= leading * mc
                ly -= leading * md
                cx, cy = lx, ly
                k, s = stack[-1]
                if k == "str":
                    show(s)  # type: ignore[arg-type]
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


# ---------------------------------------------------------------------------
# document structure: object map, page tree, font encodings
# ---------------------------------------------------------------------------

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_ROTATE_RE = re.compile(rb"/Rotate\s+(-?\d+)\b")
# direct /Length only — `/Length 5 0 R` (indirect) must NOT match
_LENGTH_DIRECT_RE = re.compile(rb"/Length\s+(\d+)(?![0-9]|\s+\d+\s+R)")
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]")
_REF_IN_ARR_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_DIFFERENCES_RE = re.compile(rb"/Differences\s*\[(.*?)\]", re.DOTALL)
_DIFF_ITEM_RE = re.compile(rb"(\d+)|/([^\s\[\]<>()/]+)")
_FONT_ENTRY_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")

# Glyph-name -> character subset of the Adobe Glyph List: ASCII names plus
# the accented latin names a Differences array typically carries.
_GLYPH_CHARS = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "aacute": "á", "agrave": "à", "acircumflex": "â",
    "adieresis": "ä", "eacute": "é", "egrave": "è",
    "ecircumflex": "ê", "edieresis": "ë", "iacute": "í",
    "oacute": "ó", "ocircumflex": "ô", "odieresis": "ö",
    "uacute": "ú", "udieresis": "ü", "ntilde": "ñ",
    "ccedilla": "ç", "germandbls": "ß", "oslash": "ø",
    "ae": "æ", "Euro": "€", "bullet": "•",
    "endash": "–", "emdash": "—", "quoteleft": "‘",
    "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”",
    # uppercase accents, remaining latin-1 letters
    "Aacute": "Á", "Agrave": "À", "Acircumflex": "Â", "Adieresis": "Ä",
    "Atilde": "Ã", "Aring": "Å", "aring": "å", "atilde": "ã",
    "Eacute": "É", "Egrave": "È", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Iacute": "Í", "Igrave": "Ì", "Icircumflex": "Î", "Idieresis": "Ï",
    "igrave": "ì", "icircumflex": "î", "idieresis": "ï",
    "Oacute": "Ó", "Ograve": "Ò", "Ocircumflex": "Ô", "Odieresis": "Ö",
    "Otilde": "Õ", "otilde": "õ", "ograve": "ò",
    "Uacute": "Ú", "Ugrave": "Ù", "Ucircumflex": "Û", "Udieresis": "Ü",
    "ugrave": "ù", "ucircumflex": "û",
    "Ntilde": "Ñ", "Ccedilla": "Ç", "Yacute": "Ý", "yacute": "ý",
    "ydieresis": "ÿ", "Ydieresis": "Ÿ",
    "AE": "Æ", "OE": "Œ", "oe": "œ", "Oslash": "Ø",
    "Scaron": "Š", "scaron": "š", "Zcaron": "Ž", "zcaron": "ž",
    "Thorn": "Þ", "thorn": "þ", "Eth": "Ð", "eth": "ð",
    "dotlessi": "ı",
    # ligatures and common punctuation/symbols (AGL names)
    "fi": "ﬁ", "fl": "ﬂ",
    "dagger": "†", "daggerdbl": "‡", "section": "§", "paragraph": "¶",
    "copyright": "©", "registered": "®", "trademark": "™",
    "degree": "°", "plusminus": "±", "multiply": "×", "divide": "÷",
    "minus": "−", "fraction": "⁄", "periodcentered": "·",
    "ellipsis": "…", "perthousand": "‰", "brokenbar": "¦",
    "micro": "µ", "cent": "¢", "sterling": "£", "yen": "¥",
    "currency": "¤", "florin": "ƒ",
    "exclamdown": "¡", "questiondown": "¿",
    "guillemotleft": "«", "guillemotright": "»",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "onehalf": "½", "onequarter": "¼", "threequarters": "¾",
    "onesuperior": "¹", "twosuperior": "²", "threesuperior": "³",
    "ordfeminine": "ª", "ordmasculine": "º",
    "logicalnot": "¬", "macron": "¯", "acute": "´", "cedilla": "¸",
    "dieresis": "¨", "circumflex": "ˆ", "tilde": "˜", "caron": "ˇ",
    "breve": "˘", "dotaccent": "˙", "ring": "˚", "ogonek": "˛",
    "hungarumlaut": "˝",
}


def _glyph_to_char(name: str) -> Optional[str]:
    if len(name) == 1:  # /A, /a, /0 — the name IS the character
        return name
    if name in _GLYPH_CHARS:
        return _GLYPH_CHARS[name]
    if name.startswith("uni") and len(name) == 7:  # /uniXXXX
        try:
            return chr(int(name[3:], 16))
        except ValueError:
            return None
    return None


def _find_stream_kw(data: bytes, start: int) -> int:
    """Position of the next real ``stream`` KEYWORD at/after ``start``:
    per spec §7.3.8.1 the keyword is followed by an EOL, and ``endstream``
    must not match (its tail contains 'stream')."""
    k = start
    while True:
        k = data.find(b"stream", k)
        if k == -1:
            return -1
        if data[k - 3 : k] != b"end" and data[k + 6 : k + 7] in (b"\r", b"\n"):
            return k
        k += 6


def _stream_extent(data: bytes, dict_part: bytes, ks: int) -> Tuple[int, int]:
    """(data_start, data_end) of the stream whose keyword starts at ``ks``.

    A direct ``/Length`` is used when the byte at start+Length is followed
    by ``endstream`` (the verification makes a lying /Length harmless);
    otherwise fall back to searching ``endstream``.  Slicing by extent —
    not regex — means FlateDecode payloads that legitimately contain
    ``endstream``/``endobj``/``N 0 obj`` byte sequences can neither
    truncate the object nor inject phantom definitions."""
    ds = ks + 6
    if data[ds : ds + 2] == b"\r\n":
        ds += 2
    elif data[ds : ds + 1] in (b"\n", b"\r"):
        # lone \r is spec-invalid but emitted by lenient writers; the
        # keyword finder accepts it, so the extent must skip it too
        ds += 1
    lm = _LENGTH_DIRECT_RE.search(dict_part)
    if lm:
        cand = ds + int(lm.group(1))
        if data[cand : cand + 12].lstrip(b"\r\n ").startswith(b"endstream"):
            return ds, cand
    es = data.find(b"endstream", ds)
    return ds, (es if es != -1 else len(data))


def _scan_top_level_objects(pdf_bytes: bytes) -> List[Tuple[int, int, int, bytes]]:
    """``[(file_pos, obj_num, gen_num, body)]`` in byte order, with stream
    extents respected (see ``_stream_extent``).  The scanner never looks
    INSIDE stream data for the next object header, so binary payloads
    cannot shadow real objects.  The generation number feeds the
    per-object decryption key for encrypted files (spec Algorithm 1)."""
    entries: List[Tuple[int, int, int, bytes]] = []
    pos = 0
    n = len(pdf_bytes)
    while True:
        m = _OBJ_HEAD_RE.search(pdf_bytes, pos)
        if not m:
            break
        body_start = m.end()
        num, gen = int(m.group(1)), int(m.group(2))
        ks = _find_stream_kw(pdf_bytes, body_start)
        ke = pdf_bytes.find(b"endobj", body_start)
        if ks != -1 and (ke == -1 or ks < ke):
            # stream object: jump over the stream data, then find endobj
            _ds, de = _stream_extent(
                pdf_bytes, pdf_bytes[body_start:ks], ks
            )
            ke = pdf_bytes.find(b"endobj", de)
            end = ke if ke != -1 else n
            entries.append((m.start(), num, gen, pdf_bytes[body_start:end]))
            pos = end + 6 if ke != -1 else n
        elif ke != -1:
            entries.append((m.start(), num, gen, pdf_bytes[body_start:ke]))
            pos = ke + 6
        else:
            break  # truncated object at EOF
    return entries


_OBJSTM_TYPE_RE = re.compile(rb"/Type\s*/ObjStm\b")


def _expand_object_streams(
    entries: List[Tuple[int, int, int, bytes]],
    crypto: Optional[StandardDecryptor] = None,
) -> List[Tuple[int, int, bytes]]:
    """Unpack ``/Type /ObjStm`` containers (PDF 1.5 compressed objects,
    spec §7.5.7): the stream payload starts with ``/N`` pairs of
    ``objnum offset`` integers, then the object bodies at
    ``/First + offset``.  Members inherit the container's file position so
    last-definition-wins keeps honoring incremental updates.  In an
    encrypted file the CONTAINER stream decrypts with its own object key;
    member objects are not re-encrypted (spec §7.5.7)."""
    members: List[Tuple[int, int, bytes]] = []
    for pos, num, gen, body in entries:
        d = _obj_dict(body)
        if not _OBJSTM_TYPE_RE.search(d):
            continue
        data = _stream_payload(
            body, crypto.stream_decryptor(num, gen) if crypto else None
        )
        m_n = re.search(rb"/N\s+(\d+)\b", d)
        m_first = re.search(rb"/First\s+(\d+)\b", d)
        if data is None or not m_n or not m_first:
            continue
        n_objs, first = int(m_n.group(1)), int(m_first.group(1))
        try:
            header = [int(x) for x in data[:first].split()[: 2 * n_objs]]
        except ValueError:
            continue
        if len(header) < 2 * n_objs:
            continue
        for k in range(n_objs):
            onum, off = header[2 * k], header[2 * k + 1]
            end = header[2 * k + 3] if k + 1 < n_objs else len(data) - first
            if 0 <= off <= end <= len(data) - first:
                members.append((pos, onum, data[first + off : first + end]))
    return members


def _trailer_regions(pdf_bytes: bytes, pos_map: dict) -> List[bytes]:
    """Trailer dictionary regions, NEWEST first.

    Two sources, per spec §7.5.5 and §7.5.8 (cross-reference streams):

    - the ``startxref`` chain: when the offset lands on an object header
      in ``pos_map`` whose dict is ``/Type /XRef``, that dict IS the
      trailer (PDF 1.5+ xref-stream files have no ``trailer`` keyword);
      ``/Prev`` links to the superseded table of each incremental update
    - classic ``trailer`` keywords, scanned back-to-front (the last
      trailer in the file is the active one)

    Parsing the xref-stream DICT (never its payload — xref streams are
    exempt from encryption, §7.5.8.2) removes the tail-regex heuristic
    for /Root and /Encrypt discovery in incrementally-updated files."""
    regions: List[bytes] = []
    sx = pdf_bytes.rfind(b"startxref")
    if sx != -1:
        m = re.match(rb"startxref\s+(\d+)", pdf_bytes[sx:])
        off = int(m.group(1)) if m else -1
        seen: set = set()
        while off in pos_map and off not in seen:
            seen.add(off)
            d = _obj_dict(pos_map[off])
            if not re.search(rb"/Type\s*/XRef\b", d):
                break
            regions.append(d)
            pm = re.search(rb"/Prev\s+(\d+)\b", d)
            off = int(pm.group(1)) if pm else -1
    t = len(pdf_bytes)
    while True:
        t = pdf_bytes.rfind(b"trailer", 0, t)
        if t == -1:
            break
        end = pdf_bytes.find(b"startxref", t)
        regions.append(pdf_bytes[t : end if end != -1 else len(pdf_bytes)])
    return regions


def _parse_objects(
    pdf_bytes: bytes,
) -> Tuple[dict, Callable[[int], Optional[bytes]], List[bytes], bool]:
    """``(objs, payload_of, trailer_regions, encrypted)`` for one
    document.  ``encrypted`` reflects the ACTIVE trailer's /Encrypt —
    the same oracle the decryption setup used, so callers never re-derive
    the encryption fact with a different heuristic.

    ``objs`` maps object number -> body bytes, scanned in byte order
    (stream-extent aware) with last-definition-wins, which absorbs
    incremental updates without trusting (or needing) the xref table;
    ``/ObjStm`` members are unpacked in place.

    ``payload_of(num)`` returns the object's DECODED stream payload —
    decrypting first when the document carries an /Encrypt dictionary the
    empty user/owner password opens (per-object RC4/AES keys need the
    object and generation numbers, so decryption must happen here, where
    they are known, not in the raw byte scan).  Raises
    :class:`EncryptedPdfError` when the file is encrypted and the empty
    password is rejected or the handler is unsupported.
    """
    entries = _scan_top_level_objects(pdf_bytes)
    pos_map = {pos: body for pos, _num, _gen, body in entries}
    trailers = _trailer_regions(pdf_bytes, pos_map)
    enc_trailers = trailers
    if not any(is_trailer_dict(r) for r in trailers):
        # no parseable trailer at all (corrupt startxref, prepended
        # capture bytes): consult the heuristic regions so an encrypted
        # file with a broken chain still QUARANTINES (or decrypts)
        # instead of silently rescanning ciphertext as plaintext
        enc_trailers = trailers + heuristic_trailer_regions(pdf_bytes)
    enc_ref, id0 = find_encrypt_ref(enc_trailers)
    crypto: Optional[StandardDecryptor] = None
    if enc_ref is not None:
        enc_bodies = [b for _p, n, _g, b in entries if n == enc_ref]
        if not enc_bodies:
            raise EncryptedPdfError("encrypted PDF: /Encrypt object missing")
        # the encrypt dict is necessarily top-level (it cannot live in an
        # ObjStm whose decryption it gates); last definition wins
        crypto = authenticate(_obj_dict(enc_bodies[-1]), id0)
    members = _expand_object_streams(entries, crypto)
    merged: List[Tuple[int, int, int, bool]] = []  # (pos, num, gen, from_stm)
    bodies: List[bytes] = []
    for pos, num, gen, body in entries:
        merged.append((pos, num, gen, False))
        bodies.append(body)
    for pos, num, body in members:
        merged.append((pos, num, 0, True))
        bodies.append(body)
    order = sorted(range(len(merged)), key=lambda i: merged[i][0])
    objs: dict = {}
    gens: dict = {}
    plaintext: set = set()  # ObjStm members: container already decrypted
    for i in order:
        pos, num, gen, from_stm = merged[i]
        objs[num] = bodies[i]
        gens[num] = gen
        if from_stm:
            plaintext.add(num)
        else:
            plaintext.discard(num)

    def payload_of(num: int) -> Optional[bytes]:
        body = objs.get(num)
        if body is None:
            return None
        if crypto is None or num in plaintext:
            return _stream_payload(body)
        return _stream_payload(body, crypto.stream_decryptor(num, gens[num]))

    return objs, payload_of, trailers, enc_ref is not None


def _obj_dict(body: bytes) -> bytes:
    """The dictionary part of an object body (before any stream data)."""
    k = _find_stream_kw(body, 0)
    return body[:k] if k != -1 else body


def _ref(dict_bytes: bytes, name: bytes) -> Optional[int]:
    m = re.search(rb"/" + name + rb"\s+(\d+)\s+\d+\s+R", dict_bytes)
    return int(m.group(1)) if m else None


def _content_refs(dict_bytes: bytes) -> List[int]:
    """``/Contents`` as a list of object numbers (single ref or array)."""
    m = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", dict_bytes)
    if m:
        return [int(m.group(1))]
    m = re.search(rb"/Contents\s*\[((?:\s*\d+\s+\d+\s+R)*)\s*\]", dict_bytes)
    if m:
        return [int(r.group(1)) for r in _REF_IN_ARR_RE.finditer(m.group(1))]
    return []


_FILTER_RE = re.compile(rb"/Filter\s*(/\w+|\[[^\]]*\])")
_PREDICTOR_RE = re.compile(rb"/Predictor\s+(\d+)")
_COLUMNS_RE = re.compile(rb"/Columns\s+(\d+)")
_COLORS_RE = re.compile(rb"/Colors\s+(\d+)")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)")
_EARLYCHANGE_RE = re.compile(rb"/EarlyChange\s+(\d+)")


def _lzw_decode(
    data: bytes, early_change: int = 1, max_out: Optional[int] = None
) -> bytes:
    """PDF-variant LZW (spec §7.4.4): 9→12-bit MSB-first codes, clear
    code 256, EOD 257, code width grows ``early_change`` codes early.

    ``max_out`` bounds the INFLATED size: callers decoding
    attacker-sized streams (TIFF strips in `operators.multimodal`) pass
    the raster size they expect, so a decompression-bomb strip fails as
    a ValueError instead of allocating multi-GB (PDF content streams
    keep the historical unbounded default — their size is already
    gated upstream by the document byte cap)."""
    table = {i: bytes([i]) for i in range(256)}
    next_code, code_len = 258, 9
    prev: Optional[bytes] = None
    out = bytearray()
    bitbuf = bitcnt = 0
    for byte in data:
        if max_out is not None and len(out) > max_out:
            raise ValueError("LZW output exceeds caller bound")
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= code_len:
            code = (bitbuf >> (bitcnt - code_len)) & ((1 << code_len) - 1)
            bitcnt -= code_len
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code, code_len, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise ValueError("corrupt LZW stream")
            if prev is not None and next_code < 4096:
                # table frozen at 4095 (12-bit cap) until a clear code
                table[next_code] = prev + entry[:1]
                next_code += 1
            out += entry
            prev = entry
            # grow when the next entry to assign hits 511/1023/2047 (for
            # EarlyChange=1) — the de-facto decoder contract real PDF
            # writers encode against (cf. pdfminer's LZWDecoder.feed)
            if next_code >= (1 << code_len) - early_change and code_len < 12:
                code_len += 1
    return bytes(out)


def _runlength_decode(data: bytes) -> bytes:
    """RunLengthDecode (spec §7.4.5): L<128 copies L+1 literals, L>128
    repeats the next byte 257-L times, 128 is EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        length = data[i]
        if length == 128:
            break
        if length < 128:
            out += data[i + 1 : i + 2 + length]
            i += 2 + length
        else:
            out += data[i + 1 : i + 2] * (257 - length)
            i += 2
    return bytes(out)


def _asciihex_decode(data: bytes) -> bytes:
    body = re.sub(rb"\s", b"", data.split(b">")[0])
    if len(body) % 2:
        body += b"0"
    return bytes.fromhex(body.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    import base64

    body = re.sub(rb"\s", b"", data)
    if body.endswith(b"~>"):
        body = body[:-2]
    return base64.a85decode(body)


def _png_unpredict(data: bytes, dict_bytes: bytes) -> bytes:
    """Reverse PNG row predictors (spec §7.4.4.4) — xref/ObjStm streams
    commonly use Up (12); predictor 1 (none) passes through."""
    pm = _PREDICTOR_RE.search(dict_bytes)
    pred = int(pm.group(1)) if pm else 1
    if pred < 10:  # 1 = none, 2 = TIFF (unsupported → pass through as-is)
        return data
    cm = _COLUMNS_RE.search(dict_bytes)
    colors_m = _COLORS_RE.search(dict_bytes)
    bpc_m = _BPC_RE.search(dict_bytes)
    columns = int(cm.group(1)) if cm else 1
    colors = int(colors_m.group(1)) if colors_m else 1
    bpc = int(bpc_m.group(1)) if bpc_m else 8
    rowlen = (columns * colors * bpc + 7) // 8
    bpp = max(1, (colors * bpc) // 8)
    out = bytearray()
    prev_row = bytearray(rowlen)
    for base in range(0, len(data), rowlen + 1):
        ft = data[base]
        row = bytearray(data[base + 1 : base + 1 + rowlen])
        if len(row) < rowlen:
            break  # truncated final row
        for i in range(rowlen):
            left = row[i - bpp] if i >= bpp else 0
            up = prev_row[i]
            ul = prev_row[i - bpp] if i >= bpp else 0
            if ft == 1:
                row[i] = (row[i] + left) & 0xFF
            elif ft == 2:
                row[i] = (row[i] + up) & 0xFF
            elif ft == 3:
                row[i] = (row[i] + ((left + up) >> 1)) & 0xFF
            elif ft == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pr = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                row[i] = (row[i] + pr) & 0xFF
        out += row
        prev_row = row
    return bytes(out)


def _decode_filters(payload: bytes, dict_bytes: bytes) -> Optional[bytes]:
    """Run the object's ``/Filter`` chain (array order = application
    order, spec §7.4.1).  Returns None on an unsupported filter or any
    decode error — the caller treats that as 'structure untrustworthy'."""
    fm = _FILTER_RE.search(dict_bytes)
    if not fm:
        return payload
    names = re.findall(rb"/(\w+)", fm.group(1))
    try:
        for name in names:
            if name in (b"FlateDecode", b"Fl"):
                payload = _png_unpredict(zlib.decompress(payload), dict_bytes)
            elif name in (b"LZWDecode", b"LZW"):
                em = _EARLYCHANGE_RE.search(dict_bytes)
                payload = _png_unpredict(
                    _lzw_decode(payload, int(em.group(1)) if em else 1),
                    dict_bytes,
                )
            elif name in (b"ASCIIHexDecode", b"AHx"):
                payload = _asciihex_decode(payload)
            elif name in (b"ASCII85Decode", b"A85"):
                payload = _ascii85_decode(payload)
            elif name in (b"RunLengthDecode", b"RL"):
                payload = _runlength_decode(payload)
            elif name == b"Crypt":
                return None  # encrypted: cannot decode without keys
            else:
                return None  # DCT/JBIG2/JPX/CCITT: image codecs, not text
    except Exception:  # noqa: BLE001 — any decode failure means "cannot decode"
        return None
    return payload


def _stream_payload(
    body: bytes, decrypt: Optional[Callable[[bytes], bytes]] = None
) -> Optional[bytes]:
    """Decoded stream data, or None when it cannot be decoded (filter
    error, or an unsupported filter in the chain).  ``decrypt`` — a
    per-object decryptor bound to (objnum, gen) — runs BEFORE the filter
    chain, matching the spec's encrypt-after-encode order (§7.6.2)."""
    ks = _find_stream_kw(body, 0)
    if ks == -1:
        return None
    ds, de = _stream_extent(body, body[:ks], ks)
    payload = body[ds:de]
    if decrypt is not None:
        try:
            payload = decrypt(payload)
        except Exception:  # noqa: BLE001 — undecryptable == undecodable
            return None
    return _decode_filters(payload, _obj_dict(body))


# --- ToUnicode CMaps (spec §9.10.3) ----------------------------------------

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_HEX_ITEM_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_BFRANGE_ITEM_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
    rb"(<[0-9A-Fa-f]+>|\[(?:\s*<[0-9A-Fa-f]+>)*\s*\])"
)
_CODESPACE_RE = re.compile(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>")


def _utf16be_hex_to_str(hx: bytes) -> str:
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("utf-16-be", "ignore")
    except ValueError:
        return ""


def _parse_tounicode_cmap(data: bytes) -> Tuple[int, dict]:
    """CMap stream -> (code width in bytes, {code: unicode string}).

    Handles ``bfchar`` pairs and both ``bfrange`` destination forms
    (``<lo> <hi> <dstStart>`` increments the destination; the array form
    lists one destination per code).  The code width comes from the
    codespacerange — 2 for the Identity-H CMaps modern CID-font PDFs
    emit, 1 for simple fonts."""
    m = _CODESPACE_RE.search(data)
    width = max(1, len(m.group(1)) // 2) if m else 1
    cmap: dict = {}
    for sec in _BFCHAR_RE.finditer(data):
        toks = _HEX_ITEM_RE.findall(sec.group(1))
        for i in range(0, len(toks) - 1, 2):
            cmap[int(toks[i], 16)] = _utf16be_hex_to_str(toks[i + 1])
    for sec in _BFRANGE_RE.finditer(data):
        for item in _BFRANGE_ITEM_RE.finditer(sec.group(1)):
            lo, hi = int(item.group(1), 16), int(item.group(2), 16)
            if hi < lo or hi - lo > 0x10000:  # malformed / hostile range
                continue
            dst = item.group(3)
            if dst.startswith(b"["):
                for k, d in enumerate(_HEX_ITEM_RE.findall(dst)):
                    if lo + k > hi:
                        break
                    cmap[lo + k] = _utf16be_hex_to_str(d)
            else:
                base_hex = dst[1:-1]
                base = int(base_hex, 16)
                n_hex = max(2, len(base_hex))
                for k in range(hi - lo + 1):
                    cmap[lo + k] = _utf16be_hex_to_str(
                        b"%0*x" % (n_hex, base + k)
                    )
    return width, cmap


# Base-encoding override tables (spec Appendix D), built from the stdlib
# codecs: WinAnsiEncoding IS cp1252 (only 0x80-0x9F differs from the
# latin-1 default decode — curly quotes, dashes, €, ™), MacRomanEncoding
# remaps all of 0x80-0xFF.  Codes the codec leaves undefined keep the
# default interpretation.
_WINANSI_MAP = {}
for _c in range(0x80, 0xA0):
    try:
        _WINANSI_MAP[_c] = bytes([_c]).decode("cp1252")
    except UnicodeDecodeError:
        pass
_MACROMAN_MAP = {_c: bytes([_c]).decode("mac_roman") for _c in range(0x80, 0x100)}
# Appendix D deviations from the (post-1998) mac_roman codec: 0xDB is
# /currency in the PDF table (the codec says €), and 0xF0 is the Apple
# logo — a Private Use Area char that would inject tofu into extracted
# text, so it falls back to the default decode instead.
_MACROMAN_MAP[0xDB] = "¤"
del _MACROMAN_MAP[0xF0]
_BASE_ENCODINGS = {
    b"WinAnsiEncoding": _WINANSI_MAP,
    b"MacRomanEncoding": _MACROMAN_MAP,
}
_ENC_NAME_RE = re.compile(rb"/Encoding\s*/(\w+)")
_BASE_ENC_NAME_RE = re.compile(rb"/BaseEncoding\s*/(\w+)")


def _encoding_map(font_dict: bytes, objs: dict) -> Optional[dict]:
    """``{code: char}`` from the font's /Encoding: a named base encoding
    (``/Encoding /WinAnsiEncoding``, or ``/BaseEncoding`` inside an
    encoding dict) overlaid with its ``/Differences`` array.  Precedence
    (spec §9.6.5): Differences override the base encoding; the caller
    overlays /ToUnicode on top of both."""
    enc_ref = _ref(font_dict, b"Encoding")
    enc_dict = _obj_dict(objs[enc_ref]) if enc_ref in objs else font_dict
    base_name = None
    nm = _ENC_NAME_RE.search(font_dict)
    if nm:
        base_name = nm.group(1)
    bm = _BASE_ENC_NAME_RE.search(enc_dict)
    if bm:
        base_name = bm.group(1)
    code_map: dict = dict(_BASE_ENCODINGS.get(base_name or b"", {}))
    m = _DIFFERENCES_RE.search(enc_dict)
    if m:
        code = 0
        for item in _DIFF_ITEM_RE.finditer(m.group(1)):
            if item.group(1) is not None:
                code = int(item.group(1))
            else:
                ch = _glyph_to_char(item.group(2).decode("latin-1"))
                if ch is not None:
                    code_map[code] = ch
                code += 1
    return code_map or None


def _balanced_array(data: bytes, open_pos: int) -> Optional[bytes]:
    """The ``[...]`` slice starting at ``open_pos``, bracket-balanced
    (``/W`` arrays nest sub-lists)."""
    depth = 0
    for i in range(open_pos, len(data)):
        if data[i] == 0x5B:  # [
            depth += 1
        elif data[i] == 0x5D:  # ]
            depth -= 1
            if depth == 0:
                return data[open_pos : i + 1]
    return None


def _named_array(dict_bytes: bytes, name: bytes, objs: dict) -> Optional[bytes]:
    """The array value of ``/name`` — direct, or one indirect hop."""
    m = re.search(rb"/" + name + rb"\s*\[", dict_bytes)
    if m:
        return _balanced_array(dict_bytes, m.end() - 1)
    ref = _ref(dict_bytes, name)
    if ref is not None and ref in objs:
        body = _obj_dict(objs[ref])
        k = body.find(b"[")
        if k != -1:
            return _balanced_array(body, k)
    return None


def _simple_widths(fd: bytes, objs: dict) -> dict:
    """``/FirstChar`` + ``/Widths`` -> {code: advance units}."""
    fc = re.search(rb"/FirstChar\s+(\d+)", fd)
    arr = _named_array(fd, b"Widths", objs)
    if not fc or arr is None:
        return {}
    first = int(fc.group(1))
    return {
        first + i: float(w)
        for i, w in enumerate(_NUM_RE.findall(arr[1:-1]))
    }


def _cid_vertical(cid_dict: bytes, objs: dict) -> Tuple[dict, float]:
    """Descendant CIDFont ``/W2`` + ``/DW2`` -> ({cid: v units}, default).

    Vertical metrics (spec §9.7.4.3): ``/DW2 [vy w1y]`` defaults the
    per-glyph vertical displacement to ``w1y`` (normally -1000; the
    ADVANCE magnitude is ``-w1y``); ``/W2`` assigns per-CID triples
    ``c [w1y v1x v1y ...]`` or ranges ``c_first c_last w1y v1x v1y``.
    Only the displacement magnitude matters for reading order — the
    position vector (v1x, v1y) shifts the glyph origin, not the line
    flow, and is ignored."""
    v_default = 1000.0
    dw2 = _named_array(cid_dict, b"DW2", objs)
    if dw2 is not None:
        nums = _NUM_RE.findall(dw2[1:-1])
        if len(nums) >= 2:
            v_default = abs(float(nums[1]))
    v_widths: dict = {}
    w2 = _named_array(cid_dict, b"W2", objs)
    if w2 is not None:
        toks = re.findall(rb"\[[^\]]*\]|[-+]?(?:\d+\.?\d*|\.\d+)", w2[1:-1])
        k = 0
        while k < len(toks):
            t = toks[k]
            if t.startswith(b"["):
                k += 1
                continue
            if k + 1 < len(toks) and toks[k + 1].startswith(b"["):
                c = int(float(t))
                triple = _NUM_RE.findall(toks[k + 1])
                for j in range(0, len(triple) - 2, 3):
                    v_widths[c + j // 3] = abs(float(triple[j]))
                k += 2
            elif k + 4 < len(toks) and not any(
                toks[k + i].startswith(b"[") for i in range(1, 5)
            ):
                c1, c2 = int(float(t)), int(float(toks[k + 1]))
                w1y = abs(float(toks[k + 2]))
                if 0 <= c2 - c1 <= 65535:
                    for c in range(c1, c2 + 1):
                        v_widths[c] = w1y
                k += 5
            else:
                k += 1
    return v_widths, v_default


def _cid_widths(
    fd: bytes, objs: dict
) -> Tuple[dict, float, dict, float]:
    """Descendant CIDFont ``/W`` + ``/DW`` -> ({cid: units}, default,
    {cid: v units}, v default).

    ``/W`` grammar (spec §9.7.4.3): ``c [w1 w2 ...]`` assigns
    consecutively from ``c``; ``c_first c_last w`` assigns a range."""
    desc = _named_array(fd, b"DescendantFonts", objs)
    cid_dict = None
    if desc is not None:
        rm = _REF_IN_ARR_RE.search(desc)
        if rm and int(rm.group(1)) in objs:
            cid_dict = _obj_dict(objs[int(rm.group(1))])
    if cid_dict is None:
        return {}, 1000.0, {}, 1000.0
    dwm = re.search(rb"/DW\s+([\d.]+)", cid_dict)
    default_w = float(dwm.group(1)) if dwm else 1000.0
    w_arr = _named_array(cid_dict, b"W", objs)
    widths: dict = {}
    if w_arr is not None:
        toks = re.findall(rb"\[[^\]]*\]|[-+]?(?:\d+\.?\d*|\.\d+)", w_arr[1:-1])
        k = 0
        while k < len(toks):
            t = toks[k]
            if t.startswith(b"["):
                k += 1  # stray list without a leading code: skip
                continue
            if k + 1 < len(toks) and toks[k + 1].startswith(b"["):
                c = int(float(t))
                for j, w in enumerate(_NUM_RE.findall(toks[k + 1])):
                    widths[c + j] = float(w)
                k += 2
            elif k + 2 < len(toks) and not toks[k + 2].startswith(b"["):
                c1, c2, w = int(float(t)), int(float(toks[k + 1])), float(toks[k + 2])
                if 0 <= c2 - c1 <= 65535:
                    for c in range(c1, c2 + 1):
                        widths[c] = w
                k += 3
            else:
                k += 1
    v_widths, v_default = _cid_vertical(cid_dict, objs)
    return widths, default_w, v_widths, v_default


_FONT_MATRIX_RE = re.compile(rb"/FontMatrix\s*\[([^\]]*)\]")


def _type3_unit_scale(fd: bytes) -> Optional[float]:
    """Type3 glyph-space scale from ``/FontMatrix`` (spec §9.6.5):
    glyph widths map through the font matrix instead of the standard
    1/1000.  The horizontal advance scale is the matrix ``|a|`` component
    (``|b|`` when ``a`` is 0 — rotated-glyph fonts); both branches are
    non-negative so a mirrored font (negative ``a``) never walks text
    positions backwards; missing or unparsable matrices fall back to
    the common 0.001."""
    m = _FONT_MATRIX_RE.search(fd)
    if not m:
        return 0.001
    nums = _NUM_RE.findall(m.group(1))
    if len(nums) < 4:
        return 0.001
    try:
        a, b = float(nums[0]), float(nums[1])
    except ValueError:
        return 0.001
    return abs(a) if a != 0.0 else abs(b) or 0.001


def _font_maps(
    resources: bytes, objs: dict,
    payload_of: Optional[Callable[[int], Optional[bytes]]] = None,
) -> dict:
    """Resource font name -> ``{code_width, cmap, widths, default_w}``.

    A font's ``/ToUnicode`` CMap is authoritative for text extraction
    (spec §9.10.2) and sets the code width (2 for Identity-H CID fonts);
    ``/Differences`` fills unmapped single-byte codes for simple fonts.
    ``widths`` carries glyph advances from ``/Widths`` (simple) or the
    descendant CIDFont's ``/W`` (Type0).  Fonts with neither a cmap nor
    widths are omitted — the default decode + advance applies."""
    m = re.search(rb"/Font\s*<<(.*?)>>", resources, re.DOTALL)
    if not m:
        return {}
    maps = {}
    for entry in _FONT_ENTRY_RE.finditer(m.group(1)):
        name, ref = entry.group(1).decode("latin-1"), int(entry.group(2))
        if ref not in objs:
            continue
        fd = _obj_dict(objs[ref])
        code_width, cmap = 1, {}
        tu_ref = _ref(fd, b"ToUnicode")
        if tu_ref is not None and tu_ref in objs:
            data = (
                payload_of(tu_ref)
                if payload_of is not None
                else _stream_payload(objs[tu_ref])
            )
            if data is not None:
                code_width, cmap = _parse_tounicode_cmap(data)
        is_type0 = re.search(rb"/Subtype\s*/Type0\b", fd)
        if is_type0 and code_width < 2:
            code_width = 2  # Identity-H/V code space is 2-byte even sans CMap
        if code_width == 1:
            dm = _encoding_map(fd, objs)
            if dm:
                merged = dict(dm)
                merged.update(cmap)  # ToUnicode wins on conflicts
                cmap = merged
        v_widths: dict = {}
        v_default = 1000.0
        wmode = 0
        unit_scale = None  # None = the standard 1/1000 glyph space
        if is_type0:
            widths, default_w, v_widths, v_default = _cid_widths(fd, objs)
            # vertical writing: /Encoding /Identity-V or any predefined
            # -V CMap name selects WMode 1 (spec §9.7.5.2); glyphs then
            # advance along the NEGATIVE text-space y axis
            if re.search(rb"/Encoding\s*/[0-9A-Za-z-]+-V\b", fd):
                wmode = 1
        else:
            widths, default_w = _simple_widths(fd, objs), DEFAULT_GLYPH_W
            if re.search(rb"/Subtype\s*/Type3\b", fd):
                unit_scale = _type3_unit_scale(fd)
        if cmap or widths or is_type0:
            # Type0 stays mapped even with neither cmap nor widths:
            # falling through to the default byte decode would emit its
            # 2-byte CIDs as NUL-laced garbage (decode() renders
            # cmap=None + code_width=2 as nothing instead)
            maps[name] = {
                "code_width": code_width,
                "cmap": cmap or None,
                "widths": widths,
                "default_w": default_w,
                "v_widths": v_widths,
                "v_default": v_default,
                "wmode": wmode,
                "unit_scale": unit_scale,
            }
    return maps


_XOBJECT_DICT_RE = re.compile(rb"/XObject\s*<<(.*?)>>", re.DOTALL)
_FORM_SUBTYPE_RE = re.compile(rb"/Subtype\s*/Form\b")
_MATRIX_RE = re.compile(rb"/Matrix\s*\[([^\]]*)\]")
_BBOX_RE = re.compile(rb"/BBox\s*\[([^\]]*)\]")
# PDF names may contain '-', '.', '+' etc. (anything but delimiters) —
# the \w+-only font regex would silently miss '/Fm-1 7 0 R'
_RES_ENTRY_RE = re.compile(rb"/([^\s\[\]<>()/]+)\s+(\d+)\s+\d+\s+R")


def _form_resolver_for(
    resources: bytes,
    objs: dict,
    payload_of,
    fonts_cache: dict,
    resolver_cache: dict,
):
    """``name -> (payload, fonts, matrix, bbox, sub_resolver)`` for the
    ``/XObject`` entries of one resource dict, or None when there are
    none.  Form XObjects (spec §8.10) carry reusable content — some
    generators put letterheads or even ALL page text in them — executed
    by the ``Do`` operator under the current CTM composed with the
    form's ``/Matrix`` and clipped by its ``/BBox``.  Results are
    memoized per object number (the same form is typically invoked on
    every page)."""
    m = _XOBJECT_DICT_RE.search(resources)
    if not m:
        return None
    entries = {
        e.group(1).decode("latin-1"): int(e.group(2))
        for e in _RES_ENTRY_RE.finditer(m.group(1))
    }
    if not entries:
        return None
    memo: dict = {}

    def _nums_of(regex, d, n_vals):
        mm = regex.search(d)
        if mm:
            nums = _NUM_RE.findall(mm.group(1))
            if len(nums) == n_vals:
                return tuple(float(v) for v in nums)
        return None

    def resolver(name: str):
        ref = entries.get(name)
        if ref is None or ref not in objs:
            return None
        if ref in memo:
            return memo[ref]
        d = _obj_dict(objs[ref])
        out = None
        if _FORM_SUBTYPE_RE.search(d):
            data = payload_of(ref)
            if data is not None:
                matrix = _nums_of(_MATRIX_RE, d, 6)
                bbox = _nums_of(_BBOX_RE, d, 4)
                if bbox is not None:  # normalize corner order
                    bbox = (
                        min(bbox[0], bbox[2]), min(bbox[1], bbox[3]),
                        max(bbox[0], bbox[2]), max(bbox[1], bbox[3]),
                    )
                # the form's own /Resources win (direct dict OR indirect
                # ref); absent, the invoking context's resources are
                # inherited (pre-PDF-2.0 usage)
                rm = re.search(rb"/Resources\s*<<", d)
                if rm:
                    form_res = d[rm.start():]
                else:
                    rref = _ref(d, b"Resources")
                    if rref is not None and rref in objs:
                        form_res = _obj_dict(objs[rref])
                    else:
                        form_res = resources
                if form_res not in fonts_cache:
                    fonts_cache[form_res] = _font_maps(form_res, objs, payload_of)
                fonts = fonts_cache[form_res] or None
                if form_res not in resolver_cache:
                    resolver_cache[form_res] = _form_resolver_for(
                        form_res, objs, payload_of, fonts_cache, resolver_cache
                    )
                out = (data, fonts, matrix, bbox, resolver_cache[form_res])
        memo[ref] = out
        return out

    return resolver


def _walk_page_tree(node_num: int, objs: dict, inherited: dict, out: List[dict],
                    visited: Optional[set] = None) -> None:
    if visited is None:
        visited = set()
    if node_num in visited or node_num not in objs:  # cycle guard
        return
    visited.add(node_num)
    d = _obj_dict(objs[node_num])
    ctx = dict(inherited)
    mb = _MEDIABOX_RE.search(d)
    if mb:
        ctx["mediabox"] = tuple(float(v) for v in mb.groups())
    rot = _ROTATE_RE.search(d)
    if rot:
        ctx["rotate"] = int(rot.group(1)) % 360  # inheritable, §7.7.3.4
    res = re.search(rb"/Resources\s*<<", d)
    if res:
        ctx["resources"] = d[res.start():]
    kids = _KIDS_RE.search(d)
    if kids and re.search(rb"/Type\s*/Pages\b", d):
        for r in _REF_IN_ARR_RE.finditer(kids.group(1)):
            _walk_page_tree(int(r.group(1)), objs, ctx, out, visited)
    elif re.search(rb"/Type\s*/Page\b", d):
        out.append({"dict": d, **ctx})


def _apply_rotation(
    boxes: List[TextBox],
    mediabox: Tuple[float, float, float, float],
    rotate: int,
) -> Tuple[List[TextBox], Tuple[float, float, float, float]]:
    """Map content coordinates to DISPLAY coordinates for ``/Rotate``
    pages (page-dict entry, inheritable; 90 = clockwise), so the margin
    filter and reading-order sort operate on what a viewer shows —
    landscape tables and rotated scans otherwise sort in a nonsense
    order.  Corner check for 90 CW: content bottom-left (0,0) lands at
    display top-left (0, W); content top-left (0,H) at display
    top-right (H, W)."""
    if rotate not in (90, 180, 270):
        return boxes, mediabox
    x0, y0, x1, y1 = mediabox
    w, h = x1 - x0, y1 - y0
    out = []
    for b in boxes:
        x, y = b.x - x0, b.y - y0
        if rotate == 90:
            nx, ny = y, w - x
        elif rotate == 180:
            nx, ny = w - x, h - y
        else:  # 270 (counter-clockwise)
            nx, ny = h - y, x
        out.append(TextBox(nx, ny, b.seq, b.text))
    if rotate in (90, 270):
        return out, (0.0, 0.0, h, w)
    return out, (0.0, 0.0, w, h)


def _pages_via_structure(pdf_bytes: bytes) -> Optional[List[str]]:
    """Page texts in page-tree order; None when structure is unusable.

    Raises :class:`EncryptedPdfError` (via ``_parse_objects``) for
    encrypted files the empty password does not open, and for encrypted
    files whose structure is unusable — the byte-order fallback cannot
    decrypt (per-object keys need object numbers a raw scan lacks), so
    falling through would re-scan ciphertext and emit an empty SUCCESS
    row, the exact silent failure the quarantine exists to prevent."""
    objs, payload_of, trailers, encrypted = _parse_objects(pdf_bytes)

    def _unusable() -> Optional[List[str]]:
        if encrypted:
            raise EncryptedPdfError(
                "encrypted PDF: document structure unusable for decryption"
            )
        return None
    # catalog discovery, most-authoritative first: (1) the parsed trailer
    # dicts — classic `trailer` keywords AND xref-stream object dicts,
    # newest first, so uncompressed CONTENT that mentions "/Root N 0 R"
    # cannot hijack the catalog and incrementally-updated xref-stream
    # files resolve without the tail-regex heuristic; (2) the legacy
    # whole-file scan for structureless writers
    catalog_num: Optional[int] = None
    for region in trailers:
        m = _ROOT_RE.search(region)
        if m:
            catalog_num = int(m.group(1))
            break
    if catalog_num is None:
        roots = _ROOT_RE.findall(pdf_bytes)
        if not roots:
            return _unusable()
        catalog_num = int(roots[-1])  # last definition wins
    if catalog_num not in objs:
        return _unusable()
    pages_num = _ref(_obj_dict(objs[catalog_num]), b"Pages")
    if pages_num is None:
        return _unusable()
    page_nodes: List[dict] = []
    _walk_page_tree(pages_num, objs, {}, page_nodes)
    if not page_nodes:
        return _unusable()

    pages: List[str] = []
    fonts_cache: dict = {}
    resolver_cache: dict = {}
    decoded_any = False
    for node in page_nodes:
        payloads = []
        for ref in _content_refs(node["dict"]):
            if ref in objs:
                p = payload_of(ref)
                if p is not None:
                    payloads.append(p)
                    decoded_any = True
                elif _find_stream_kw(objs[ref], 0) != -1:
                    # a referenced content stream that exists but fails to
                    # decode means the structure parse cannot be trusted
                    # (mis-sliced extent, unsupported filter): fall back
                    # to the byte-order scan rather than silently dropping
                    # the page — unless the file is encrypted, where the
                    # fallback would rescan ciphertext (quarantine instead)
                    return _unusable()
        # multiple content streams form ONE logical stream (spec §7.8.2);
        # a page whose text lives entirely in Form XObjects has no BT of
        # its own — only a Do — so both gate the interpreter
        data = b"\n".join(payloads)
        has_bt = b"BT" in data
        if not has_bt and b"Do" not in data:
            continue
        res = node.get("resources", b"")
        if res not in resolver_cache:
            resolver_cache[res] = _form_resolver_for(
                res, objs, payload_of, fonts_cache, resolver_cache
            )
        if not has_bt and resolver_cache[res] is None:
            # Do without any /XObject resources — or the dominant
            # scanned-corpus shape once images resolve to None — has
            # nothing to interpret; skip the font parse + token walk
            continue
        if res not in fonts_cache:  # shared Resources parse ONCE per doc
            fonts_cache[res] = _font_maps(res, objs, payload_of)
        fonts = fonts_cache[res]
        boxes = _interpret_stream(
            data, font_maps=fonts or None, form_resolver=resolver_cache[res]
        )
        if not boxes:
            continue
        boxes, page_box = _apply_rotation(
            boxes,
            node.get("mediabox", DEFAULT_MEDIABOX),
            node.get("rotate", 0),
        )
        pages.append(_assemble_page(boxes, page_box))
    # a fully-decoded structure is AUTHORITATIVE even when it yields no
    # text (e.g. image-only pages, or CID fonts without ToUnicode that
    # correctly decode to nothing) — falling back to the byte-order scan
    # here would re-decode those same streams WITHOUT font information
    # and emit garbage
    return pages if (pages or decoded_any) else _unusable()


def _pages_via_byte_order(pdf_bytes: bytes) -> List[str]:
    """Legacy fallback: every text-bearing stream in byte order is a page."""
    m = _MEDIABOX_RE.search(pdf_bytes)
    if m:
        mediabox = tuple(float(v) for v in m.groups())  # type: ignore[assignment]
    else:
        mediabox = DEFAULT_MEDIABOX

    pages: List[str] = []
    prev_end = 0
    for sm in _STREAM_RE.finditer(pdf_bytes):
        payload = sm.group(1)
        # the stream dict sits just before the `stream` keyword; clamp the
        # window at the previous stream's end so one object's /Filter
        # cannot bleed into the next header
        head_start = max(prev_end, sm.start() - 400)
        header = pdf_bytes[head_start : sm.start()]
        prev_end = sm.end()
        decoded = _decode_filters(payload, header)
        if decoded is None:
            continue
        payload = decoded
        if b"BT" not in payload:
            continue
        boxes = _interpret_stream(payload)
        if not boxes:
            continue
        pages.append(_assemble_page(boxes, mediabox))  # type: ignore[arg-type]
    return pages


def extract_pdf_pages(pdf_bytes: bytes) -> List[str]:
    """PDF bytes -> list of per-page tagged-markdown text.

    Pure function; malformed inputs produce as many pages as have
    parseable text streams (possibly zero) rather than raising.  Pages
    come in page-tree order when the document structure parses, byte
    order otherwise.

    Encrypted files (standard security handler) are decrypted in the
    structure path when the EMPTY user/owner password opens them —
    rebuilding the reference's transparent PyMuPDF decryption
    (``app/utils/utils.py:70-102``).  A password-protected or
    unsupported-handler file raises :class:`EncryptedPdfError` (the
    engine quarantines it as a FAILED row); so does an encrypted file
    whose structure is unusable, because the byte-order fallback cannot
    decrypt (per-object keys need object numbers a raw scan lacks).
    """
    structured = _pages_via_structure(pdf_bytes)
    if structured is not None:
        return structured
    # _pages_via_structure already raised for encrypted files (it owns
    # the authoritative trailer parse), so this fallback only ever sees
    # plaintext documents
    return _pages_via_byte_order(pdf_bytes)
