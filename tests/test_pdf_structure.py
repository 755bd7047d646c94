"""PDF structure robustness: page-tree-ordered traversal over scrambled
object layouts, inherited attributes, /Differences encodings, multiple
content streams, and incremental updates.

Mirrors the fidelity of the reference's S2 page iteration
(``app/utils/utils.py:70-102`` walks pages in document order via PyMuPDF;
this engine walks the page tree itself).
"""

import zlib

from deepseek_ocr_customvllm_spark.extractor.pdf_extract import extract_pdf_pages


def _obj(num: int, body: bytes) -> bytes:
    return b"%d 0 obj\n" % num + body + b"\nendobj\n"


def _content(text: str, y: int = 700) -> bytes:
    return (
        b"BT /F1 12 Tf 1 0 0 1 100 %d Tm (%s) Tj ET" % (y, text.encode("latin-1"))
    )


def _stream_obj(num: int, payload: bytes, compress: bool = False) -> bytes:
    extra = b""
    if compress:
        payload = zlib.compress(payload)
        extra = b" /Filter /FlateDecode"
    head = b"<< /Length %d%s >>\nstream\n" % (len(payload), extra)
    return _obj(num, head + payload + b"\nendstream")


def _page(contents_ref, parent: int = 2, extra: bytes = b"") -> bytes:
    if isinstance(contents_ref, list):
        refs = b"[" + b" ".join(b"%d 0 R" % r for r in contents_ref) + b"]"
    else:
        refs = b"%d 0 R" % contents_ref
    return (
        b"<< /Type /Page /Parent %d 0 R /Contents " % parent
        + refs
        + b" /Resources << /Font << /F1 9 0 R >> >>"
        + extra
        + b" >>"
    )


_FONT = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
_PAGES2 = b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 /MediaBox [0 0 612 792] >>"
_CATALOG = b"<< /Type /Catalog /Pages 2 0 R >>"


def test_reordered_objects_extract_in_page_order():
    """Streams written in REVERSE byte order must still come out as
    page 1 then page 2 (the byte-order scan would swap them)."""
    # stream objects FIRST and reversed, pages after
    pdf = b"%PDF-1.4\n"
    pdf += _stream_obj(6, _content("second page"))
    pdf += _stream_obj(5, _content("first page"))
    pdf += _obj(4, _page(6))
    pdf += _obj(3, _page(5))
    pdf += _obj(9, _FONT)
    pdf += _obj(2, _PAGES2)
    pdf += _obj(1, _CATALOG)
    pdf += b"trailer\n<< /Size 8 /Root 1 0 R >>\n%%EOF\n"
    pages = extract_pdf_pages(pdf)
    assert pages == ["first page", "second page"]


def test_nested_page_tree_and_inherited_mediabox():
    """Two-level /Pages tree; MediaBox inherited from the ROOT node so the
    margin filter still applies (content at y=5 is furniture)."""
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(
        2, b"<< /Type /Pages /Kids [10 0 R 4 0 R] /Count 3 /MediaBox [0 0 612 792] >>"
    )
    pdf += _obj(10, b"<< /Type /Pages /Parent 2 0 R /Kids [3 0 R 11 0 R] /Count 2 >>")
    pdf += _obj(3, _page(5))
    pdf += _obj(11, _page(12))
    pdf += _obj(4, _page(6))
    pdf += _stream_obj(5, _content("page one"))
    pdf += _stream_obj(
        12, _content("page two") + b" BT 1 0 0 1 300 5 Tm (furniture) Tj ET"
    )
    pdf += _stream_obj(6, _content("page three"), compress=True)
    pdf += _obj(9, _FONT)
    pdf += b"trailer\n<< /Size 13 /Root 1 0 R >>\n%%EOF\n"
    pages = extract_pdf_pages(pdf)
    assert pages == ["page one", "page two", "page three"]


def test_multiple_content_streams_form_one_page():
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(
        2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
    )
    pdf += _obj(3, _page([5, 6]))
    pdf += _stream_obj(5, _content("top half", y=700))
    pdf += _stream_obj(6, _content("bottom half", y=600))
    pdf += _obj(9, _FONT)
    pdf += b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n"
    pages = extract_pdf_pages(pdf)
    assert len(pages) == 1
    assert "top half" in pages[0] and "bottom half" in pages[0]
    assert pages[0].index("top half") < pages[0].index("bottom half")


def test_differences_encoding_remaps_codes():
    """A /Differences array remapping codes 65('A') and 66('B') must apply
    to strings shown in that font, while the base encoding covers the rest."""
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(
        2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
    )
    pdf += _obj(3, _page(5))
    pdf += _stream_obj(5, b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (AB cd) Tj ET")
    pdf += _obj(
        9,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom /Encoding 8 0 R >>",
    )
    pdf += _obj(
        8,
        b"<< /Type /Encoding /Differences [65 /eacute 66 /uni0042 67 /Z] >>",
    )
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    pages = extract_pdf_pages(pdf)
    assert pages == ["éB cd"]  # A->é (AGL), B->uni0042->B, others latin-1


def test_incremental_update_last_definition_wins():
    """An appended redefinition of the content stream (incremental update)
    must supersede the original."""
    base = b"%PDF-1.4\n"
    base += _obj(1, _CATALOG)
    base += _obj(
        2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
    )
    base += _obj(3, _page(5))
    base += _stream_obj(5, _content("old text"))
    base += _obj(9, _FONT)
    base += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    updated = base + _stream_obj(5, _content("new text")) + (
        b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_pages(base) == ["old text"]
    assert extract_pdf_pages(updated) == ["new text"]


def test_structureless_pdf_falls_back_to_byte_order():
    """No catalog at all: the legacy stream scan still extracts."""
    pdf = b"%PDF-1.4\n"
    pdf += _stream_obj(5, _content("orphan stream"))
    pdf += b"%%EOF\n"
    assert extract_pdf_pages(pdf) == ["orphan stream"]


def test_cyclic_page_tree_terminates():
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(2, b"<< /Type /Pages /Kids [2 0 R 3 0 R] /Count 1 >>")  # self-cycle
    pdf += _obj(3, _page(5))
    pdf += _stream_obj(5, _content("survivor"))
    pdf += _obj(9, _FONT)
    pdf += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    # must terminate and still find the real page (guard only prunes depth)
    assert extract_pdf_pages(pdf) == ["survivor"]


# ---------------------------------------------------------------------------
# round 3: stream extents, object streams (/ObjStm), ToUnicode CMaps
# ---------------------------------------------------------------------------


def _objstm(num: int, members, compress: bool = True) -> bytes:
    """Build a /Type /ObjStm object containing ``members`` =
    [(objnum, body_bytes)] per spec §7.5.7."""
    header_parts, bodies, off = [], [], 0
    for onum, b in members:
        header_parts.append(b"%d %d" % (onum, off))
        bodies.append(b)
        off += len(b) + 1
    header = b" ".join(header_parts) + b"\n"
    payload = header + b"\n".join(bodies)
    extra = b" /Type /ObjStm /N %d /First %d" % (len(members), len(header))
    if compress:
        data = zlib.compress(payload)
        head = b"<< /Length %d%s /Filter /FlateDecode >>\nstream\n" % (
            len(data), extra,
        )
    else:
        data = payload
        head = b"<< /Length %d%s >>\nstream\n" % (len(data), extra)
    return _obj(num, head + data + b"\nendstream")


def test_objstm_page_tree_extracts_in_order():
    """Catalog, page tree, and page dicts all packed in a compressed
    object stream (how most modern writers emit them); content streams
    stay top-level (streams cannot live inside an ObjStm)."""
    pdf = b"%PDF-1.5\n"
    pdf += _objstm(
        20,
        [
            (1, _CATALOG),
            (2, _PAGES2),
            (3, _page(5)),
            (4, _page(6)),
            (9, _FONT),
        ],
    )
    pdf += _stream_obj(6, _content("second page"), compress=True)
    pdf += _stream_obj(5, _content("first page"))
    pdf += b"trailer\n<< /Size 21 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_pages(pdf) == ["first page", "second page"]


def test_objstm_member_respects_incremental_update():
    """A top-level redefinition APPENDED AFTER the ObjStm must win over
    the ObjStm member (file-position ordering)."""
    pdf = b"%PDF-1.5\n"
    pdf += _stream_obj(5, _content("from objstm page"))
    pdf += _stream_obj(6, _content("updated page"))
    pdf += _objstm(
        20,
        [(1, _CATALOG),
         (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"),
         (3, _page(5)),
         (9, _FONT)],
        compress=False,
    )
    # incremental update: page 3 now points at stream 6
    pdf += _obj(3, _page(6))
    pdf += b"trailer\n<< /Size 21 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_pages(pdf) == ["updated page"]


def test_tounicode_bfchar_and_bfrange_simple_font():
    """1-byte ToUnicode CMap: bfchar remaps 'A'->é, bfrange remaps
    B..D -> H..J; unmapped codes keep the base encoding."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"1 beginbfchar <41> <00E9> endbfchar\n"
        b"1 beginbfrange <42> <44> <0048> endbfrange\n"
        b"endcmap end\n"
    )
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
    pdf += _obj(3, _page(5))
    pdf += _stream_obj(5, b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (ABCD x) Tj ET")
    pdf += _obj(
        9, b"<< /Type /Font /Subtype /Type1 /BaseFont /X /ToUnicode 8 0 R >>"
    )
    pdf += _stream_obj(8, cmap, compress=True)
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_pages(pdf) == ["éHIJ x"]


def test_tounicode_wins_over_differences():
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
    pdf += _obj(3, _page(5))
    pdf += _stream_obj(5, b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (AB) Tj ET")
    pdf += _obj(
        9,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /X /Encoding 7 0 R"
        b" /ToUnicode 8 0 R >>",
    )
    pdf += _obj(7, b"<< /Type /Encoding /Differences [65 /Z 66 /Q] >>")
    pdf += _stream_obj(
        8, b"1 begincodespacerange <00> <FF> endcodespacerange\n"
           b"1 beginbfchar <41> <0057> endbfchar\n"  # A -> W (overrides /Z)
    )
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    # A: ToUnicode W beats Differences Z; B: Differences fills -> Q
    assert extract_pdf_pages(pdf) == ["WQ"]


def test_type0_identity_h_two_byte_codes():
    """Composite (Type0/CID) font with a 2-byte Identity-H code space:
    codes decode through the CMap (both bfrange destination forms);
    unmapped CIDs yield nothing (they are glyph ids, not characters)."""
    cmap = (
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfchar <0001> <0048> endbfchar\n"  # -> H
        b"1 beginbfrange <0010> <0012> [<0065> <006C> <006C006F>]"
        b" endbfrange\n"  # -> e, l, lo
    )
    pdf = b"%PDF-1.5\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
    pdf += _obj(3, _page(5))
    pdf += _stream_obj(
        5, b"BT /F1 12 Tf 1 0 0 1 100 700 Tm <000100100011001200FF> Tj ET"
    )
    pdf += _obj(
        9,
        b"<< /Type /Font /Subtype /Type0 /BaseFont /X /Encoding /Identity-H"
        b" /ToUnicode 8 0 R >>",
    )
    pdf += _stream_obj(8, cmap, compress=True)
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_pages(pdf) == ["Hello"]


def test_stream_data_cannot_truncate_or_shadow_objects():
    """Stream payloads containing 'endobj' / 'N 0 obj' byte sequences:
    the extent-aware scanner must neither truncate the object nor let a
    phantom definition shadow a real one (ADVICE r02)."""
    # payload shows text containing literal ' endobj ' AND a phantom
    # redefinition of page object 3 pointing at the wrong stream
    evil = (
        b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (before endobj after) Tj ET\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n"
    )
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(2, _PAGES2)
    pdf += _obj(3, _page(5))
    pdf += _obj(4, _page(7))
    pdf += _stream_obj(5, evil)
    pdf += _stream_obj(6, _content("wrong stream"))
    pdf += _stream_obj(7, _content("second page"))
    pdf += _obj(9, _FONT)
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    pages = extract_pdf_pages(pdf)
    assert pages == ["before endobj after", "second page"]


def test_corrupt_content_stream_falls_back_to_byte_order():
    """A referenced content stream that fails to inflate must trigger the
    byte-order fallback (which then finds whatever IS parseable) instead
    of silently dropping pages."""
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
    pdf += _obj(3, _page(5))
    pdf += _obj(
        5,
        b"<< /Length 10 /Filter /FlateDecode >>\nstream\nNOTZLIB123\nendstream",
    )
    # an orphan stream the page tree does NOT reference: only the
    # byte-order scan would surface it — proving the fallback really ran
    pdf += _stream_obj(6, _content("orphan text"))
    pdf += _obj(9, _FONT)
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_pages(pdf) == ["orphan text"]


def test_flate_payload_with_embedded_keywords_roundtrips():
    """A COMPRESSED stream whose inflated text is chosen so the deflate
    bytes are opaque binary: slicing by /Length must hand zlib the exact
    extent (the old regex truncated at any 'endobj' byte coincidence —
    here we simply prove the extent path is the one in use by lying
    whitespace around the keyword)."""
    payload = _content("compressed page")
    data = zlib.compress(payload)
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
    pdf += _obj(3, _page(5))
    # no trailing EOL before endstream: extent must come from /Length
    pdf += _obj(
        5,
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data)
        + data
        + b"endstream",
    )
    pdf += _obj(9, _FONT)
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_pages(pdf) == ["compressed page"]


# ---------------------------------------------------------------------------
# round 3: glyph advance widths + TJ kerning
# ---------------------------------------------------------------------------


class TestGlyphAdvance:
    def _one_page(self, content: bytes, font: bytes) -> bytes:
        pdf = b"%PDF-1.4\n"
        pdf += _obj(1, _CATALOG)
        pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
                       b" /MediaBox [0 0 612 792] >>")
        pdf += _obj(3, _page(5))
        pdf += _stream_obj(5, content)
        pdf += _obj(9, font)
        pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
        return pdf

    def test_successive_tj_land_in_x_order(self):
        """Two Tj with no repositioning between them: the advance model
        must place the second to the RIGHT of the first (they used to
        stack at the same x and rely on seq tie-breaking)."""
        content = (
            b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (first) Tj (second) Tj ET"
        )
        font = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /X"
            b" /FirstChar 32 /Widths 8 0 R >>"
        )
        pdf = self._one_page(content, font)
        # widths array object: 95 printable-ASCII widths of 600
        pdf = pdf.replace(
            b"trailer",
            _obj(8, b"[" + b" ".join(b"600" for _ in range(95)) + b"]")
            + b"trailer",
        )
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _font_maps,
            _interpret_stream,
            _obj_dict,
            _parse_objects,
        )

        objs, _payload_of, _trailers, _encrypted = _parse_objects(pdf)
        fonts = _font_maps(_obj_dict(objs[3]), objs)  # the real page resources
        boxes = _interpret_stream(
            b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (first) Tj (second) Tj ET",
            font_maps=fonts,
        )
        assert [b.text for b in boxes] == ["first", "second"]
        # 'first' = 5 glyphs * 600/1000 * 12pt = 36pt advance
        assert boxes[0].x == 100.0 and abs(boxes[1].x - 136.0) < 1e-9
        assert extract_pdf_pages(pdf) == ["first second"]

    def test_tj_kerning_space_threshold(self):
        content = (
            b"BT /F1 12 Tf 1 0 0 1 100 700 Tm"
            b" [(Hello) -200 (world) -50 (!)] TJ ET"
        )
        pdf = self._one_page(content, _FONT)
        # -200 is a word gap -> space; -50 is a kern -> glued
        assert extract_pdf_pages(pdf) == ["Hello world!"]

    def test_cid_w_array_both_forms(self):
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _cid_widths,
        )

        objs = {
            7: b"<< /Type /Font /Subtype /CIDFontType2 /DW 750"
               b" /W [1 [500 600 700] 10 12 250] >>",
        }
        fd = b"<< /Subtype /Type0 /DescendantFonts [7 0 R] >>"
        widths, dw, _vw, _vd = _cid_widths(fd, objs)
        assert dw == 750.0
        assert widths == {1: 500.0, 2: 600.0, 3: 700.0,
                          10: 250.0, 11: 250.0, 12: 250.0}

    def test_widths_do_not_disturb_positioned_layout(self):
        """Documents that reposition before every show op (the synthetic
        corpus) must be byte-identical with or without width modeling —
        the advance only matters BETWEEN shows."""
        content = (
            b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (line one) Tj"
            b" 1 0 0 1 100 680 Tm (line two) Tj ET"
        )
        pdf = self._one_page(content, _FONT)
        assert extract_pdf_pages(pdf) == ["line one\nline two"]


# ---------------------------------------------------------------------------
# round 3: stream filter pipeline (LZW/A85/AHx/RL/predictors + chains)
# ---------------------------------------------------------------------------

import pytest  # noqa: E402
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from deepseek_ocr_customvllm_spark.extractor import pdf_extract as px  # noqa: E402


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Minimal PDF-variant LZW encoder (test twin of px._lzw_decode)."""
    table = {bytes([i]): i for i in range(256)}
    next_code, code_len = 258, 9
    out_bits = []

    def put(code):
        out_bits.append((code, code_len))

    put(256)  # clear
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
        else:
            put(table[w])
            if next_code < 4096:  # table frozen at the 12-bit cap
                table[wc] = next_code
                next_code += 1
            # the encoder grows one ADD later than the decoder checks:
            # the decoder's table lags by one add when it reads a code,
            # so "decoder next_code >= 2^len - early" aligns with
            # "encoder next_code > 2^len - early" (pdfminer-compatible)
            if next_code > (1 << code_len) - early_change and code_len < 12:
                code_len += 1
            w = bytes([b])
    if w:
        put(table[w])
    # the decoder re-checks width AFTER its final add (>= rule), so the
    # EOD code must be emitted at that width when the boundary lands
    # exactly on the last entry
    if next_code >= (1 << code_len) - early_change and code_len < 12:
        code_len += 1
    put(257)  # EOD
    buf = cnt = 0
    out = bytearray()
    for code, width in out_bits:
        buf = (buf << width) | code
        cnt += width
        while cnt >= 8:
            out.append((buf >> (cnt - 8)) & 0xFF)
            cnt -= 8
    if cnt:
        out.append((buf << (8 - cnt)) & 0xFF)
    return bytes(out)


def _rle_encode(data: bytes) -> bytes:
    """Literal-only RunLength encoding (valid, if not maximally compact)."""
    out = bytearray()
    for i in range(0, len(data), 100):
        chunk = data[i : i + 100]
        out.append(len(chunk) - 1)
        out += chunk
    out.append(128)
    return bytes(out)


def _png_predict_up(data: bytes, rowlen: int) -> bytes:
    """PNG Up (filter type 2) encoder twin of px._png_unpredict."""
    out = bytearray()
    prev = bytes(rowlen)
    for base in range(0, len(data), rowlen):
        row = data[base : base + rowlen]
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


class TestFilterPipeline:
    PAYLOAD = bytes(range(256)) * 3 + b"endobj stream endstream 7 0 obj"

    def test_lzw_roundtrip(self):
        assert px._lzw_decode(_lzw_encode(self.PAYLOAD)) == self.PAYLOAD

    def test_runlength_roundtrip(self):
        assert px._runlength_decode(_rle_encode(self.PAYLOAD)) == self.PAYLOAD
        # repeat form: 257-250=7 copies of 'x', then EOD
        assert px._runlength_decode(bytes([250]) + b"x" + bytes([128])) == b"x" * 7

    def test_asciihex_and_ascii85_roundtrip(self):
        import base64

        hx = self.PAYLOAD.hex().encode() + b">"
        assert px._asciihex_decode(hx) == self.PAYLOAD
        a85 = base64.a85encode(self.PAYLOAD) + b"~>"
        assert px._ascii85_decode(a85) == self.PAYLOAD

    def test_png_up_predictor_roundtrip(self):
        import zlib as z

        data = bytes((i * 7 + 3) & 0xFF for i in range(24 * 10))
        pred = _png_predict_up(data, 24)
        dict_bytes = b"<< /Predictor 12 /Columns 24 >>"
        assert px._png_unpredict(pred, dict_bytes) == data
        # and through _decode_filters with Flate on top
        body = b"/Filter /FlateDecode /Predictor 12 /Columns 24"
        assert px._decode_filters(z.compress(pred), body) == data

    @pytest.mark.parametrize(
        "filt,encode",
        [
            (b"/LZWDecode", _lzw_encode),
            (b"/RunLengthDecode", _rle_encode),
            (b"/ASCIIHexDecode", lambda d: d.hex().encode() + b">"),
            (b"/ASCII85Decode",
             lambda d: __import__("base64").a85encode(d) + b"~>"),
        ],
        ids=["lzw", "rle", "ahx", "a85"],
    )
    def test_page_extracts_through_filter(self, filt, encode):
        payload = encode(_content("filtered page"))
        pdf = b"%PDF-1.4\n"
        pdf += _obj(1, _CATALOG)
        pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
                       b" /MediaBox [0 0 612 792] >>")
        pdf += _obj(3, _page(5))
        pdf += _obj(
            5,
            b"<< /Length %d /Filter %s >>\nstream\n" % (len(payload), filt)
            + payload + b"\nendstream",
        )
        pdf += _obj(9, _FONT)
        pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
        assert extract_pdf_pages(pdf) == ["filtered page"]

    def test_filter_chain_a85_then_flate(self):
        """[/ASCII85Decode /FlateDecode]: decode order is array order —
        the classic email-safe wrapping of a compressed stream."""
        import base64
        import zlib as z

        payload = base64.a85encode(z.compress(_content("chained page"))) + b"~>"
        pdf = b"%PDF-1.4\n"
        pdf += _obj(1, _CATALOG)
        pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
                       b" /MediaBox [0 0 612 792] >>")
        pdf += _obj(3, _page(5))
        pdf += _obj(
            5,
            b"<< /Length %d /Filter [/ASCII85Decode /FlateDecode] >>\nstream\n"
            % len(payload) + payload + b"\nendstream",
        )
        pdf += _obj(9, _FONT)
        pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
        assert extract_pdf_pages(pdf) == ["chained page"]

    def test_image_codec_filters_return_none(self):
        assert px._decode_filters(b"\xff\xd8\xff", b"/Filter /DCTDecode") is None
        assert px._decode_filters(b"x", b"/Filter [/FlateDecode /JBIG2Decode]") is None

    @given(st.binary(min_size=0, max_size=4000))
    @settings(max_examples=80, deadline=None)
    def test_lzw_roundtrip_fuzz(self, data):
        assert px._lzw_decode(_lzw_encode(data)) == data

    def test_lzw_code_width_boundaries(self):
        """Every length around the 9→10 and 10→11 bit switches, both
        EarlyChange values, plus a corpus that exhausts the 12-bit table
        (frozen, not overflowed).  Random incompressible bytes make adds
        ≈ length, so the sweep crosses each boundary exactly."""
        import random

        rng = random.Random(7)
        sizes = list(range(245, 270)) + list(range(500, 530)) + [8000, 20000]
        for n in sizes:
            data = bytes(rng.randrange(256) for _ in range(n))
            for ec in (0, 1):
                assert px._lzw_decode(_lzw_encode(data, ec), ec) == data, (n, ec)
        big = (b"the quick brown fox jumps " * 40 + bytes(range(256))) * 60
        assert px._lzw_decode(_lzw_encode(big)) == big


# ---------------------------------------------------------------------------
# hypothesis: random document layouts
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _random_pdf(draw):
    """A random multi-page PDF: arbitrary object order, optional per-page
    compression, 1-4 pages of plain text; returns (pdf_bytes, expected)."""
    n_pages = draw(st.integers(1, 4))
    texts = [
        draw(st.text(alphabet="abcDEF 123", min_size=1, max_size=20)).strip() or "x"
        for _ in range(n_pages)
    ]
    # each page's content stream gets a random filter (or none)
    import base64 as _b64

    def _filtered_stream(num, payload, kind):
        encoders = {
            "none": (None, payload),
            "flate": (b"/FlateDecode", zlib.compress(payload)),
            "lzw": (b"/LZWDecode", _lzw_encode(payload)),
            "a85": (b"/ASCII85Decode", _b64.a85encode(payload) + b"~>"),
            "ahx": (b"/ASCIIHexDecode", payload.hex().encode() + b">"),
            "rl": (b"/RunLengthDecode", _rle_encode(payload)),
            "a85+flate": (b"[/ASCII85Decode /FlateDecode]",
                          _b64.a85encode(zlib.compress(payload)) + b"~>"),
        }
        filt, data = encoders[kind]
        extra = b" /Filter " + filt if filt else b""
        head = b"<< /Length %d%s >>\nstream\n" % (len(data), extra)
        return _obj(num, head + data + b"\nendstream")

    kinds = [
        draw(st.sampled_from(
            ["none", "flate", "lzw", "a85", "ahx", "rl", "a85+flate"]
        ))
        for _ in range(n_pages)
    ]
    page_objs = []   # (num, body)
    stream_objs = []
    for k in range(n_pages):
        page_num, stream_num = 10 + k, 50 + k
        page_objs.append((page_num, _page(stream_num)))
        stream_objs.append(
            (stream_num, _filtered_stream(stream_num, _content(texts[k]), kinds[k]))
        )
    kids = " ".join(f"{10 + k} 0 R" for k in range(n_pages))
    dict_objs = [
        (1, _CATALOG),
        (2,
         b"<< /Type /Pages /Kids [" + kids.encode() + b"] /Count %d"
         b" /MediaBox [0 0 612 792] >>" % n_pages),
        (9, _FONT),
    ] + page_objs
    if draw(st.booleans()):
        # modern layout: every dict object lives in one object stream
        members = draw(st.permutations(dict_objs))
        fixed = [(20, _objstm(20, list(members), compress=draw(st.booleans())))]
    else:
        fixed = [(n, _obj(n, b_)) for n, b_ in dict_objs]
    fixed += [(n, s) for n, s in stream_objs]
    order = draw(st.permutations(fixed))
    pdf = b"%PDF-1.4\n" + b"".join(body for _, body in order)
    pdf += b"trailer\n<< /Size 99 /Root 1 0 R >>\n%%EOF\n"
    return pdf, texts


@given(_random_pdf())
@settings(max_examples=60, deadline=None)
def test_random_layouts_extract_in_page_order(case):
    pdf, texts = case
    assert extract_pdf_pages(pdf) == texts


class TestSpacingParamsAndInlineImages:
    def test_tc_tw_tz_affect_advance(self):
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _interpret_stream,
        )

        # 2pt char spacing on 4 glyphs + 1pt word spacing on 1 space,
        # 200% horizontal scale; default width 500/1000em at 10pt
        content = (
            b"BT /F1 10 Tf 2 Tc 1 Tw 200 Tz 1 0 0 1 100 700 Tm"
            b" (a b) Tj (c) Tj ET"
        )
        boxes = _interpret_stream(content)
        # 'a b': 3 glyphs * 5pt + 3*2 Tc + 1*1 Tw = 22pt, x2 scale = 44
        assert boxes[0].x == 100.0
        assert abs(boxes[1].x - 144.0) < 1e-9

    def test_quote_op_sets_spacing(self):
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _interpret_stream,
        )

        content = (
            b'BT /F1 10 Tf 14 TL 1 0 0 1 100 700 Tm'
            b' 3 2 (ab) " (c) Tj ET'
        )
        boxes = _interpret_stream(content)
        assert [b.text for b in boxes] == ["ab", "c"]
        # after ": 2 glyphs*5 + 2*2 Tc = 14pt (no space in 'ab')
        assert abs(boxes[1].x - 114.0) < 1e-9

    def test_inline_image_binary_does_not_desync(self):
        """A BI..ID..EI inline image whose binary payload contains '('
        and 'Tj'-looking bytes must be skipped wholesale."""
        binary = b"\x00(\xff Tj (fake) Tj \x01\x02EI_not_end\x03"
        content = (
            b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (before) Tj ET\n"
            b"BI /W 4 /H 4 /BPC 8 /CS /G ID " + binary + b" EI\n"
            b"BT /F1 12 Tf 1 0 0 1 100 680 Tm (after) Tj ET"
        )
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _interpret_stream,
        )

        boxes = _interpret_stream(content)
        assert [b.text for b in boxes] == ["before", "after"]


class TestReviewRegressions:
    """Round-3 self-review findings, pinned."""

    def test_indirect_multidigit_length_not_misparsed(self):
        """'/Length 123 0 R' must NOT match as direct length '12'
        (regex backtracking through the lookahead)."""
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _LENGTH_DIRECT_RE,
        )

        assert _LENGTH_DIRECT_RE.search(b"/Length 123 0 R") is None
        m = _LENGTH_DIRECT_RE.search(b"/Length 123 >>")
        assert m and m.group(1) == b"123"

    def test_indirect_length_stream_with_endstream_bytes(self):
        """Indirect /Length + uncompressed payload containing the word
        'endstream'-adjacent text: the extent falls back to the search
        but the object map stays aligned for FOLLOWING objects."""
        payload = _content("page body")  # no embedded keywords needed
        pdf = b"%PDF-1.4\n"
        pdf += _obj(1, _CATALOG)
        pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
                       b" /MediaBox [0 0 612 792] >>")
        pdf += _obj(3, _page(5))
        pdf += _obj(
            5,
            b"<< /Length 6 0 R >>\nstream\n" + payload + b"\nendstream",
        )
        pdf += _obj(6, b"%d" % len(payload))
        pdf += _obj(9, _FONT)
        pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
        assert extract_pdf_pages(pdf) == ["page body"]

    def test_type0_without_tounicode_decodes_to_nothing(self):
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _interpret_stream,
        )

        fonts = {"F1": {"code_width": 2, "cmap": None,
                        "widths": {1: 600.0}, "default_w": 1000.0}}
        boxes = _interpret_stream(
            b"BT /F1 12 Tf 1 0 0 1 100 700 Tm <00480065> Tj ET",
            font_maps=fonts,
        )
        assert boxes == []  # no NUL-laced garbage in the corpus

    def test_lone_cr_after_stream_keyword(self):
        payload = zlib.compress(_content("cr page"))
        pdf = b"%PDF-1.4\n"
        pdf += _obj(1, _CATALOG)
        pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
                       b" /MediaBox [0 0 612 792] >>")
        pdf += _obj(3, _page(5))
        pdf += _obj(
            5,
            b"<< /Length %d /Filter /FlateDecode >>\nstream\r" % len(payload)
            + payload + b"\nendstream",
        )
        pdf += _obj(9, _FONT)
        pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
        assert extract_pdf_pages(pdf) == ["cr page"]


def test_root_mention_in_content_does_not_hijack_catalog():
    """An uncompressed content stream whose TEXT contains '/Root 99 0 R'
    after the trailer region must not redirect the catalog lookup."""
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
                   b" /MediaBox [0 0 612 792] >>")
    pdf += _obj(3, _page(5))
    pdf += _stream_obj(
        5, b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (mentions /Root 99 0 R) Tj ET"
    )
    pdf += _obj(9, _FONT)
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_pages(pdf) == ["mentions /Root 99 0 R"]


class TestThirdReviewRegressions:
    def test_type0_with_only_dw_decodes_to_nothing_via_font_maps(self):
        """A Type0 font whose descendant has only /DW (no /W, no
        /ToUnicode) must still be MAPPED so its 2-byte CIDs decode to
        nothing — not fall through to the latin-1 byte decode."""
        pdf = b"%PDF-1.5\n"
        pdf += _obj(1, _CATALOG)
        pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
                       b" /MediaBox [0 0 612 792] >>")
        pdf += _obj(3, _page(5))
        pdf += _stream_obj(
            5, b"BT /F1 12 Tf 1 0 0 1 100 700 Tm <00480065006C006C006F> Tj ET"
        )
        pdf += _obj(
            9,
            b"<< /Type /Font /Subtype /Type0 /BaseFont /X"
            b" /Encoding /Identity-H /DescendantFonts [8 0 R] >>",
        )
        pdf += _obj(8, b"<< /Type /Font /Subtype /CIDFontType2 /DW 600 >>")
        pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
        assert extract_pdf_pages(pdf) == []  # nothing, never NUL garbage

    def test_tj_space_collapses_with_decoded_spaces(self):
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _interpret_stream,
        )

        cases = {
            b"[(Hello ) -250 (world)] TJ": "Hello world",
            b"[(Hi) -250 ( there)] TJ": "Hi there",
            b"[(a) -250 (b)] TJ": "a b",
        }
        for arr, want in cases.items():
            boxes = _interpret_stream(
                b"BT /F1 12 Tf 1 0 0 1 100 700 Tm " + arr + b" ET"
            )
            assert boxes[0].text == want, arr

    def test_encrypted_xref_stream_pdf_with_big_tail_detected(self):
        from deepseek_ocr_customvllm_spark.extractor.engine import (
            _is_encrypted_pdf,
        )

        # xref-STREAM file (no 'trailer' keyword): /Encrypt lives in the
        # xref object's dict, followed by >2 KiB of stream data
        xref_off = 20
        body = b"%PDF-1.6\npad bytes\n"
        body += (b"7 0 obj\n<< /Type /XRef /Size 9 /Root 1 0 R"
                 b" /Encrypt 5 0 R /Length 4000 >>\nstream\n")
        body += b"\x00" * 4000 + b"\nendstream\nendobj\n"
        body += b"startxref\n%d\n%%%%EOF\n" % xref_off
        assert _is_encrypted_pdf(body) is True
        # same layout, not encrypted
        clean = body.replace(b" /Encrypt 5 0 R", b"")
        assert _is_encrypted_pdf(clean) is False


class TestXrefStreamTrailer:
    """PDF 1.5+ cross-reference STREAMS as the trailer dictionary: /Root
    (and /Encrypt) resolve by following startxref to the xref-stream
    object's dict and its /Prev chain — no tail-regex heuristic."""

    @staticmethod
    def _xref_obj(num, off_marker, root_ref, prev=None):
        payload = zlib.compress(b"\x00\x01\x02")  # xref data itself unused
        d = b"<< /Type /XRef /Size 32 /W [1 2 1] /Root %d 0 R" % root_ref
        if prev is not None:
            d += b" /Prev %d" % prev
        d += b" /Filter /FlateDecode /Length %d >>" % len(payload)
        return (
            b"%d 0 obj\n" % num + d + b"\nstream\n" + payload
            + b"\nendstream\nendobj\n"
        )

    def _base_doc(self, catalog_num, content_obj, text):
        pdf = b"%PDF-1.5\n"
        pdf += _obj(catalog_num, b"<< /Type /Catalog /Pages 2 0 R >>")
        pdf += _obj(
            2,
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
        )
        pdf += _obj(3, _page(content_obj))
        pdf += _stream_obj(content_obj, _content(text))
        pdf += _obj(9, _FONT)
        return pdf

    def test_xref_stream_only_file_resolves_root(self):
        """No `trailer` keyword anywhere; /Root only in the xref-stream
        dict.  A decoy '/Root 99 0 R' in page CONTENT must not hijack."""
        pdf = self._base_doc(1, 5, "true catalog /Root 99 0 R decoy")
        xref_off = len(pdf)
        pdf += self._xref_obj(20, xref_off, root_ref=1)
        pdf += b"startxref\n%d\n%%%%EOF\n" % xref_off
        assert b"trailer" not in pdf
        assert extract_pdf_pages(pdf) == ["true catalog /Root 99 0 R decoy"]

    def test_incremental_update_newest_xref_stream_root_wins(self):
        """An appended update adds catalog 11 -> page 13 and a new xref
        stream whose /Prev links the original; startxref points at the
        NEW one, so its /Root must win over the superseded catalog."""
        pdf = self._base_doc(1, 5, "ORIGINAL page")
        xref1_off = len(pdf)
        pdf += self._xref_obj(20, xref1_off, root_ref=1)
        pdf += b"startxref\n%d\n%%%%EOF\n" % xref1_off
        # incremental update: new catalog/pages/page/content + xref stream
        pdf += _obj(11, b"<< /Type /Catalog /Pages 12 0 R >>")
        pdf += _obj(
            12,
            b"<< /Type /Pages /Kids [13 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
        )
        pdf += _obj(
            13,
            b"<< /Type /Page /Parent 12 0 R /Contents 15 0 R"
            b" /Resources << /Font << /F1 9 0 R >> >> >>",
        )
        pdf += _stream_obj(15, _content("UPDATED page"))
        xref2_off = len(pdf)
        pdf += self._xref_obj(21, xref2_off, root_ref=11, prev=xref1_off)
        pdf += b"startxref\n%d\n%%%%EOF\n" % xref2_off
        assert extract_pdf_pages(pdf) == ["UPDATED page"]

    def test_hybrid_file_prefers_startxref_chain(self):
        """A file with BOTH a stale classic trailer (old /Root) and a
        newer xref stream: the startxref chain is the active table."""
        pdf = self._base_doc(1, 5, "old catalog page")
        pdf += b"trailer\n<< /Size 30 /Root 1 0 R >>\n"
        pdf += _obj(11, b"<< /Type /Catalog /Pages 12 0 R >>")
        pdf += _obj(
            12,
            b"<< /Type /Pages /Kids [13 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
        )
        pdf += _obj(
            13,
            b"<< /Type /Page /Parent 12 0 R /Contents 15 0 R"
            b" /Resources << /Font << /F1 9 0 R >> >> >>",
        )
        pdf += _stream_obj(15, _content("new catalog page"))
        xref_off = len(pdf)
        pdf += self._xref_obj(21, xref_off, root_ref=11)
        pdf += b"startxref\n%d\n%%%%EOF\n" % xref_off
        assert extract_pdf_pages(pdf) == ["new catalog page"]

    def test_classic_trailer_still_wins_when_startxref_points_at_table(self):
        """Classic files: startxref aims at an `xref` TABLE (not an object
        header), so the trailer-keyword path must still resolve /Root."""
        pdf = self._base_doc(1, 5, "classic file")
        xref_off = len(pdf)
        pdf += b"xref\n0 6\n" + b"0000000000 65535 f \n" * 6
        pdf += b"trailer\n<< /Size 6 /Root 1 0 R >>\n"
        pdf += b"startxref\n%d\n%%%%EOF\n" % xref_off
        assert extract_pdf_pages(pdf) == ["classic file"]


class TestBaseEncodings:
    """Simple-font base encodings (spec Appendix D): /WinAnsiEncoding
    (cp1252 — curly quotes, dashes, € in 0x80-0x9F) and
    /MacRomanEncoding (full 0x80-0xFF remap), with /Differences taking
    precedence over the base and /ToUnicode over both."""

    def _doc(self, font_body, content):
        pdf = b"%PDF-1.4\n"
        pdf += _obj(1, _CATALOG)
        pdf += _obj(
            2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
        )
        pdf += _obj(3, _page(5))
        pdf += _stream_obj(5, content)
        pdf += _obj(9, font_body)
        pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
        return pdf

    def test_winansi_curly_quotes_and_dashes(self):
        font = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>"
        )
        # 0x93/0x94 curly double quotes, 0x96 en-dash, 0x85 ellipsis
        content = (
            b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (\x93quoted\x94 \x96 more\x85) Tj ET"
        )
        assert extract_pdf_pages(self._doc(font, content)) == [
            "“quoted” – more…"
        ]

    def test_macroman_accents(self):
        font = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /MacRomanEncoding >>"
        )
        # MacRoman 0x8E = é, 0xA5 = • (latin-1 would say Ž and ¥)
        content = b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (caf\x8e \xa5 list) Tj ET"
        assert extract_pdf_pages(self._doc(font, content)) == ["caf\xe9 • list"]

    def test_base_encoding_dict_with_differences_precedence(self):
        """/BaseEncoding in an encoding DICT, /Differences overriding one
        code: the difference wins over the base table."""
        font = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom"
            b" /Encoding 8 0 R >>"
        )
        pdf = self._doc(
            font,
            b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (\x93X\x94) Tj ET",
        ).replace(
            b"trailer",
            _obj(
                8,
                b"<< /Type /Encoding /BaseEncoding /WinAnsiEncoding"
                b" /Differences [147 /bullet] >>",
            )
            + b"trailer",
        )
        # 0x93 (147) remapped to bullet by Differences; 0x94 stays cp1252
        assert extract_pdf_pages(pdf) == ["•X”"]

    def test_unencoded_font_keeps_latin1_default(self):
        font = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        content = b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (plain \xe9) Tj ET"
        assert extract_pdf_pages(self._doc(font, content)) == ["plain \xe9"]


def test_expanded_glyph_names_decode():
    """Round-4 AGL expansion: ligatures, uppercase accents, and common
    symbol names in a /Differences array decode to their characters."""
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(
        2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
    )
    pdf += _obj(3, _page(5))
    pdf += _stream_obj(5, b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (ABCDE) Tj ET")
    pdf += _obj(
        9, b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom /Encoding 8 0 R >>"
    )
    pdf += _obj(
        8,
        b"<< /Type /Encoding /Differences"
        b" [65 /fi 66 /Eacute 67 /copyright 68 /onehalf 69 /guillemotleft] >>",
    )
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_pages(pdf) == ["ﬁ\xc9\xa9\xbd\xab"]


class TestPageRotation:
    """/Rotate (inheritable, 90 = clockwise): the margin filter and
    reading-order sort run in DISPLAY coordinates, so rotated landscape
    pages come out in visual reading order."""

    def _rot_doc(self, rotate_on, rotate_val=90):
        # two lines written in ROTATED content coords: for a /Rotate 90
        # page the writer puts visual-top text at LOW x (content coords),
        # visual-left at HIGH y.  display: dx = y, dy = W - x.
        # line A (visual top): content x=100 -> dy = 612-100 = 512
        # line B (visual lower): content x=200 -> dy = 412
        # both centered-ish: y in [100, 500] -> dx spread (same line order)
        content = (
            b"BT /F1 12 Tf 1 0 0 1 200 450 Tm (line B) Tj"
            b" 1 0 0 1 100 100 Tm (second on A) Tj"
            b" 1 0 0 1 100 440 Tm (first on A) Tj ET"
        )
        page_extra = b" /Rotate %d" % rotate_val if rotate_on == "page" else b""
        pages_extra = b" /Rotate %d" % rotate_val if rotate_on == "tree" else b""
        pdf = b"%PDF-1.4\n"
        pdf += _obj(1, _CATALOG)
        pdf += _obj(
            2,
            b"<< /Type /Pages /Kids [3 0 R] /Count 1"
            b" /MediaBox [0 0 612 792]" + pages_extra + b" >>",
        )
        pdf += _obj(3, _page(5, extra=page_extra))
        pdf += _stream_obj(5, content)
        pdf += _obj(9, _FONT)
        pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
        return pdf

    def test_rotate_90_reading_order(self):
        # display mapping (90 CW): dx = y, dy = W - x.  Content x=100
        # boxes land on display row dy=512: ("second on A", y=100 ->
        # dx=100) then ("first on A", y=440 -> dx=440), left-to-right.
        # Content x=200 ("line B") lands below at dy=412.
        pages = extract_pdf_pages(self._rot_doc("page"))
        assert pages == ["second on A first on A\n\nline B"]

    def test_rotate_inherited_from_pages_node(self):
        assert extract_pdf_pages(self._rot_doc("tree")) == extract_pdf_pages(
            self._rot_doc("page")
        )

    def test_rotate_0_unchanged(self):
        """No /Rotate: content coords are display coords; the same
        content sorts by raw y DESC."""
        pages = extract_pdf_pages(self._rot_doc("none"))
        # y=450 and y=440 are distinct baselines in the same paragraph
        # (gap 10 < PARA_GAP_PT); the drop to y=100 is a paragraph break
        assert pages == ["line B\nfirst on A\n\nsecond on A"]

    def test_rotate_180(self):
        pages = extract_pdf_pages(self._rot_doc("page", rotate_val=180))
        # 180: dy = H - y -> content y=100 is display TOP (dy=692)
        assert pages[0].startswith("second on A")


def test_rotated_tm_with_relative_advance_on_rotated_page():
    """The dominant real-world /Rotate 90 pattern: text written under a
    rotated text matrix ([0 1 -1 0]) with T* line advance.  The
    interpreter tracks the matrix (line moves along (c,d), glyph
    advances along (a,b)), so boxes are TRUE content coordinates and the
    display remap restores visual reading order."""
    content = (
        b"BT /F1 12 Tf 14 TL 0 1 -1 0 500 100 Tm"
        b" (line one) Tj T* (line two) Tj T* (line three) Tj ET"
    )
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(
        2,
        b"<< /Type /Pages /Kids [3 0 R] /Count 1"
        b" /MediaBox [0 0 612 792] >>",
    )
    pdf += _obj(3, _page(5, extra=b" /Rotate 90"))
    pdf += _stream_obj(5, content)
    pdf += _obj(9, _FONT)
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_pages(pdf) == ["line one\nline two\nline three"]
    # WITHOUT /Rotate the same content is sideways text on a portrait
    # page: the three columns share one display height (y=100) and read
    # as a single row left-to-right — geometrically correct either way
    plain = pdf.replace(b" /Rotate 90", b"")
    assert extract_pdf_pages(plain) == ["line one line two line three"]


def test_macroman_appendix_d_deviations():
    """0xDB decodes per Appendix D (/currency), and the Apple-logo code
    0xF0 must NOT inject a Private-Use-Area character."""
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /MacRomanEncoding >>"
    )
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(
        2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
    )
    pdf += _obj(3, _page(5))
    pdf += _stream_obj(5, b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (\xdbX\xf0Y) Tj ET")
    pdf += _obj(9, font)
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    out = extract_pdf_pages(pdf)
    assert out[0].startswith("\xa4X")  # currency sign, not euro
    assert "" not in out[0]  # no Apple-logo PUA char


def test_ts_superscript_stays_on_its_line():
    """Text rise (Ts, §9.3.7) is a rendering offset — the tracked
    baseline ignores it, so a superscript shown with Ts groups with its
    line instead of splitting past LINE_TOL_PT."""
    content = (
        b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (E=mc) Tj"
        b" 5 Ts (2) Tj 0 Ts (done) Tj ET"
    )
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(
        2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
    )
    pdf += _obj(3, _page(5))
    pdf += _stream_obj(5, content)
    pdf += _obj(9, _FONT)
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    pages = extract_pdf_pages(pdf)
    assert len(pages) == 1 and "\n" not in pages[0]
    assert pages[0] == "E=mc 2 done"  # three boxes joined by single spaces


def test_rotation_composition_property():
    """Applying the 90-degree display map twice equals the 180 map —
    pinned over a deterministic box grid (the transform algebra cannot
    drift per-angle)."""
    from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
        TextBox,
        _apply_rotation,
    )

    mb = (0.0, 0.0, 612.0, 792.0)
    boxes = [
        TextBox(30.0 * i + 7, 40.0 * j + 11, i * 10 + j, f"b{i}{j}")
        for i in range(5)
        for j in range(5)
    ]
    once, mb90 = _apply_rotation(boxes, mb, 90)
    twice, mb2 = _apply_rotation(once, mb90, 90)
    direct, mb180 = _apply_rotation(boxes, mb, 180)
    assert mb2 == mb180
    for a, b in zip(twice, direct):
        assert abs(a.x - b.x) < 1e-9 and abs(a.y - b.y) < 1e-9
        assert a.text == b.text
    # and 90 then 270 is the identity
    back, mb_id = _apply_rotation(once, mb90, 270)
    assert mb_id == mb
    for a, b in zip(back, boxes):
        assert abs(a.x - b.x) < 1e-9 and abs(a.y - b.y) < 1e-9


def test_malformed_tm_operands_skip_the_op():
    """Garbage operands in a Tm (strings where numbers belong, in ANY of
    the six slots) must skip the op, not fail the document."""
    content = (
        b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (before) Tj"
        b" 1 0 0 1 (x) (y) Tm (after) Tj ET"
    )
    pdf = b"%PDF-1.4\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(
        2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"
    )
    pdf += _obj(3, _page(5))
    pdf += _stream_obj(5, content)
    pdf += _obj(9, _FONT)
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    pages = extract_pdf_pages(pdf)
    assert len(pages) == 1
    assert "before" in pages[0] and "after" in pages[0]


class TestFormXObjectsAndCTM:
    """Form XObjects (/Do, spec 8.10) and graphics-state CTM tracking
    (cm + q/Q): reusable content — letterheads, or ALL the page text in
    some generators — must extract at its viewer-visible position."""

    def _form_obj(self, num, body, extra=b""):
        return (
            b"%d 0 obj\n<< /Type /XObject /Subtype /Form /Length %d%s >>"
            b"\nstream\n" % (num, len(body), extra)
            + body
            + b"\nendstream\nendobj\n"
        )

    def _doc(self, page_content, extra_objs=b"", xobjects=b""):
        pdf = b"%PDF-1.4\n"
        pdf += _obj(1, _CATALOG)
        pdf += _obj(
            2,
            b"<< /Type /Pages /Kids [3 0 R] /Count 1"
            b" /MediaBox [0 0 612 792] >>",
        )
        pdf += _obj(
            3,
            b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R"
            b" /Resources << /Font << /F1 9 0 R >>" + xobjects + b" >> >>",
        )
        pdf += _stream_obj(5, page_content)
        pdf += _obj(9, _FONT)
        pdf += extra_objs
        pdf += b"trailer\n<< /Size 20 /Root 1 0 R >>\n%%EOF\n"
        return pdf

    def test_form_text_extracts_in_document_order(self):
        form = self._form_obj(
            7, b"BT /F1 12 Tf 1 0 0 1 100 650 Tm (from the form) Tj ET"
        )
        page = (
            b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (page text) Tj ET /Fm1 Do"
        )
        pdf = self._doc(page, form, b" /XObject << /Fm1 7 0 R >>")
        assert extract_pdf_pages(pdf) == ["page text\n\nfrom the form"]

    def test_cm_translation_positions_form_text(self):
        """The form draws at y=0 (margin filter would drop it); the cm
        translation must lift it into the page body."""
        form = self._form_obj(
            7, b"BT /F1 12 Tf 1 0 0 1 100 0 Tm (lifted by cm) Tj ET"
        )
        page = b"q 1 0 0 1 0 400 cm /Fm1 Do Q"
        pdf = self._doc(page, form, b" /XObject << /Fm1 7 0 R >>")
        assert extract_pdf_pages(pdf) == ["lifted by cm"]

    def test_q_restores_ctm_after_form(self):
        """A cm inside q..Q must not leak into later page text."""
        form = self._form_obj(
            7, b"BT /F1 12 Tf 1 0 0 1 100 0 Tm (shifted) Tj ET"
        )
        page = (
            b"q 1 0 0 1 0 600 cm /Fm1 Do Q"
            b" BT /F1 12 Tf 1 0 0 1 100 700 Tm (unshifted after Q) Tj ET"
        )
        pdf = self._doc(page, form, b" /XObject << /Fm1 7 0 R >>")
        # unshifted text at y=700 sorts ABOVE the form text at y=600
        assert extract_pdf_pages(pdf) == ["unshifted after Q\n\nshifted"]

    def test_form_matrix_applies(self):
        form = self._form_obj(
            7,
            b"BT /F1 12 Tf 1 0 0 1 100 0 Tm (via matrix) Tj ET",
            b" /Matrix [1 0 0 1 0 500]",
        )
        page = b"/Fm1 Do"
        pdf = self._doc(page, form, b" /XObject << /Fm1 7 0 R >>")
        assert extract_pdf_pages(pdf) == ["via matrix"]

    def test_form_only_page_with_own_font_resources(self):
        """No BT in the page stream at all; the form carries its own
        /Resources with a /Differences font that must apply."""
        form = self._form_obj(
            7,
            b"BT /F2 12 Tf 1 0 0 1 100 700 Tm (AZ) Tj ET",
            b" /Resources << /Font << /F2 11 0 R >> >>",
        )
        font2 = _obj(
            11,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom"
            b" /Encoding 12 0 R >>",
        ) + _obj(12, b"<< /Type /Encoding /Differences [65 /bullet] >>")
        pdf = self._doc(b"/Fm1 Do", form + font2, b" /XObject << /Fm1 7 0 R >>")
        assert extract_pdf_pages(pdf) == ["•Z"]

    def test_recursive_form_terminates(self):
        """A form that invokes itself must hit the depth guard, not
        recurse forever."""
        form = self._form_obj(
            7,
            b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (once) Tj ET /Fm1 Do",
            b" /Resources << /Font << /F1 9 0 R >>"
            b" /XObject << /Fm1 7 0 R >> >>",
        )
        pdf = self._doc(b"/Fm1 Do", form, b" /XObject << /Fm1 7 0 R >>")
        pages = extract_pdf_pages(pdf)
        assert len(pages) == 1
        assert pages[0].count("once") == 8  # depth guard: bounded


class TestFormReviewRegressions:
    """Fifth review pass on the forms/CTM diff: work budget, indirect
    /Resources, PDF-name chars, text-state inheritance, /BBox clipping,
    and full q/Q graphics-state restore."""

    _F = TestFormXObjectsAndCTM()

    def test_exponential_form_chain_is_work_capped(self):
        """A chain of forms each invoking the next 6 times is k^depth
        interpretations under a depth-only cap; the per-page Do budget
        must bound total work from a few-KB hostile file."""
        import time

        chain = b""
        for level in range(12):
            if level == 11:
                body = b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (leaf) Tj ET"
            else:
                body = b" ".join(b"/Fm%d Do" % (level + 1) for _ in range(6))
            chain += self._F._form_obj(
                20 + level, body,
                b" /Resources << /Font << /F1 9 0 R >> /XObject <<"
                + b" ".join(
                    b"/Fm%d %d 0 R" % (n, 20 + n) for n in range(12)
                )
                + b" >> >>",
            )
        pdf = self._F._doc(
            b"/Fm0 Do", chain,
            b" /XObject << /Fm0 20 0 R >>",
        )
        t0 = time.time()
        pages = extract_pdf_pages(pdf)
        assert time.time() - t0 < 5, "form amplification not bounded"
        # bounded output: at most the Do budget worth of leaves
        assert sum(p.count("leaf") for p in pages) <= 256

    def test_indirect_form_resources_win(self):
        """/Resources as an INDIRECT ref on the form must still beat the
        page's fonts (the /Differences bullet proves which map won)."""
        form = self._F._form_obj(
            7,
            b"BT /F2 12 Tf 1 0 0 1 100 700 Tm (AZ) Tj ET",
            b" /Resources 10 0 R",
        )
        extra = form + _obj(
            10, b"<< /Font << /F2 11 0 R >> >>"
        ) + _obj(
            11,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom"
            b" /Encoding 12 0 R >>",
        ) + _obj(12, b"<< /Type /Encoding /Differences [65 /bullet] >>")
        pdf = self._F._doc(b"/Fm1 Do", extra, b" /XObject << /Fm1 7 0 R >>")
        assert extract_pdf_pages(pdf) == ["•Z"]

    def test_xobject_name_with_hyphen_resolves(self):
        form = self._F._form_obj(
            7, b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (dashed name) Tj ET"
        )
        pdf = self._F._doc(b"/Fm-1 Do", form, b" /XObject << /Fm-1 7 0 R >>")
        assert extract_pdf_pages(pdf) == ["dashed name"]

    def test_form_inherits_invoker_text_state(self):
        """Tf set on the PAGE carries into a form that sets none (Do
        preserves the graphics state, spec 8.10.2): the page font's
        /Differences map must decode the form's string."""
        form = self._F._form_obj(
            7, b"BT 1 0 0 1 100 650 Tm (AZ) Tj ET"  # no Tf of its own
        )
        extra = form + _obj(
            12, b"<< /Type /Encoding /Differences [65 /bullet] >>"
        )
        pdf = self._F._doc(
            b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (top) Tj ET /Fm1 Do",
            extra,
            b" /XObject << /Fm1 7 0 R >>",
        ).replace(
            _FONT,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom"
            b" /Encoding 12 0 R >>",
        )
        assert extract_pdf_pages(pdf) == ["top\n\n•Z"]

    def test_bbox_clips_form_text(self):
        """Text a viewer clips away (outside /BBox) must not leak into
        the corpus; in-bbox text survives."""
        form = self._F._form_obj(
            7,
            b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (inside) Tj"
            b" 1 0 0 1 100 100 Tm (outside) Tj ET",
            b" /BBox [0 600 612 792]",
        )
        pdf = self._F._doc(b"/Fm1 Do", form, b" /XObject << /Fm1 7 0 R >>")
        assert extract_pdf_pages(pdf) == ["inside"]

    def test_q_restores_font_state(self):
        """q/Q save the TEXT state too (Tf persists across BT/ET and is
        restored by Q, spec 8.4.2): F2's /Differences map must not leak
        past the Q."""
        extra = _obj(
            11,
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom"
            b" /Encoding 12 0 R >>",
        ) + _obj(12, b"<< /Type /Encoding /Differences [65 /bullet] >>")
        page = (
            b"q BT /F2 12 Tf 1 0 0 1 100 700 Tm (A) Tj ET Q"
            b" BT /F1 12 Tf 1 0 0 1 100 600 Tm (A plain) Tj ET"
        )
        pdf = self._F._doc(page, extra, b"")
        pdf = pdf.replace(
            b"/Font << /F1 9 0 R >>", b"/Font << /F1 9 0 R /F2 11 0 R >>"
        )
        assert extract_pdf_pages(pdf) == ["•\n\nA plain"]


class TestSeqAfterBBoxFilter:
    """Round-5 ADVICE regression: after the /BBox filter removes boxes,
    subsequent emits must not reuse a RETAINED box's seq (the (y, x, seq)
    reading-order tiebreak must never fall back to list order)."""

    _F = TestFormXObjectsAndCTM()

    def test_seqs_unique_after_bbox_filter(self):
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _interpret_stream,
        )
        # the form emits a clipped box FIRST (inner seq 0), then a kept
        # one (inner seq 1); after the filter len(boxes)=1 < kept.seq+1
        form_body = (
            b"BT /F1 12 Tf 1 0 0 1 100 100 Tm (clipped) Tj"
            b" 1 0 0 1 100 700 Tm (kept) Tj ET"
        )

        def resolver(name):
            if name == "Fm1":
                return (form_body, {}, None, (0, 600, 612, 792), resolver)
            return None

        page = (
            b"/Fm1 Do"
            b" BT /F1 12 Tf 1 0 0 1 100 700 Tm (after) Tj ET"
        )
        boxes = _interpret_stream(page, form_resolver=resolver)
        texts = [b.text for b in boxes]
        assert texts == ["kept", "after"]
        seqs = [b.seq for b in boxes]
        assert len(set(seqs)) == len(seqs), seqs
        # document order must survive an equal-(y, x) tiebreak
        assert seqs[0] < seqs[1]

    def test_sibling_form_after_bbox_filter_gets_fresh_seqs(self):
        """A LATER sibling form must not restart seq at len(boxes):
        after Fm1's /BBox filter leaves a retained seq above the list
        length, Fm2's boxes previously took duplicate/LOWER seqs and
        could sort before Fm1's kept text at an equal (y, x)."""
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _interpret_stream,
        )
        fm1 = (
            b"BT /F1 12 Tf 1 0 0 1 100 100 Tm (c1) Tj"
            b" 1 0 0 1 100 100 Tm (c2) Tj"
            b" 1 0 0 1 100 700 Tm (kept) Tj ET"
        )
        fm2 = b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (second) Tj ET"

        def resolver(name):
            if name == "Fm1":
                return (fm1, {}, None, (0, 600, 612, 792), resolver)
            if name == "Fm2":
                return (fm2, {}, None, None, resolver)
            return None

        boxes = _interpret_stream(b"/Fm1 Do /Fm2 Do", form_resolver=resolver)
        assert [b.text for b in boxes] == ["kept", "second"]
        seqs = [b.seq for b in boxes]
        assert len(set(seqs)) == len(seqs), seqs
        assert seqs[0] < seqs[1]  # document order survives the tiebreak

    def test_bbox_clip_end_to_end_order_preserved(self):
        """Same shape through the public API: form text kept by the BBox
        and page text at the SAME position must stay in document order."""
        form = self._F._form_obj(
            7,
            b"BT /F1 12 Tf 1 0 0 1 100 100 Tm (clipped) Tj"
            b" 1 0 0 1 100 700 Tm (kept) Tj ET",
            b" /BBox [0 600 612 792]",
        )
        page = (
            b"/Fm1 Do BT /F1 12 Tf 1 0 0 1 100 700 Tm (after) Tj ET"
        )
        pdf = self._F._doc(page, form, b" /XObject << /Fm1 7 0 R >>")
        pages = extract_pdf_pages(pdf)
        assert len(pages) == 1
        assert pages[0].index("kept") < pages[0].index("after")
        assert "clipped" not in pages[0]


class TestType3Fonts:
    """Type3 fonts define their own glyph space via /FontMatrix
    (spec §9.6.5): advances must scale through the matrix, not the
    standard 1/1000 — TJ-gap spacing and x reading order are wrong
    otherwise.  The reference sidesteps Type3 by rasterizing
    (app/utils/utils.py:70-102); the text-layer graft models it."""

    def _doc(self, content, font_extra=b""):
        pdf = b"%PDF-1.4\n"
        pdf += _obj(1, _CATALOG)
        pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
                       b" /MediaBox [0 0 612 792] >>")
        pdf += _obj(3, _page(5))
        pdf += _stream_obj(5, content)
        pdf += _obj(
            9,
            b"<< /Type /Font /Subtype /Type3"
            b" /FontMatrix [0.048 0 0 0.048 0 0]"
            b" /FirstChar 65 /LastChar 67 /Widths [500 500 500]"
            b" /CharProcs << >>" + font_extra + b" >>",
        )
        pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
        return pdf

    def test_fontmatrix_scales_advances(self):
        """Advance per glyph = 500 * 0.048 * 10pt = 240pt: the second
        show op must land RIGHT of the explicitly positioned box at
        x=200 (the standard 1/1000 scaling would put it at x=105)."""
        content = (
            b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (A) Tj (B) Tj"
            b" 1 0 0 1 200 700 Tm (M) Tj ET"
        )
        assert extract_pdf_pages(self._doc(content)) == ["A M B"]

    def test_default_like_matrix_keeps_standard_arithmetic(self):
        """A Type3 font whose matrix IS the standard 0.001 scale must
        behave exactly like a simple font."""
        content = (
            b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (A) Tj (B) Tj"
            b" 1 0 0 1 200 700 Tm (M) Tj ET"
        )
        pdf = self._doc(content).replace(
            b"[0.048 0 0 0.048 0 0]", b"[0.001 0 0 0.001 0 0]"
        )
        # A at 100, B at 105, M at 200
        assert extract_pdf_pages(pdf) == ["A B M"]

    def test_differences_decode_still_applies(self):
        """Type3 glyph names decode via /Encoding /Differences as for
        any simple font — the FontMatrix only changes metrics."""
        content = b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (A) Tj ET"
        pdf = self._doc(content, b" /Encoding 7 0 R")
        pdf = pdf.replace(
            b"trailer",
            _obj(7, b"<< /Type /Encoding /Differences [65 /bullet] >>")
            + b"trailer",
        )
        assert extract_pdf_pages(pdf) == ["•"]

    def test_rotated_glyph_matrix_uses_b_component(self):
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _type3_unit_scale,
        )
        assert _type3_unit_scale(
            b"<< /FontMatrix [0 0.02 -0.02 0 0 0] >>"
        ) == 0.02
        assert _type3_unit_scale(b"<< >>") == 0.001
        assert _type3_unit_scale(b"<< /FontMatrix [garbage] >>") == 0.001

    def test_mirrored_matrix_yields_positive_advance(self):
        """A mirrored Type3 font (negative ``a``) must still advance
        text positions forward — both branches return |component|."""
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _type3_unit_scale,
        )
        assert _type3_unit_scale(
            b"<< /FontMatrix [-0.01 0 0 0.01 0 0] >>"
        ) == 0.01
        assert _type3_unit_scale(
            b"<< /FontMatrix [0 -0.02 0.02 0 0 0] >>"
        ) == 0.02


class TestVerticalWriting:
    """WMode 1 (Identity-V / predefined -V CMaps, spec §9.7.5.2):
    glyphs advance DOWN the page — successive show ops must stack
    vertically in reading order, not run off to the right."""

    _CMAP = (
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0001> <0041> <0002> <0042> endbfchar\n"
    )

    def _doc(self, content, encoding=b"/Identity-V", desc=b""):
        pdf = b"%PDF-1.5\n"
        pdf += _obj(1, _CATALOG)
        pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
                       b" /MediaBox [0 0 612 792] >>")
        pdf += _obj(3, _page(5))
        pdf += _stream_obj(5, content)
        pdf += _obj(
            9,
            b"<< /Type /Font /Subtype /Type0 /BaseFont /X /Encoding "
            + encoding + b" /ToUnicode 8 0 R" + desc + b" >>",
        )
        pdf += _stream_obj(8, self._CMAP, compress=True)
        pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
        return pdf

    def test_identity_v_stacks_downward(self):
        """Default vertical advance (DW2 absent -> 1000/1000 em = 12pt
        at size 12): the two shows form two lines, top-down."""
        content = (
            b"BT /F1 12 Tf 1 0 0 1 300 700 Tm <0001> Tj <0002> Tj ET"
        )
        assert extract_pdf_pages(self._doc(content)) == ["A\nB"]

    def test_identity_h_is_unaffected(self):
        content = (
            b"BT /F1 12 Tf 1 0 0 1 300 700 Tm <0001> Tj <0002> Tj ET"
        )
        pages = extract_pdf_pages(self._doc(content, encoding=b"/Identity-H"))
        assert pages == ["A B"]

    def test_dw2_scales_vertical_advance(self):
        """/DW2 [880 -2000] doubles the default drop: 24pt exceeds the
        paragraph gap, so the shows become separate paragraphs."""
        content = (
            b"BT /F1 12 Tf 1 0 0 1 300 700 Tm <0001> Tj <0002> Tj ET"
        )
        pdf = self._doc(
            content,
            desc=b" /DescendantFonts [7 0 R]",
        ).replace(
            b"trailer",
            _obj(7, b"<< /Type /Font /Subtype /CIDFontType2"
                    b" /DW2 [880 -2000] >>") + b"trailer",
        )
        assert extract_pdf_pages(pdf) == ["A\n\nB"]

    def test_w2_per_cid_triples(self):
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _cid_widths,
        )
        objs = {
            7: b"<< /Type /Font /Subtype /CIDFontType0 /DW2 [880 -1000]"
               b" /W2 [1 [-1200 500 880] 5 8 -900 600 880] >>",
        }
        fd = b"<< /Subtype /Type0 /DescendantFonts [7 0 R] >>"
        _w, _dw, vw, vd = _cid_widths(fd, objs)
        assert vd == 1000.0
        assert vw == {1: 1200.0, 5: 900.0, 6: 900.0, 7: 900.0, 8: 900.0}

    def test_vertical_tj_positive_number_moves_down(self):
        """Table 109: a POSITIVE TJ adjustment moves the next glyph
        DOWN in vertical mode (left in horizontal) — the sign flips
        with the writing mode.  +1000 adds a full em to the 12pt glyph
        drop -> 24pt -> paragraph gap.  TJ emits one box; the next show
        proves the carried position."""
        content = (
            b"BT /F1 12 Tf 1 0 0 1 300 700 Tm"
            b" [<0001> 1000] TJ <0002> Tj ET"
        )
        assert extract_pdf_pages(self._doc(content)) == ["A\n\nB"]

    def test_vertical_tj_negative_number_moves_up(self):
        """A NEGATIVE adjustment in WMode 1 moves the pen back UP:
        -1000 exactly cancels the default 1000-unit glyph drop, so the
        next show lands on A's own baseline."""
        content = (
            b"BT /F1 12 Tf 1 0 0 1 300 700 Tm"
            b" [<0001> -1000] TJ <0002> Tj ET"
        )
        assert extract_pdf_pages(self._doc(content)) == ["A B"]

    def test_vertical_positive_gap_decodes_as_space(self):
        """The TJ word-gap heuristic flips sign with the mode: a
        spreading +400 between glyphs inside ONE vertical TJ box
        decodes as a space."""
        content = (
            b"BT /F1 12 Tf 1 0 0 1 300 700 Tm"
            b" [<0001> 400 <0002>] TJ ET"
        )
        assert extract_pdf_pages(self._doc(content)) == ["A B"]

    def test_vertical_tc_shrinks_the_gap(self):
        """Spec 9.4.4: ty = (w1 - Tj/1000)*Tfs + Tc with w1 negative —
        positive Tc makes the displacement LESS negative, i.e. shrinks
        the drop.  Tc 12 cancels the 12pt glyph drop entirely."""
        content = (
            b"BT /F1 12 Tf 12 Tc 1 0 0 1 300 700 Tm"
            b" <0001> Tj <0002> Tj ET"
        )
        assert extract_pdf_pages(self._doc(content)) == ["A B"]


def test_tj_array_hex_strings_tokenize():
    """Hex strings inside TJ arrays (how CID text is normally kerned)
    must tokenize as strings — they previously parsed as numbers and
    the shown text was silently lost."""
    from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
        _tokenize,
    )
    toks = list(_tokenize(b"[<0048> -120 (mix) <0065>] TJ"))
    assert toks[0][0] == "arr"
    assert toks[0][1] == [
        ("str", b"\x00H"), ("num", -120.0), ("str", b"mix"),
        ("str", b"\x00e"),
    ]
    assert toks[1] == ("op", "TJ")


def test_cid_tj_array_kerning_extracts():
    """End-to-end: a Type0 font shown entirely through a TJ array with
    hex strings and kerns extracts its text with the word gap."""
    cmap = (
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0001> <0048> <0002> <0069> endbfchar\n"
    )
    pdf = b"%PDF-1.5\n"
    pdf += _obj(1, _CATALOG)
    pdf += _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
                   b" /MediaBox [0 0 612 792] >>")
    pdf += _obj(3, _page(5))
    pdf += _stream_obj(
        5, b"BT /F1 12 Tf 1 0 0 1 100 700 Tm"
           b" [<0001> -400 <0002>] TJ ET"
    )
    pdf += _obj(
        9,
        b"<< /Type /Font /Subtype /Type0 /BaseFont /X"
        b" /Encoding /Identity-H /ToUnicode 8 0 R >>",
    )
    pdf += _stream_obj(8, cmap, compress=True)
    pdf += b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_pages(pdf) == ["H i"]


def test_dict_inside_tj_array_swallowed_whole():
    """A malformed dict inside a TJ array must be swallowed WHOLE: its
    numeric values must not leak into the array as phantom kern
    adjustments (a -400 leak would both insert a spurious word gap and
    shift the post-TJ cursor)."""
    from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
        _tokenize,
    )
    toks = list(_tokenize(b"[(Hello) << /X -400 >> (world)] TJ"))
    assert toks[0] == (
        "arr", [("str", b"Hello"), ("str", b"world")]
    )
    # NESTED dict: the swallow must find the MATCHING '>>', not the
    # first one — the outer dict's -400 must not leak
    toks = list(_tokenize(b"[(a) << /A << /B 1 >> /C -400 >> (b)] TJ"))
    assert toks[0] == ("arr", [("str", b"a"), ("str", b"b")])
    # '>>' inside a string VALUE is data, not the dict close
    toks = list(_tokenize(b"[(a) << /X (x>>y) /Y -400 >> (b)] TJ"))
    assert toks[0] == ("arr", [("str", b"a"), ("str", b"b")])
    # unterminated dict: skip only the token — the -400 may leak (it is
    # doubly malformed) but the array still CLOSES at its ']' and every
    # later operator and show op survives
    toks = list(_tokenize(b"[(a) << /X 1 >] TJ (real text) Tj"))
    kinds = [(k, v) for k, v in toks]
    assert ("op", "TJ") in kinds
    assert ("str", b"real text") in kinds
    assert ("op", "Tj") in kinds
    arr = toks[0][1]
    assert ("str", b"a") in arr
