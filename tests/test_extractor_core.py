"""Unit tests for the pure-Python extraction core.

Each test pins a behaviour of the reference implementation at the cited
file:line — these are the contracts the Spark job must not drift from.
"""

import pytest

from deepseek_ocr_customvllm_spark.extractor.blocks import (
    apply_text_heuristics,
    parse_blocks,
    parse_html_table,
    validate_table_totals,
)
from deepseek_ocr_customvllm_spark.extractor.engine import (
    MAX_BYTES,
    detect_content_type,
    doc_id_for_url,
    extract_document,
)
from deepseek_ocr_customvllm_spark.extractor.html_extract import extract_html_page
from deepseek_ocr_customvllm_spark.extractor.markdown import (
    assemble_clean,
    assemble_raw,
    clean_batch_cli,
    clean_formula,
    clean_page,
)
from deepseek_ocr_customvllm_spark.extractor.norepeat import suppress_repeated_ngrams
from deepseek_ocr_customvllm_spark.extractor.pdf_extract import extract_pdf_pages
from deepseek_ocr_customvllm_spark.extractor.tags import (
    EOS_TOKEN,
    extract_spans,
    find_tags,
    normalize_box,
    resolve_tags_document,
)
from deepseek_ocr_customvllm_spark.sources.pagegen import synth_pages_pdf


IMG_TAG = "<|ref|>image<|/ref|><|det|>[[100, 100, 300, 300]]<|/det|>"
OTHER_TAG = "<|ref|>title<|/ref|><|det|>[[0, 0, 500, 40]]<|/det|>"


# ---------------------------------------------------------------------------
# tags / P1 (reference postprocess_md.py:26-50)
# ---------------------------------------------------------------------------

class TestTags:
    def test_find_tags_split(self):
        text = f"a {IMG_TAG} b {OTHER_TAG} c"
        matches, images, others = find_tags(text)
        assert len(matches) == 2
        assert images == [IMG_TAG]
        assert others == [OTHER_TAG]

    def test_p1_image_enumeration_and_eos(self):
        img_tag_2 = "<|ref|>image<|/ref|><|det|>[[5, 5, 50, 50]]<|/det|>"
        text = f"{EOS_TOKEN}x {IMG_TAG} y {img_tag_2} z"
        out = resolve_tags_document(text, "job1")
        assert EOS_TOKEN not in out
        assert "![](./job1/images/0.jpg)" in out
        assert "![](./job1/images/1.jpg)" in out

    def test_p1_duplicate_tags_share_index(self):
        # Reference quirk (postprocess_md.py:44-45): str.replace replaces
        # ALL occurrences, so two byte-identical image tags both become
        # index 0 and the later index is never emitted. Preserved as-is.
        out = resolve_tags_document(f"x {IMG_TAG} y {IMG_TAG} z", "j")
        assert out.count("![](./j/images/0.jpg)") == 2
        assert "images/1.jpg" not in out

    def test_p1_other_tags_deleted(self):
        out = resolve_tags_document(f"a {OTHER_TAG} b", "j")
        assert out == "a  b"

    def test_p1_latex_no_trailing_space(self):
        # postprocess_md.py:48 — '=:' with NO trailing space in the P1 path
        assert resolve_tags_document(r"x \eqqcolon y \coloneqq z", "j") == "x =: y := z"

    def test_p1_blank_squeeze_single_pass(self):
        # chained replace('\n\n\n\n','\n\n') then ('\n\n\n','\n\n'):
        # 5 newlines -> first replace eats 4, leaving '\n\n'+'\n' = 3? No:
        # '\n'*5 -> replace 4->2 gives '\n\n\n' -> second replace -> '\n\n'
        assert resolve_tags_document("a" + "\n" * 5 + "b", "j") == "a\n\nb"

    def test_normalize_box_clamp_and_swap(self):
        assert normalize_box([700, 650, 100, 50]) == (100, 50, 700, 650)
        assert normalize_box([-5, 0, 2000, 10]) == (0, 0, 999, 10)

    def test_spans_validity_guard(self):
        # width/height > 2 guard (postprocess_md.py:117-118)
        spans = extract_spans("<|ref|>image<|/ref|><|det|>[[10, 10, 11, 11]]<|/det|>")
        assert len(spans) == 1 and spans[0]["valid"] is False
        spans = extract_spans(IMG_TAG)
        assert spans[0]["valid"] is True

    def test_spans_bad_coords_skipped(self):
        assert extract_spans("<|ref|>x<|/ref|><|det|>not-a-list<|/det|>") == []

    def test_spans_literal_eval_no_code_execution(self):
        # the reference uses eval(); ours must not execute expressions
        assert extract_spans("<|ref|>x<|/ref|><|det|>__import__('os')<|/det|>") == []


# ---------------------------------------------------------------------------
# markdown / P4, P5, P6 (postprocess_md.py:229-300, ocr_service.py:123-125)
# ---------------------------------------------------------------------------

class TestMarkdownFolds:
    def test_raw_fold_every_page(self):
        out = assemble_raw(["p1", "", "p3"])
        assert out == (
            "p1\n\n<--- Page Split --->\n\n"
            "\n\n<--- Page Split --->\n\n"
            "p3\n\n<--- Page Split --->\n\n"
        )

    def test_clean_page_latex_trailing_space(self):
        # postprocess_md.py:281 — '=: ' WITH trailing space in the P4 path
        cleaned, _ = clean_page(r"x \eqqcolon y", 0)
        assert cleaned == "x =:  y"

    def test_clean_page_blank_skipped(self):
        cleaned, _ = clean_page(f"  {EOS_TOKEN}  ", 0)
        assert cleaned is None

    def test_clean_page_image_links_page_local(self):
        img_tag_2 = "<|ref|>image<|/ref|><|det|>[[5, 5, 50, 50]]<|/det|>"
        cleaned, _ = clean_page(f"{IMG_TAG} and {img_tag_2}", 3)
        assert "![](images/3_0.jpg)" in cleaned
        assert "![](images/3_1.jpg)" in cleaned

    def test_clean_page_heading_level(self):
        _, lvl = clean_page("# a\n\ntext\n\n### b\n\nmore", 0)
        assert lvl == 3

    def test_clean_fold_chunk_newlines(self):
        # one chunk (<=40 pages): pages + marker each, then one '\n'
        out = assemble_clean(["a", "b"])
        assert out == "a\n\n\n\nb\n\n\n\n\n"

    def test_clean_fold_blank_page_dropped_but_chunked(self):
        out = assemble_clean(["a", "", "c"])
        assert out == "a\n\n\n\nc\n\n\n\n\n"

    def test_clean_fold_multi_chunk(self):
        pages = [f"p{i}" for i in range(41)]
        out = assemble_clean(pages)
        # 40-page chunk then 1-page chunk -> two chunk-trailing '\n'
        assert out.endswith("p40\n\n\n\n\n")
        assert "p39\n\n\n\n\np40" in out  # chunk boundary: extra '\n'

    def test_clean_formula(self):
        # Scripts/run_batch.py:53-68
        assert clean_formula(r"\[ x + y \quad (eq. 1) \]") == r"\[x + y\]"

    def test_batch_cli_clean_strips_all_tags_and_center(self):
        text = f"<center>t</center> {IMG_TAG} u"
        out = clean_batch_cli(text)
        assert "<center>" not in out and "ref" not in out and "u" in out


# ---------------------------------------------------------------------------
# blocks / B1, B2, B3, P7
# ---------------------------------------------------------------------------

class TestHtmlTableParse:
    def test_basic(self):
        rows = parse_html_table("<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>")
        assert rows == [["a", "b"], ["c"]]

    def test_th_dropped(self):
        # the reference regex only matches <td> (postprocess_json.py:17)
        rows = parse_html_table("<table><tr><th>h</th></tr><tr><td>x</td></tr></table>")
        assert rows == [[], ["x"]]

    def test_attributes_and_case(self):
        rows = parse_html_table('<TABLE><TR class="r"><TD style="x">v</TD></TR></TABLE>')
        assert rows == [["v"]]


class TestTextHeuristics:
    def test_date_split(self):
        # utils.py:164-183
        assert apply_text_heuristics("Signed 12/05/2024 by board") == "Signed | 12/05/2024 | by board"

    def test_date_split_no_prefix(self):
        assert apply_text_heuristics("12/05/2024 follows") == "12/05/2024 | follows"

    def test_letter_digit(self):
        assert apply_text_heuristics("invoice ab12") == "invoice ab | 12"

    def test_empty_passthrough(self):
        assert apply_text_heuristics("") == ""


class TestTableValidation:
    def test_high(self):
        rows = [["a", "10"], ["b", "20"], ["total", "30"]]
        assert validate_table_totals(rows) == "High"

    def test_tolerance_2(self):
        rows = [["a", "10"], ["b", "20"], ["total", "32"]]
        assert validate_table_totals(rows) == "High"

    def test_low_confidence(self):
        rows = [["a", "10"], ["b", "20"], ["total", "40"]]
        assert validate_table_totals(rows) == "Low Confidence Table (Column Shift Detected)"

    def test_vietnamese_keyword(self):
        rows = [["a", "5"], ["tổng cộng", "99"]]
        assert validate_table_totals(rows) == "Low Confidence Table (Column Shift Detected)"

    def test_thousands_separators_stripped(self):
        rows = [["a", "1.000"], ["b", "2,000"], ["total", "3000"]]
        assert validate_table_totals(rows) == "High"

    def test_no_total_row(self):
        assert validate_table_totals([["a", "1"], ["b", "2"]]) == "High"

    def test_non_numeric_rows_skipped(self):
        rows = [["header", "label"], ["a", "1"], ["total", "1"]]
        assert validate_table_totals(rows) == "High"


class TestBlockStateMachine:
    def test_heading_paragraph_merge(self):
        blocks = parse_blocks("# Title\nline one\nline two\n\nnext para")
        assert blocks[0] == {"type": "heading", "level": 1, "text": "Title"}
        assert blocks[1]["text"] == "line one line two"
        assert blocks[2]["text"] == "next para"

    def test_html_table_block(self):
        blocks = parse_blocks("<table><tr><td>x</td></tr></table>")
        assert blocks[0]["type"] == "table"
        assert blocks[0]["table_id"] == "tbl_01"
        assert blocks[0]["rows"] == [["x"]]
        assert blocks[0]["validation"] == "High"

    def test_markdown_table_with_separator(self):
        blocks = parse_blocks("|a|b|\n|---|---|\n|1|2|\n\nafter")
        assert blocks[0]["type"] == "table"
        assert blocks[0]["rows"] == [["a", "b"], ["1", "2"]]
        assert blocks[1]["text"] == "after"

    def test_nonpipe_line_ends_table_starts_paragraph(self):
        blocks = parse_blocks("|a|b|\nplain text")
        assert blocks[0]["type"] == "table"
        assert blocks[1] == {"type": "paragraph", "text": "plain text"}

    def test_image_block(self):
        blocks = parse_blocks("![](images/0_0.jpg)")
        assert blocks == [{"type": "image", "source": "images/0_0.jpg"}]

    def test_table_ids_increment(self):
        blocks = parse_blocks(
            "<table><tr><td>x</td></tr></table>\n<table><tr><td>y</td></tr></table>"
        )
        assert [b["table_id"] for b in blocks] == ["tbl_01", "tbl_02"]

    def test_paragraph_heuristics_applied(self):
        blocks = parse_blocks("meeting on 1/2/2024 confirmed")
        assert blocks[0]["text"] == "meeting on | 1/2/2024 | confirmed"


# ---------------------------------------------------------------------------
# norepeat (I2 analogue — process/ngram_norepeat.py:7-40)
# ---------------------------------------------------------------------------

class TestNoRepeat:
    def test_repeat_run_suppressed(self):
        run = " ".join(f"w{i}" for i in range(22))
        text = f"{run}\n{run}"
        out = suppress_repeated_ngrams(text)
        toks = out.split()
        assert len(toks) < 44  # second copy (at least its first 20 tokens) dropped
        assert toks[:22] == [f"w{i}" for i in range(22)]

    def test_no_false_positive(self):
        text = " ".join(f"u{i}" for i in range(100))
        assert suppress_repeated_ngrams(text) == text

    def test_table_lines_exempt(self):
        row = "|" + "|".join(f"c{i}" for i in range(25)) + "|"
        text = f"{row}\n{row}"
        assert suppress_repeated_ngrams(text) == text

    def test_outside_window_not_suppressed(self):
        run = " ".join(f"w{i}" for i in range(20))
        filler = " ".join(f"f{i}" for i in range(60))  # pushes run out of window
        text = f"{run}\n{filler}\n{run}"
        assert suppress_repeated_ngrams(text) == text

    def test_untouched_lines_byte_preserved(self):
        text = "exact   spacing kept\n" + " ".join(str(i) for i in range(30))
        out = suppress_repeated_ngrams(text)
        assert out.startswith("exact   spacing kept")


# ---------------------------------------------------------------------------
# html extraction (M7)
# ---------------------------------------------------------------------------

class TestHtmlExtract:
    def test_boilerplate_containers_dropped(self):
        html = (
            "<html><body><nav><a href='/'>Home</a><a href='/x'>X</a></nav>"
            "<article><p>real content stays here</p></article>"
            "<footer><a href='/'>foot</a></footer></body></html>"
        )
        out = extract_html_page(html)
        assert out == "real content stays here"

    def test_link_density_filter(self):
        html = (
            "<div><a href='/1'>aa</a> <a href='/2'>bb</a> <a href='/3'>cc</a></div>"
            "<div>plain prose with <a href='/x'>one</a> small link inside a lot of text</div>"
        )
        out = extract_html_page(html)
        assert "plain prose" in out
        assert "aa" not in out

    def test_heading_levels(self):
        out = extract_html_page("<h2>Two</h2><p>body</p>")
        assert out == "## Two\n\nbody"

    def test_table_reconstruction_single_line(self):
        out = extract_html_page("<table>\n<tr>\n<td>a</td><td>b</td></tr></table>")
        assert out == "<table><tr><td>a</td><td>b</td></tr></table>"

    def test_th_becomes_td(self):
        out = extract_html_page("<table><tr><th>h</th></tr></table>")
        assert out == "<table><tr><td>h</td></tr></table>"

    def test_pre_preserves_pipe_tables(self):
        out = extract_html_page("<pre>|a|b|\n|---|---|\n|1|2|</pre>")
        assert out == "|a|b|\n|---|---|\n|1|2|"

    def test_grounding_tags_survive(self):
        html = f"<p>before {IMG_TAG} after</p>"
        out = extract_html_page(html)
        assert IMG_TAG in out

    def test_img_emits_grounding_tag(self):
        out = extract_html_page("<p>x</p><img src='a.jpg'><p>y</p>")
        assert "<|ref|>image<|/ref|>" in out

    def test_entity_decoding(self):
        assert extract_html_page("<p>a &amp; b</p>") == "a & b"

    def test_tag_soup_no_crash(self):
        out = extract_html_page("<html><body><p>truncated <div><span")
        assert "truncated" in out

    def test_whitespace_normalized(self):
        assert extract_html_page("<p>a\n   b\t c</p>") == "a b c"


# ---------------------------------------------------------------------------
# pdf extraction (S2 replacement)
# ---------------------------------------------------------------------------

class TestPdfExtract:
    def _pdf(self, pages, compress=False):
        return synth_pages_pdf(pages, compress=compress)

    def test_single_page_lines(self):
        pdf = self._pdf([["# Title", "", "body line one", "body line two"]])
        pages = extract_pdf_pages(pdf)
        assert len(pages) == 1
        assert pages[0].startswith("# Title")
        assert "body line one\nbody line two" in pages[0]

    def test_paragraph_gap_becomes_blank_line(self):
        pdf = self._pdf([["para one", "", "para two"]])
        assert "para one\n\npara two" in extract_pdf_pages(pdf)[0]

    def test_multi_page_order(self):
        pdf = self._pdf([["page one text"], ["page two text"]])
        pages = extract_pdf_pages(pdf)
        assert len(pages) == 2
        assert "page one" in pages[0] and "page two" in pages[1]

    def test_margin_furniture_dropped(self):
        # synth writer puts "Page N" at y=20, inside the 30pt margin
        pdf = self._pdf([["content"]])
        assert "Page 1" not in extract_pdf_pages(pdf)[0]

    def test_flate_compressed_stream(self):
        pdf = self._pdf([["compressed body"]], compress=True)
        assert "compressed body" in extract_pdf_pages(pdf)[0]

    def test_escaped_parens(self):
        pdf = self._pdf([["value (a) and (b)"]])
        assert "value (a) and (b)" in extract_pdf_pages(pdf)[0]

    def test_garbage_no_crash(self):
        assert extract_pdf_pages(b"%PDF-1.4 garbage stream endstream") == []


# ---------------------------------------------------------------------------
# engine dispatch + isolation
# ---------------------------------------------------------------------------

class TestEngine:
    def test_detect(self):
        assert detect_content_type(b"%PDF-1.4") == "pdf"
        assert detect_content_type(b"<html>") == "html"
        assert detect_content_type(b"  ") == "empty"

    def test_oversize_rejected(self):
        r = extract_document("u", b"<p>" + b"x" * 100, max_bytes=50)
        assert r.status == "REJECTED"
        assert r.markdown == ""

    def test_default_cap_is_reference_200mb(self):
        assert MAX_BYTES == 200 * 1024 * 1024

    def test_empty_success(self):
        r = extract_document("u", b"")
        assert r.status == "SUCCESS" and r.n_pages == 0

    def test_doc_id_stable(self):
        assert doc_id_for_url("https://a.test/1") == doc_id_for_url("https://a.test/1")
        assert len(doc_id_for_url("x")) == 12

    def test_determinism(self):
        html = b"<article><h1>T</h1><p>body text here</p></article>"
        r1 = extract_document("u", html)
        r2 = extract_document("u", html)
        assert r1.markdown == r2.markdown
        assert r1.markdown_raw == r2.markdown_raw
        assert r1.pages == r2.pages


class TestTableRoundTrip:
    def test_rows_to_html_round_trip(self):
        from deepseek_ocr_customvllm_spark.extractor.blocks import rows_to_html

        rows = [["a", "b"], ["1", "2"], ["total", "3"]]
        assert parse_html_table(rows_to_html(rows)) == rows

    def test_empty(self):
        from deepseek_ocr_customvllm_spark.extractor.blocks import rows_to_html

        assert parse_html_table(rows_to_html([])) == []


class TestErrorIsolation:
    def test_internal_failure_becomes_failed_row(self, monkeypatch):
        """Per-row isolation (reference per-job try/except,
        ocr_service.py:200-207): an extractor bug must yield a FAILED
        result row, never an exception."""
        from deepseek_ocr_customvllm_spark.extractor import engine

        def boom(_text):
            raise RuntimeError("injected parser failure")

        monkeypatch.setattr(engine, "extract_html_page", boom)
        r = engine.extract_document("u", b"<p>x</p>")
        assert r.status == "FAILED"
        assert "injected parser failure" in r.error

    def test_failed_row_redetect_sees_past_leading_whitespace(self, monkeypatch):
        """ADVICE r02: the failure-path re-detect must not classify a
        whitespace-prefixed HTML payload as 'empty' (full-payload
        detection says 'html') — that would skew the content_type/status
        rollups the re-detect exists to keep honest."""
        from deepseek_ocr_customvllm_spark.extractor import engine

        def boom(_text):
            raise RuntimeError("injected parser failure")

        monkeypatch.setattr(engine, "extract_html_page", boom)
        payload = b" " * 64 + b"<p>real html after the pad</p>"
        r = engine.extract_document("u", payload)
        assert r.status == "FAILED" and r.content_type == "html"

    def test_invalid_utf8_no_crash(self):
        r = extract_document("u", b"<p>\xff\xfe garbled \x80</p>")
        assert r.status == "SUCCESS"

    def test_none_payload(self):
        r = extract_document("u", None)
        assert r.status == "SUCCESS" and r.n_pages == 0

    def test_encrypted_pdf_quarantines_not_empty_success(self):
        """An /Encrypt'd PDF's streams are ciphertext: it must become a
        FAILED row with a reason, not an empty SUCCESS."""
        pdf = (
            b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"trailer\n<< /Size 9 /Root 1 0 R /Encrypt 7 0 R >>\n%%EOF\n"
        )
        r = extract_document("u", pdf)
        assert r.status == "FAILED" and r.content_type == "pdf"
        assert "encrypted" in r.error


class TestTrueTeds:
    """True tree-edit-distance TEDS (Scripts/table_diff.py metric) over
    HTML table trees — structure the depth-2 grid metric cannot see."""

    A = "<table><tr><th>H</th><td>1</td></tr><tr><td>total</td><td>3</td></tr></table>"

    def test_identity_and_bounds(self):
        from deepseek_ocr_customvllm_spark.extractor.evaluate import teds

        assert teds(self.A, self.A) == 1.0
        assert teds("", "") == 1.0
        assert 0.0 <= teds(self.A, "") < 0.2

    def test_sees_structure_the_grid_metric_cannot(self):
        """th vs td and thead/tbody wrappers change the tree, and the true
        metric penalizes them; the lossy <td>-only grid view would not."""
        from deepseek_ocr_customvllm_spark.extractor.evaluate import teds

        th_as_td = self.A.replace("<th>H</th>", "<td>H</td>")
        assert teds(self.A, th_as_td) < 1.0
        wrapped = (
            "<table><thead><tr><th>H</th></tr></thead>"
            "<tbody><tr><td>1</td></tr></tbody></table>"
        )
        flat = "<table><tr><th>H</th></tr><tr><td>1</td></tr></table>"
        assert teds(wrapped, flat) < 1.0

    def test_damage_ordering(self):
        from deepseek_ocr_customvllm_spark.extractor.evaluate import teds

        typo = self.A.replace(">total<", ">totals<")
        dropped = "<table><tr><th>H</th><td>1</td></tr></table>"
        assert teds(self.A, typo) > teds(self.A, dropped) > 0.0

    def test_round_trip_with_block_layer(self):
        from deepseek_ocr_customvllm_spark.extractor.blocks import rows_to_html
        from deepseek_ocr_customvllm_spark.extractor.evaluate import (
            mean_teds,
            teds,
        )

        rows = [["a", "1"], ["b", "2"], ["total", "3"]]
        html = rows_to_html(rows)
        assert teds(html, html) == 1.0
        perturbed = rows_to_html([["a", "1"], ["b", "9"], ["total", "3"]])
        s = teds(html, perturbed)
        assert 0.5 < s < 1.0
        assert mean_teds([(html, html), (html, perturbed)]) == (1.0 + s) / 2


class TestEncryptedDetectionScope:
    def test_encrypt_mention_in_content_not_quarantined(self):
        """Page CONTENT that merely mentions '/Encrypt 7 0 R' (e.g. docs
        about PDF security) must extract normally — only the active
        trailer region is consulted (round-3 review finding)."""
        body = b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (see /Encrypt 7 0 R here) Tj ET"
        head = (
            b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1"
            b" /MediaBox [0 0 612 792] >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>\nendobj\n"
        )
        pdf = (
            head
            + (b"5 0 obj\n<< /Length %d >>\nstream\n" % len(body))
            + body
            + b"\nendstream\nendobj\n"
            + b"trailer\n<< /Size 9 /Root 1 0 R >>\n%%EOF\n"
        )
        r = extract_document("u", pdf)
        assert r.status == "SUCCESS"
        assert "Encrypt" in r.markdown_raw


class TestNoRepeatWarmBoundary:
    """Round-5 ADVICE regression: after the bulk prefix extend, grams
    whose rolling hash covers fewer than n tokens must never be
    registered.  Differential vs a direct O(n*window) scan, with the
    first duplicate placed far enough in that the bulk fast path and the
    warm-up boundary (warm0 > 0) are both exercised."""

    @staticmethod
    def _direct(text, n, window):
        from deepseek_ocr_customvllm_spark.extractor.norepeat import (
            _is_exempt_line,
        )
        lines = text.split("\n")
        stream = []
        for li, line in enumerate(lines):
            ex = _is_exempt_line(line)
            for tok in line.split():
                stream.append((li, tok, ex))
        if len(stream) < n:
            return text
        toks = [t for _, t, _ in stream]
        flags = [e for _, _, e in stream]
        emitted, dropped = [], set()
        i = 0
        while i < len(stream):
            if (
                not flags[i]
                and i + n <= len(stream)
                and not any(flags[i:i + n])
            ):
                w = toks[i:i + n]
                lo = max(0, len(emitted) - window)
                if any(
                    emitted[s:s + n] == w
                    for s in range(lo, len(emitted) - n + 1)
                ):
                    dropped.update(range(i, i + n))
                    i += n
                    continue
            emitted.append(toks[i])
            i += 1
        if not dropped:
            return text
        touched = {stream[j][0] for j in dropped}
        keep = {}
        for idx, (li, tok, _) in enumerate(stream):
            if li in touched and idx not in dropped:
                keep.setdefault(li, []).append(tok)
        out = []
        for li, line in enumerate(lines):
            if li not in touched:
                out.append(line)
            elif keep.get(li):
                out.append(" ".join(keep[li]))
        return "\n".join(out)

    def test_duplicate_right_after_warm_boundary(self):
        # n=4, window=10: warm0 = first_dup - 13.  A long unique prefix
        # pushes first_dup deep so the bulk extend covers most of it.
        n, window = 4, 10
        prefix = [f"u{i}" for i in range(60)]
        dup = ["a", "b", "c", "d"]
        toks = prefix + dup + ["x1", "x2"] + dup + ["tail"]
        text = " ".join(toks)
        got = suppress_repeated_ngrams(text, n, window)
        want = self._direct(text, n, window)
        assert got == want
        assert got.split().count("a") == 1  # the repeat was dropped

    def test_boundary_spanning_gram_is_stale_not_matchable(self):
        # A gram whose tokens span the bulk/warm boundary is outside the
        # live window by first_dup; a later identical window must NOT
        # match it (it must match only grams inside the window).
        n, window = 3, 6
        # first_dup is at the "p q r" repeat; the earlier "p q r" sits
        # outside the window by then
        toks = (
            ["p", "q", "r"]
            + [f"f{i}" for i in range(20)]
            + ["p", "q", "r"]
        )
        text = " ".join(toks)
        got = suppress_repeated_ngrams(text, n, window)
        want = self._direct(text, n, window)
        assert got == want == text  # out of window: nothing dropped

    def test_differential_sweep(self):
        import itertools
        import random
        rng = random.Random(7)
        alphabet = ["a", "b", "c", "d"]
        for trial in range(200):
            n = rng.choice([2, 3, 4])
            window = rng.choice([4, 6, 10])
            n_toks = rng.randrange(0, 40)
            toks = [rng.choice(alphabet) for _ in range(n_toks)]
            # occasional newlines and exempt-ish table rows
            parts = []
            for t in toks:
                parts.append(t)
                if rng.random() < 0.1:
                    parts.append("\n")
            text = " ".join(parts).replace(" \n ", "\n")
            got = suppress_repeated_ngrams(text, n, window)
            want = self._direct(text, n, window)
            assert got == want, (n, window, text)
