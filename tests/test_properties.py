"""Property-based tests (hypothesis) for the extraction core.

The reference has no property tests (SURVEY.md §5.1); these pin the
invariants that make the Spark job safe to run on arbitrary crawl bytes:
total functions (never raise), determinism, and structural invariants of
each transform.
"""

from hypothesis import given, settings, strategies as st

from deepseek_ocr_customvllm_spark.extractor.blocks import (
    parse_blocks,
    parse_html_table,
    validate_table_totals,
)
from deepseek_ocr_customvllm_spark.extractor.engine import (
    detect_content_type,
    extract_document,
)
from deepseek_ocr_customvllm_spark.extractor.html_extract import extract_html_page
from deepseek_ocr_customvllm_spark.extractor.markdown import assemble_clean, clean_page
from deepseek_ocr_customvllm_spark.extractor.norepeat import suppress_repeated_ngrams
from deepseek_ocr_customvllm_spark.extractor.pdf_extract import extract_pdf_pages
from deepseek_ocr_customvllm_spark.extractor.tags import (
    extract_spans,
    resolve_tags_document,
)

SETTINGS = dict(max_examples=60, deadline=None)

text_strategy = st.text(max_size=400)
binary_strategy = st.binary(max_size=400)


class TestTotality:
    """Every core function is total on arbitrary input — a Spark task
    must never die for one document (I3 isolation contract)."""

    @settings(**SETTINGS)
    @given(binary_strategy, st.text(min_size=1, max_size=40))
    def test_extract_document_never_raises(self, payload, url):
        r = extract_document(url, payload)
        assert r.status in ("SUCCESS", "FAILED", "REJECTED")

    @settings(**SETTINGS)
    @given(text_strategy)
    def test_html_extract_total(self, s):
        assert isinstance(extract_html_page(s), str)

    @settings(**SETTINGS)
    @given(binary_strategy)
    def test_pdf_extract_total(self, b):
        assert isinstance(extract_pdf_pages(b"%PDF-1.4\n" + b), list)

    @settings(**SETTINGS)
    @given(text_strategy)
    def test_parse_blocks_total(self, s):
        blocks = parse_blocks(s)
        assert all(b["type"] in ("heading", "paragraph", "table", "image") for b in blocks)

    @settings(**SETTINGS)
    @given(st.lists(st.lists(st.text(max_size=20), max_size=6), max_size=6))
    def test_validate_totals_total(self, rows):
        assert validate_table_totals(rows) in (
            "High",
            "Low Confidence Table (Column Shift Detected)",
            "Indeterminate",
        )


class TestDeterminism:
    @settings(**SETTINGS)
    @given(binary_strategy, st.text(min_size=1, max_size=40))
    def test_extract_is_pure(self, payload, url):
        a = extract_document(url, payload)
        b = extract_document(url, payload)
        assert (a.markdown, a.markdown_raw, a.status, a.pages) == (
            b.markdown,
            b.markdown_raw,
            b.status,
            b.pages,
        )


class TestStructuralInvariants:
    @settings(**SETTINGS)
    @given(text_strategy)
    def test_norepeat_only_removes_tokens(self, s):
        """Suppression never invents tokens: output tokens are a
        sub-multiset of input tokens."""
        out = suppress_repeated_ngrams(s)
        from collections import Counter

        cin, cout = Counter(s.split()), Counter(out.split())
        assert all(cout[t] <= cin[t] for t in cout)

    @settings(**SETTINGS)
    @given(st.text(alphabet=st.characters(blacklist_characters="\x00"), max_size=300))
    def test_resolve_tags_idempotent_when_tagless(self, s):
        """With no grounding tags present, P1 only rewrites latex tokens
        and squeezes blank runs — applying it twice equals once."""
        once = resolve_tags_document(s, "j")
        twice = resolve_tags_document(once, "j")
        # not strictly idempotent in general (squeeze is single-pass);
        # but a second pass must never re-expand
        assert len(twice) <= len(once)

    @settings(**SETTINGS)
    @given(text_strategy)
    def test_spans_within_coordinate_space(self, s):
        for span in extract_spans(s):
            assert 0 <= span["x1"] <= span["x2"] <= 999
            assert 0 <= span["y1"] <= span["y2"] <= 999

    @settings(**SETTINGS)
    @given(st.lists(st.text(max_size=60), max_size=8))
    def test_clean_fold_drops_only_blank_pages(self, pages):
        out = assemble_clean(pages)
        for p in pages:
            cleaned, _ = clean_page(p, 0)
            if cleaned is not None and cleaned:
                # every surviving page's cleaned text appears in the fold
                assert cleaned in out

    @settings(**SETTINGS)
    @given(st.lists(st.lists(st.text(alphabet="ab 1", max_size=8), min_size=1, max_size=4), max_size=4))
    def test_table_round_trip(self, rows):
        from deepseek_ocr_customvllm_spark.extractor.blocks import rows_to_html

        # cells containing no markup round-trip through the reference's
        # lossy regex parse after whitespace strip
        stripped = [[c.strip() for c in row] for row in rows]
        assert parse_html_table(rows_to_html(stripped)) == stripped


class TestDecoderProperties:
    @given(
        st.integers(0, 2**31 - 1),
        st.integers(1, 40),
        st.integers(1, 30),
    )
    @settings(max_examples=60, deadline=None)
    def test_bmp_synth_decode_round_trip(self, seed, width, height):
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _decode_bmp,
            synth_bmp,
        )

        img = _decode_bmp(synth_bmp(seed, width=width, height=height))
        assert (img["width"], img["height"]) == (width, height)
        # every pixel matches the generator formula (decoded top-down)
        for y in (0, height - 1):
            src_y = height - 1 - y
            for x in (0, width - 1):
                v = (seed * 2654435761 + src_y * 97 + x * 31) & 0xFFFFFFFF
                assert img["rows"][y][x] == (
                    v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF
                )

    @given(st.integers(0, 2**31 - 1), st.integers(1, 500), st.sampled_from([8000, 16000, 44100]))
    @settings(max_examples=40, deadline=None)
    def test_wav_synth_decode_round_trip(self, seed, n_samples, rate):
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            decode_wav,
            synth_wav,
        )

        a = decode_wav(synth_wav(seed, n_samples=n_samples, rate=rate))
        assert a["n_samples"] == n_samples
        assert a["sample_rate"] == rate
        assert a["duration_ms"] == (n_samples * 1000) // rate

    @given(st.binary(max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_feature_rows_total_on_garbage(self, payload):
        """Arbitrary bytes must never raise — they become 'unsupported'."""
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            audio_feature_row,
            image_feature_row,
        )

        assert image_feature_row(0, payload)["media_id"] == 0
        assert audio_feature_row(0, payload)["media_id"] == 0
