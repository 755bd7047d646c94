"""Robustness / perturbation corpus (FIXTURES.md §5).

Text-domain analogues of the reference's seeded image perturbations
(``Scripts/augument_img.py:179-207``): each named perturbation family is
applied to the synthetic HTML corpus and the extractor's output is
asserted *invariant* where the HTML semantics are unchanged
(whitespace-between-tags jitter, tag-case shuffling, attribute
reordering, entity-encoding variants, line-ending changes) and
*sensitive* where content actually changed — measured with the
reference's own normalizers (``extractor/evaluate.py``).
"""

import random
import re

import pytest

from deepseek_ocr_customvllm_spark.extractor.engine import extract_document
from deepseek_ocr_customvllm_spark.extractor.evaluate import (
    character_error_rate,
    mean_cer,
    normalize_for_cer,
    normalize_markdown,
)
from deepseek_ocr_customvllm_spark.sources.pagegen import synth_page

SEED = 42
N_DOCS = 12


def _html_docs():
    """First HTML docs of the corpus (skip PDFs/edge cases)."""
    out = []
    i = 0
    while len(out) < N_DOCS:
        row = synth_page(i)
        if row["html"][:5] != b"%PDF-" and row["html"].strip():
            out.append(row)
        i += 1
    return out


DOCS = _html_docs()


def _markdown(html: bytes, url: str) -> str:
    return extract_document(url, html, max_bytes=1024 * 1024).markdown


# -- perturbation families (seeded, deterministic) --------------------------

def perturb_intertag_whitespace(html: str, rng) -> str:
    """Whitespace jitter BETWEEN markup tags.  Grounding-tag markers
    (``<|...|>``) are text content whose adjacency is semantic
    (``postprocess_md.py:54``), so ``>``/``<`` next to ``|`` is skipped."""
    return re.sub(
        r"(?<!\|)>\s*<(?!\|)",
        lambda m: ">" + " \n"[rng.randint(0, 1)] * rng.randint(0, 2) + "<",
        html,
    )


def perturb_tag_case(html: str, rng) -> str:
    def flip(m):
        name = m.group(2)
        return m.group(1) + (name.upper() if rng.random() < 0.5 else name) + m.group(3)

    return re.sub(r"(</?)([a-zA-Z][a-zA-Z0-9]*)([ >])", flip, html)


def perturb_attr_quotes(html: str, rng) -> str:
    """href='x' -> href=\"x\"."""
    return html.replace("='", '="').replace("'>", '">').replace("' ", '" ')


def perturb_entity_encoding(html: str, rng) -> str:
    """& inside text -> &amp; (decodes back to the same text)."""
    return re.sub(r"&(?![a-zA-Z#])", "&amp;", html)


def perturb_line_endings(html: str, rng) -> str:
    return html.replace("\n", "\r\n")


INVARIANT_FAMILIES = {
    "tag_case": perturb_tag_case,
    "attr_quotes": perturb_attr_quotes,
    "entity_encoding": perturb_entity_encoding,
}

# families where raw bytes differ but the normalized comparison (the
# reference's clean_markdown.py flattening) must still be identical
NORMALIZED_INVARIANT_FAMILIES = {
    "intertag_whitespace": perturb_intertag_whitespace,
    "line_endings": perturb_line_endings,
}


@pytest.mark.parametrize("family", sorted(INVARIANT_FAMILIES), ids=sorted(INVARIANT_FAMILIES))
def test_byte_invariant_families(family):
    fn = INVARIANT_FAMILIES[family]
    rng = random.Random(SEED)
    for row in DOCS:
        base = _markdown(row["html"], row["url"])
        perturbed_html = fn(row["html"].decode("utf-8"), rng).encode("utf-8")
        pert = _markdown(perturbed_html, row["url"])
        assert pert == base, f"{family}: output changed for {row['url']}"


@pytest.mark.parametrize(
    "family", sorted(NORMALIZED_INVARIANT_FAMILIES), ids=sorted(NORMALIZED_INVARIANT_FAMILIES)
)
def test_normalized_invariant_families(family):
    fn = NORMALIZED_INVARIANT_FAMILIES[family]
    rng = random.Random(SEED)
    pairs = []
    for row in DOCS:
        base = _markdown(row["html"], row["url"])
        perturbed_html = fn(row["html"].decode("utf-8"), rng).encode("utf-8")
        pert = _markdown(perturbed_html, row["url"])
        assert normalize_markdown(pert) == normalize_markdown(base), family
        pairs.append((base, pert))
    assert mean_cer(pairs) < 0.02  # near-identical even before flattening


def test_content_change_is_detected():
    """The normalizers must NOT be so aggressive that real content
    edits disappear (sensitivity check)."""
    row = DOCS[0]
    base = _markdown(row["html"], row["url"])
    mutated = row["html"].replace(b"Document", b"Corrupted", 1)
    pert = _markdown(mutated, row["url"])
    assert character_error_rate(base, pert) > 0.0
    assert normalize_markdown(base) != normalize_markdown(pert)


class TestEvalNormalizers:
    def test_normalize_markdown_strips_structure(self):
        md = "# Head\n\n**bold** *it* |cell| <tag> a-b =x\n\n<--- Page Split --->\n\nnext"
        out = normalize_markdown(md)
        assert "#" not in out and "*" not in out and "<" not in out
        assert "Page Split" in out or "next" in out  # text survives

    def test_normalize_for_cer(self):
        assert normalize_for_cer("  a\t b\n c ") == "a b c"

    def test_cer_zero_identity(self):
        assert character_error_rate("abc def", "abc  def") == 0.0

    def test_cer_known_value(self):
        # one substitution over 4 chars
        assert character_error_rate("abcd", "abxd") == pytest.approx(0.25)

    def test_cer_empty_reference(self):
        assert character_error_rate("", "") == 0.0
        assert character_error_rate("", "x") == 1.0
