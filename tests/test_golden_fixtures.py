"""Golden-fixture byte-identity tests (FIXTURES.md §2, SURVEY.md §5.2).

Mirrors the reference's end-to-end golden-output test strategy
(``Scripts/eval_CER.py``): run the full extractor over the deterministic
synthetic corpus and byte-compare against the committed expected files.
Regenerate deliberately with ``python tests/make_fixtures.py``.
"""

import json
import os

import pytest

from deepseek_ocr_customvllm_spark.extractor.engine import (
    document_envelope,
    envelope_json,
    extract_document,
)
from deepseek_ocr_customvllm_spark.sources.pagegen import SYNTH_MAX_BYTES, synth_page

from tests.make_fixtures import FIXTURE_DIR, N_FIXTURE_DOCS, fixture_slug

with open(os.path.join(FIXTURE_DIR, "index.json"), encoding="utf-8") as _f:
    _INDEX = json.load(_f)


def _read(path: str) -> str:
    with open(path, encoding="utf-8") as f:
        return f.read()


@pytest.mark.parametrize("entry", _INDEX, ids=[e["slug"] for e in _INDEX])
def test_byte_identical(entry):
    i = entry["i"]
    row = synth_page(i)
    assert row["url"] == entry["url"]
    result = extract_document(row["url"], row["html"], max_bytes=SYNTH_MAX_BYTES)
    assert result.status == entry["status"]
    assert result.content_type == entry["content_type"]

    slug = fixture_slug(i)
    assert result.markdown == _read(os.path.join(FIXTURE_DIR, f"{slug}.md"))
    assert result.markdown_raw == _read(os.path.join(FIXTURE_DIR, f"{slug}_raw.md"))

    envelope = document_envelope(
        result,
        source_filename=row["url"],
        processed_at=row["warc_ts"].isoformat() + "+00:00",
    )
    assert envelope_json(envelope) == _read(
        os.path.join(FIXTURE_DIR, f"{slug}.blocks.json")
    )
    assert len(result.spans) == entry["n_spans"]


def test_fixture_corpus_covers_families():
    """The committed fixture set must keep exercising every family."""
    from tests.make_fixtures import fixture_indices

    statuses = {e["status"] for e in _INDEX}
    ctypes = {e["content_type"] for e in _INDEX}
    assert "SUCCESS" in statuses
    assert "REJECTED" in statuses  # oversize quarantine path pinned
    assert "pdf" in ctypes and "html" in ctypes and "empty" in ctypes
    assert len(_INDEX) == len(fixture_indices())
