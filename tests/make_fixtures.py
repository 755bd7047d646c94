"""Regenerate the committed golden fixtures (FIXTURES.md §2).

Run from the repo root:  python tests/make_fixtures.py

The fixtures are the frozen byte-exact contract of the extractor: for
each of the first ``N_FIXTURE_DOCS`` synthetic corpus rows we commit the
clean markdown, raw markdown, and canonical blocks JSON.  Any change to
extractor behaviour that alters these files is a breaking change and
must be deliberate (regenerate + review the diff).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepseek_ocr_customvllm_spark.extractor.engine import (  # noqa: E402
    document_envelope,
    envelope_json,
    extract_document,
)
from deepseek_ocr_customvllm_spark.sources.pagegen import (  # noqa: E402
    SYNTH_MAX_BYTES,
    synth_page,
)

N_FIXTURE_DOCS = 40
# Family-targeted extras beyond the contiguous prefix (found by corpus
# scan; each pins a code path the prefix happens not to cover):
#   50  - truncated tag-soup edge case
#   102 - oversize document (> SYNTH_MAX_BYTES -> REJECTED)
EXTRA_FIXTURE_DOCS = (50, 102)
FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def fixture_indices():
    return list(range(N_FIXTURE_DOCS)) + list(EXTRA_FIXTURE_DOCS)


def fixture_slug(i: int) -> str:
    return f"doc{i:04d}"


def build_fixture(i: int) -> dict:
    row = synth_page(i)
    result = extract_document(row["url"], row["html"], max_bytes=SYNTH_MAX_BYTES)
    envelope = document_envelope(
        result,
        source_filename=row["url"],
        processed_at=row["warc_ts"].isoformat() + "+00:00",
    )
    return {
        "slug": fixture_slug(i),
        "url": row["url"],
        "status": result.status,
        "content_type": result.content_type,
        "markdown": result.markdown,
        "markdown_raw": result.markdown_raw,
        "blocks_json": envelope_json(envelope),
        "spans": result.spans,
    }


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    index = []
    for i in fixture_indices():
        fx = build_fixture(i)
        slug = fx["slug"]
        with open(os.path.join(FIXTURE_DIR, f"{slug}.md"), "w", encoding="utf-8") as f:
            f.write(fx["markdown"])
        with open(os.path.join(FIXTURE_DIR, f"{slug}_raw.md"), "w", encoding="utf-8") as f:
            f.write(fx["markdown_raw"])
        with open(os.path.join(FIXTURE_DIR, f"{slug}.blocks.json"), "w", encoding="utf-8") as f:
            f.write(fx["blocks_json"])
        index.append(
            {
                "i": i,
                "slug": slug,
                "url": fx["url"],
                "status": fx["status"],
                "content_type": fx["content_type"],
                "n_spans": len(fx["spans"]),
            }
        )
    with open(os.path.join(FIXTURE_DIR, "index.json"), "w", encoding="utf-8") as f:
        json.dump(index, f, indent=2, ensure_ascii=False)
    print(f"wrote {len(index)} fixtures to {FIXTURE_DIR}")


if __name__ == "__main__":
    main()
