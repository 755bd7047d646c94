"""Grounding-tag handling.

The reference model emits markdown with inline grounding tags

    <|ref|>label<|/ref|><|det|>[[x1,y1,x2,y2], ...]<|/det|>

in a 0-999 normalized coordinate space, terminated by the sentinel
``<｜end▁of▁sentence｜>``.  This module reproduces the reference's tag
resolution exactly:

- tag regex + image/other split: reference ``app/utils/postprocess_md.py:53-65``
- P1 clean ("extract_content"):   reference ``app/utils/postprocess_md.py:26-50``
- coordinate parse + clamp/swap:  reference ``app/utils/postprocess_md.py:68-78,103-110``

The only deliberate deviation: coordinates are parsed with
``ast.literal_eval`` (the reference uses ``eval``, which is unsafe on
untrusted model output), and — because the rebuild's input table carries
no pixel data — spans stay in the 0-999 space instead of being scaled to
image pixels (clamp + corner-swap semantics preserved verbatim).
"""

from __future__ import annotations

import ast
import re
from functools import lru_cache as _lru_cache
from typing import List, Optional, Tuple

EOS_TOKEN = "<｜end▁of▁sentence｜>"

# Identical pattern to the reference (postprocess_md.py:36,54): the three
# capture groups are (whole tag, label, coordinate-list source).
TAG_PATTERN = re.compile(
    r"(<\|ref\|>(.*?)<\|/ref\|><\|det\|>(.*?)<\|/det\|>)", re.DOTALL
)

_IMAGE_REF = "<|ref|>image<|/ref|>"

TagMatch = Tuple[str, str, str]


def find_tags(text: str) -> Tuple[List[TagMatch], List[str], List[str]]:
    """Split grounding tags into image refs vs everything else.

    Mirrors ``re_match`` (postprocess_md.py:53-65): returns
    ``(all_matches, image_tag_strings, other_tag_strings)``.

    The engine calls this up to three times per page on the same text
    (per-page clean, P1 resolve, span extraction); the tiny LRU makes
    the repeats a dict hit instead of a DOTALL regex scan.  Callers
    never mutate the returned lists (they only iterate), so sharing the
    result objects is safe.
    """
    return _find_tags_cached(text)


@_lru_cache(maxsize=8)
def _find_tags_cached(text: str) -> Tuple[List[TagMatch], List[str], List[str]]:
    if "<|ref|>" not in text:  # one C scan; most non-tagged pages exit here
        return [], [], []
    matches = TAG_PATTERN.findall(text)
    image_tags: List[str] = []
    other_tags: List[str] = []
    for m in matches:
        if _IMAGE_REF in m[0]:
            image_tags.append(m[0])
        else:
            other_tags.append(m[0])
    return matches, image_tags, other_tags


def resolve_tags_document(text: str, doc_id: str) -> str:
    """P1 clean — reference ``extract_content`` (postprocess_md.py:26-50).

    - drop the end-of-sentence sentinel
    - image tags -> ``![](./{doc_id}/images/{i}.jpg)\\n`` (enumerated in
      match order across the whole text)
    - all other tags deleted
    - ``\\coloneqq`` -> ``:=``; ``\\eqqcolon`` -> ``=:``  (NO trailing
      space here — the per-page variant in :func:`markdown.clean_page`
      differs; both behaviours are intentional, see postprocess_md.py:48
      vs :281)
    - squeeze blank runs: 4 newlines -> 2, then 3 -> 2 (single pass each,
      exactly like the reference's chained ``str.replace``)
    """
    if EOS_TOKEN in text:
        text = text.replace(EOS_TOKEN, "")
    _, image_tags, other_tags = find_tags(text)
    for idx, tag in enumerate(image_tags):
        text = text.replace(tag, f"![](./{doc_id}/images/{idx}.jpg)\n")
    for tag in other_tags:
        text = text.replace(tag, "")
    text = text.replace("\\coloneqq", ":=").replace("\\eqqcolon", "=:")
    text = text.replace("\n\n\n\n", "\n\n").replace("\n\n\n", "\n\n")
    return text


def parse_tag_boxes(match: TagMatch) -> Optional[Tuple[str, List[List[int]]]]:
    """Parse one tag triple into ``(label, [[x1,y1,x2,y2], ...])``.

    Reference ``extract_coordinates_and_label`` (postprocess_md.py:68-78),
    with ``ast.literal_eval`` instead of ``eval``.  Returns ``None`` on any
    parse failure (the reference swallows and skips, too).
    """
    try:
        label = match[1]
        boxes = ast.literal_eval(match[2])
        if not isinstance(boxes, (list, tuple)):
            return None
        return label, [list(b) for b in boxes]
    except Exception:
        return None


def normalize_box(box: List[int]) -> Optional[Tuple[int, int, int, int]]:
    """Clamp a 0-999 box and swap inverted corners.

    Mirrors the scale-and-clamp at postprocess_md.py:103-110, applied in
    the 0-999 space itself (dims = 999): clamp each coordinate into
    [0, 999], then swap corners so x1<=x2, y1<=y2.
    """
    try:
        x1, y1, x2, y2 = (int(v) for v in box)
    except Exception:
        return None
    left = max(0, min(x1, 999))
    top = max(0, min(y1, 999))
    right = max(0, min(x2, 999))
    bottom = max(0, min(y2, 999))
    if left > right:
        left, right = right, left
    if top > bottom:
        top, bottom = bottom, top
    return left, top, right, bottom


def extract_spans(page_text: str) -> List[dict]:
    """All grounding spans in one page's tagged text.

    Each span: ``{label, x1, y1, x2, y2, valid}`` where ``valid`` carries
    the reference's crop guard ``width > 2 and height > 2``
    (postprocess_md.py:117-118) so downstream consumers can apply the
    same skip rule the crop path uses.
    """
    matches, _, _ = find_tags(page_text)
    spans: List[dict] = []
    for m in matches:
        parsed = parse_tag_boxes(m)
        if parsed is None:
            continue
        label, boxes = parsed
        for box in boxes:
            norm = normalize_box(box)
            if norm is None:
                continue
            x1, y1, x2, y2 = norm
            spans.append(
                {
                    "label": label,
                    "x1": x1,
                    "y1": y1,
                    "x2": x2,
                    "y2": y2,
                    "valid": (x2 - x1) > 2 and (y2 - y1) > 2,
                }
            )
    return spans
