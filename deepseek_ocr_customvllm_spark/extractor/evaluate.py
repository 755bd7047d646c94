"""Offline evaluation utilities — the reference's quality-measurement
layer, re-implemented.

- :func:`normalize_markdown`  — ``Scripts/clean_markdown.py:4-30``:
  flatten markdown to comparable plain text (page-split markers removed,
  markdown punctuation stripped, whitespace squeezed).
- :func:`normalize_for_cer`   — ``Scripts/eval_CER.py:63-69``: the
  lighter whitespace-only normalizer.
- :func:`character_error_rate` — ``Scripts/eval_CER.py:85-95``:
  Levenshtein distance / reference length (pure-Python O(n*m) DP with
  two rows; the reference uses the ``editdistance`` package).
- :func:`mean_cer`            — the batch average (``eval_CER.py:116-158``).

These power the golden-fixture *robustness* tests: perturbed inputs must
be CER-0 after normalization where the reference's normalizers are
insensitive, and CER>0 where they are not.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Tuple

_PAGE_SPLIT_RE = re.compile(r"<---\s*Page\s*Split\s*--->")
# clean_markdown.py:14 — markdown structural characters stripped for
# comparison (the reference's exact class, as a regex alternation).
_MD_CHARS_RE = re.compile(r"(\*\*|\*|#|!|\\\||<|>|-|=)")
_WS_RE = re.compile(r"\s+")


def normalize_markdown(text: str) -> str:
    """Markdown -> comparable plain text (P8)."""
    text = _PAGE_SPLIT_RE.sub(" ", text)
    text = _MD_CHARS_RE.sub("", text)
    text = text.replace('"', "")
    text = text.replace("\n", " ")
    text = _WS_RE.sub(" ", text)
    return text.strip()


def normalize_for_cer(text: str) -> str:
    """Whitespace-only normalization (P9)."""
    return _WS_RE.sub(" ", text).strip()


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, start=1):
            cur[j] = min(
                prev[j] + 1,  # deletion
                cur[j - 1] + 1,  # insertion
                prev[j - 1] + (ca != cb),  # substitution
            )
        prev = cur
    return prev[-1]


def character_error_rate(reference: str, hypothesis: str) -> float:
    """CER = edit_distance / len(reference); 0.0 for two empty strings."""
    ref = normalize_for_cer(reference)
    hyp = normalize_for_cer(hypothesis)
    if not ref:
        return 0.0 if not hyp else 1.0
    return _levenshtein(ref, hyp) / len(ref)


def mean_cer(pairs: Iterable[Tuple[str, str]]) -> float:
    """Average CER over (reference, hypothesis) pairs."""
    scores: List[float] = [character_error_rate(r, h) for r, h in pairs]
    return sum(scores) / len(scores) if scores else 0.0
