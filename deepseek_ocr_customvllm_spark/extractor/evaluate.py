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


# ---------------------------------------------------------------------------
# Table-structure similarity (TEDS analogue)
# ---------------------------------------------------------------------------
#
# The reference scores table fidelity with TEDS (tree edit distance over
# table HTML vs PubTabNet ground truth, ``Scripts/table_diff.py:7-58``).
# Our block trees carry tables as ``rows: List[List[str]]``, so the
# analogue is a two-level edit distance: row alignment by Levenshtein
# where the substitution cost of two rows is their normalized cell-level
# edit distance (cells compared by exact string equality).  This is the
# TEDS recursion specialised to depth-2 trees — exact for the grid-shaped
# tables the block layer produces, without the general APTED machinery.


def _row_distance(a: List[str], b: List[str]) -> float:
    """Normalized cell-level edit distance between two rows (0..1)."""
    if not a and not b:
        return 0.0
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            sub = prev[j - 1] + (0 if a[i - 1] == b[j - 1] else 1)
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub)
        prev = cur
    return prev[-1] / max(la, lb)


def table_similarity(
    rows_a: List[List[str]], rows_b: List[List[str]]
) -> float:
    """TEDS-style structural similarity between two tables (1.0 = same)."""
    if not rows_a and not rows_b:
        return 1.0
    la, lb = len(rows_a), len(rows_b)
    prev = [float(j) for j in range(lb + 1)]
    for i in range(1, la + 1):
        cur = [float(i)] + [0.0] * lb
        for j in range(1, lb + 1):
            sub = prev[j - 1] + _row_distance(rows_a[i - 1], rows_b[j - 1])
            cur[j] = min(prev[j] + 1.0, cur[j - 1] + 1.0, sub)
        prev = cur
    return 1.0 - prev[-1] / max(la, lb)


def mean_table_similarity(
    pairs: Iterable[Tuple[List[List[str]], List[List[str]]]]
) -> float:
    """Batch average (``Scripts/table_diff.py:54-74`` analogue)."""
    scores = [table_similarity(a, b) for a, b in pairs]
    return sum(scores) / len(scores) if scores else 0.0
