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


# ---------------------------------------------------------------------------
# True TEDS: tree edit distance over table HTML trees
# ---------------------------------------------------------------------------
#
# The reference's ``Scripts/table_diff.py`` scores predictions with the
# PubTabNet TEDS metric: tree edit distance between HTML trees where
# insert/delete cost 1, renaming differing tags costs 1, and renaming a
# ``<td>`` onto a ``<td>`` costs the normalized string edit distance of
# the cell contents; similarity = 1 - TED / max(|T_a|, |T_b|).  The edit
# distance itself is the Zhang-Shasha ordered-tree algorithm (published
# 1989) — implemented here from the paper, no external APTED dependency.
# Tables are small trees, so the O(n^2 * min-depth terms) cost is trivial.


class _TedsNode:
    __slots__ = ("tag", "text", "children")

    def __init__(self, tag: str, text: str = ""):
        self.tag = tag
        self.text = text
        self.children: List["_TedsNode"] = []


def html_table_tree(html: str) -> _TedsNode:
    """Parse (possibly messy) table HTML into an ordered tree.

    A real HTML parse (stdlib HTMLParser), NOT the block layer's lossy
    ``<td>``-only regex: ``<th>``, ``<thead>``/``<tbody>`` and nesting all
    become tree structure the metric can see.
    """
    from html.parser import HTMLParser

    class _P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.root = _TedsNode("root")
            self.stack = [self.root]

        def handle_starttag(self, tag, attrs):
            node = _TedsNode(tag)
            self.stack[-1].children.append(node)
            self.stack.append(node)

        def handle_endtag(self, tag):
            for k in range(len(self.stack) - 1, 0, -1):
                if self.stack[k].tag == tag:
                    del self.stack[k:]
                    break

        def handle_data(self, data):
            data = data.strip()
            if data:
                top = self.stack[-1]
                top.text = (top.text + " " + data).strip() if top.text else data

    p = _P()
    p.feed(html)
    return p.root


def _postorder(root: _TedsNode):
    """Zhang-Shasha preliminaries: postorder nodes, leftmost-leaf index
    per node, and the keyroots."""
    nodes: List[_TedsNode] = []
    lml: List[int] = []

    def visit(n: _TedsNode) -> int:
        first_leaf = None
        for c in n.children:
            leaf = visit(c)
            if first_leaf is None:
                first_leaf = leaf
        nodes.append(n)
        idx = len(nodes) - 1
        lml.append(first_leaf if first_leaf is not None else idx)
        return lml[idx]

    visit(root)
    keyroots = [
        i for i in range(len(nodes)) if not any(lml[j] == lml[i] for j in range(i + 1, len(nodes)))
    ]
    return nodes, lml, keyroots


def _rename_cost(a: _TedsNode, b: _TedsNode) -> float:
    if a.tag != b.tag:
        return 1.0
    if a.tag in ("td", "th") and (a.text or b.text):
        if not a.text or not b.text:
            return 1.0
        return _levenshtein(a.text, b.text) / max(len(a.text), len(b.text))
    return 0.0


def tree_edit_distance(ta: _TedsNode, tb: _TedsNode) -> float:
    """Zhang-Shasha ordered tree edit distance with TEDS costs."""
    an, al, akr = _postorder(ta)
    bn, bl, bkr = _postorder(tb)
    na, nb = len(an), len(bn)
    td = [[0.0] * nb for _ in range(na)]

    for i in akr:
        for j in bkr:
            # forest distance over subforests rooted at keyroots i, j
            ioff, joff = al[i], bl[j]
            m, n = i - ioff + 2, j - joff + 2
            fd = [[0.0] * n for _ in range(m)]
            for x in range(1, m):
                fd[x][0] = fd[x - 1][0] + 1.0  # delete
            for y in range(1, n):
                fd[0][y] = fd[0][y - 1] + 1.0  # insert
            for x in range(1, m):
                for y in range(1, n):
                    ai, bj = ioff + x - 1, joff + y - 1
                    if al[ai] == al[i] and bl[bj] == bl[j]:
                        fd[x][y] = min(
                            fd[x - 1][y] + 1.0,
                            fd[x][y - 1] + 1.0,
                            fd[x - 1][y - 1] + _rename_cost(an[ai], bn[bj]),
                        )
                        td[ai][bj] = fd[x][y]
                    else:
                        fd[x][y] = min(
                            fd[x - 1][y] + 1.0,
                            fd[x][y - 1] + 1.0,
                            fd[al[ai] - ioff][bl[bj] - joff] + td[ai][bj],
                        )
    return td[na - 1][nb - 1]


def teds(html_a: str, html_b: str) -> float:
    """Tree-Edit-Distance Similarity between two table HTML strings
    (1.0 = identical; the reference's ``Scripts/table_diff.py`` metric)."""
    ta, tb = html_table_tree(html_a), html_table_tree(html_b)
    na = len(_postorder(ta)[0])
    nb = len(_postorder(tb)[0])
    if na <= 1 and nb <= 1:
        return 1.0
    return 1.0 - tree_edit_distance(ta, tb) / max(na, nb)


def mean_teds(pairs: Iterable[Tuple[str, str]]) -> float:
    """Batch average TEDS (``Scripts/table_diff.py:54-74``)."""
    scores = [teds(a, b) for a, b in pairs]
    return sum(scores) / len(scores) if scores else 0.0
