"""Deterministic n-gram repetition suppression.

Text-domain analogue of the reference's ``NoRepeatNGramLogitsProcessor``
(``process/ngram_norepeat.py:7-40``): during generation the model is
banned from completing any n-gram (service: n=20, window=50 tokens,
``app/core/model_init.py:44-48``; batch CLI: n=40, window=90,
``Scripts/run_batch.py:37``) that already occurred in the trailing
window, with the ``<td>``/``</td>`` token ids whitelisted so table markup
may repeat.

The rebuild has no generative decoder, so the analogue operates on the
assembled page text: a *run* of ``ngram_size`` whitespace tokens that
already occurs contiguously within the trailing ``window_size`` emitted
tokens is dropped (guards against nav-menu / footer repetition in
scraped HTML).  Table content is exempt, mirroring the whitelist: lines
that are markdown-pipe rows or contain HTML table markup are never
suppressed and never trigger suppression.

Deterministic, pure; lines in which nothing was dropped are emitted
verbatim (byte-preserving), lines with drops are re-joined with single
spaces (or removed when emptied).
"""

from __future__ import annotations

import re
from typing import List, Tuple

# Service-path config (app/core/model_init.py:44-48).
NGRAM_SIZE = 20
WINDOW_SIZE = 50
# Batch-CLI config (Scripts/run_batch.py:37).
BATCH_CLI_NGRAM_SIZE = 40
BATCH_CLI_WINDOW_SIZE = 90

_TABLE_LINE_RE = re.compile(r"<table|<td|</td|<tr", re.IGNORECASE)


def _is_exempt_line(line: str) -> bool:
    stripped = line.lstrip()
    return stripped.startswith("|") or bool(_TABLE_LINE_RE.search(line))


def suppress_repeated_ngrams(
    text: str,
    ngram_size: int = NGRAM_SIZE,
    window_size: int = WINDOW_SIZE,
) -> str:
    """Drop repeated ``ngram_size``-token runs within a trailing window.

    Scans the document's whitespace tokens in order, keeping a history of
    emitted (non-exempt) tokens.  When the next ``ngram_size`` tokens all
    come from non-exempt lines and appear contiguously within the last
    ``window_size`` emitted tokens, that run is dropped and the scan
    continues after it (a 2n-token repeat is removed as two n-blocks; a
    trailing partial repeat shorter than n survives — same granularity
    the reference's token-level ban gives a greedy decoder).
    """
    lines = text.split("\n")
    # Flatten to (line_idx, token, exempt).
    stream: List[Tuple[int, str, bool]] = []
    for li, line in enumerate(lines):
        exempt = _is_exempt_line(line)
        for tok in line.split():
            stream.append((li, tok, exempt))

    # History n-grams are tracked incrementally: `grams` maps each n-gram of
    # consecutive *emitted* tokens to the emitted-index where it starts;
    # a gram counts as "within the trailing window" while its start index
    # is >= len(emitted) - window_size.  Semantically identical to scanning
    # emitted[-window_size:] for the run, but O(1) per lookup instead of
    # O(window * n) (the golden fixtures pin the equivalence).
    from collections import deque

    emitted: List[str] = []  # history of emitted token strings
    dropped: set = set()  # indices into `stream` that were suppressed
    grams: dict = {}  # gram tuple -> count of live occurrences
    live: deque = deque()  # (start_idx, gram) in emission order

    def _emit(tok: str) -> None:
        emitted.append(tok)
        j = len(emitted)
        if j >= ngram_size:
            gram = tuple(emitted[j - ngram_size : j])
            grams[gram] = grams.get(gram, 0) + 1
            live.append((j - ngram_size, gram))
        # evict grams whose start fell out of the window
        floor = j - window_size
        while live and live[0][0] < floor:
            _, old = live.popleft()
            cnt = grams[old] - 1
            if cnt:
                grams[old] = cnt
            else:
                del grams[old]

    i = 0
    n_stream = len(stream)
    while i < n_stream:
        _, tok, exempt = stream[i]
        if not exempt and i + ngram_size <= n_stream:
            run = stream[i : i + ngram_size]
            if all(not e for _, _, e in run):
                run_toks = tuple(t for _, t, _ in run)
                if run_toks in grams:
                    for j in range(i, i + ngram_size):
                        dropped.add(j)
                    i += ngram_size
                    continue
        _emit(tok)
        i += 1

    if not dropped:
        return text

    # Rebuild: untouched lines verbatim; touched lines re-joined from the
    # surviving tokens; fully-emptied lines removed.
    touched_lines = {stream[j][0] for j in dropped}
    keep_tokens: dict = {}
    for idx, (li, tok, _) in enumerate(stream):
        if li in touched_lines and idx not in dropped:
            keep_tokens.setdefault(li, []).append(tok)

    out_lines: List[str] = []
    for li, line in enumerate(lines):
        if li not in touched_lines:
            out_lines.append(line)
        else:
            remaining = keep_tokens.get(li, [])
            if remaining:
                out_lines.append(" ".join(remaining))
            # emptied line dropped entirely
    return "\n".join(out_lines)
