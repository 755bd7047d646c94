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
    # '<' guard: the table-markup regex cannot match without one, and
    # most lines have none
    return stripped.startswith("|") or (
        "<" in line and bool(_TABLE_LINE_RE.search(line))
    )


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
    n = ngram_size
    toks = text.split()
    n_stream = len(toks)
    if n_stream < n:
        return text

    # Fast path — most documents contain no repeated n-gram at all, and the
    # suppression loop's per-token bookkeeping is the single hottest spot in
    # the whole extractor.  Soundness: the first drop the full algorithm
    # could ever make requires emitted == raw prefix at that point, i.e. two
    # IDENTICAL CONTIGUOUS n-grams in the raw token stream (by induction:
    # before the first drop nothing has been removed).  So if no duplicate
    # n-gram exists anywhere in the raw stream, the output is the input
    # verbatim.  The scan is EXACT: each window is the token-aligned slice
    # of the single-space-joined stream (tokens contain no whitespace, so
    # equal slices <=> equal token runs), and slicing + set membership run
    # at C speed — measurably faster than a rolling-hash loop in Python.
    from itertools import accumulate

    joined = " ".join(toks)
    # list comprehension, not a genexpr: the per-item generator frame
    # switch is measurable at one call per token per page
    offs = list(accumulate([len(t) + 1 for t in toks], initial=0))
    seen_w = set()
    add_w = seen_w.add
    first_dup = -1  # start index of the FIRST repeated window's 2nd copy
    i = 0
    # zip over (start, end) offset pairs: same windows as indexing
    # offs[i]/offs[i+n], minus two list index ops per token (this scan
    # runs once per page over every token)
    for a, b in zip(offs, offs[n:]):
        w = joined[a : b - 1]
        if w in seen_w:
            first_dup = i
            break
        add_w(w)
        i += 1
    if first_dup < 0:
        return text

    lines = text.split("\n")
    MOD = (1 << 61) - 1
    BASE = 1_000_003
    BPOW = pow(BASE, n - 1, MOD)
    tok_h = [hash(t) & 0x7FFFFFFF for t in toks]

    # Slow path — flatten to (line_idx, token, exempt) and run the exact
    # windowed suppression.  History n-grams are tracked incrementally with
    # a rolling polynomial hash; on a hash hit the candidate is confirmed by
    # exact token comparison, so collisions (and Python's per-process
    # string-hash randomization) can never change the output — the golden
    # fixtures pin the equivalence with the direct windowed scan.  O(1)
    # amortized per token instead of O(window * n).
    from collections import deque

    stream: List[Tuple[int, str, bool]] = []
    for li, line in enumerate(lines):
        exempt = _is_exempt_line(line)
        for tok in line.split():
            stream.append((li, tok, exempt))
    exempt_flags = [e for _, _, e in stream]

    # next_exempt[i] = smallest j >= i with an exempt token (n_stream if none)
    next_exempt = [n_stream] * (n_stream + 1)
    for i in range(n_stream - 1, -1, -1):
        next_exempt[i] = i if exempt_flags[i] else next_exempt[i + 1]

    emitted: List[str] = []  # history of emitted token strings
    dropped: set = set()  # indices into `stream` that were suppressed
    # live history grams: hash -> deque of start indices into `emitted`
    starts: dict = {}
    live: deque = deque()  # (start_idx, hash) in emission order
    emit_roll = 0  # rolling hash of the last n emitted tokens' hashes
    emit_hashes: deque = deque()  # their individual hashes, len <= n

    def _emit(tok: str) -> None:
        nonlocal emit_roll
        emitted.append(tok)
        h = hash(tok) & 0x7FFFFFFF
        emit_hashes.append(h)
        if len(emit_hashes) > n:
            old = emit_hashes.popleft()
            emit_roll = (emit_roll - old * BPOW) % MOD
        emit_roll = (emit_roll * BASE + h) % MOD if len(emit_hashes) > 1 else h % MOD
        j = len(emitted)
        # Register only when emit_roll covers a FULL n tokens.  After the
        # bulk prefix extend, the first n-1 _emit calls have j >= n but a
        # partial emit_hashes; their grams span the bulk boundary and are
        # already outside the live window by the first check at first_dup
        # (warm0 = first_dup - window_size - n + 1), so never registering
        # them is exact — and no longer an implicit floor-prune invariant.
        if len(emit_hashes) == n:
            s = j - n
            starts.setdefault(emit_roll, deque()).append(s)
            live.append((s, emit_roll))
        floor = j - window_size
        while live and live[0][0] < floor:
            s0, h0 = live.popleft()
            dq = starts[h0]
            dq.popleft()
            if not dq:
                del starts[h0]

    def _input_hash(i: int) -> int:
        acc = 0
        for k in range(i, i + n):
            acc = (acc * BASE + tok_h[k]) % MOD
        return acc

    # No drop can occur before ``first_dup`` (a drop at i needs an
    # identical earlier window, and the fast scan found the FIRST such
    # pair), so the prefix bulk-emits with zero bookkeeping; only the
    # trailing (window + n - 1) tokens before it need the rolling
    # structures warmed so every gram that could still be in the live
    # window at first_dup is registered.
    warm0 = max(0, first_dup - window_size - n + 1)
    emitted.extend(toks[:warm0])
    for t in toks[warm0:first_dup]:
        _emit(t)

    i = first_dup
    in_roll = -1  # rolling hash of toks[i:i+n]; -1 = needs recompute
    while i < n_stream:
        exempt = exempt_flags[i]
        if not exempt and i + n <= n_stream and next_exempt[i] >= i + n:
            if in_roll < 0:
                in_roll = _input_hash(i)
            cand = starts.get(in_roll)
            matched = False
            if cand:
                window = toks[i : i + n]
                for s in cand:
                    if emitted[s : s + n] == window:
                        matched = True
                        break
            if matched:
                for j in range(i, i + n):
                    dropped.add(j)
                i += n
                in_roll = -1
                continue
        _emit(toks[i])
        # roll the input hash forward by one token
        if in_roll >= 0 and i + n < n_stream:
            in_roll = ((in_roll - tok_h[i] * BPOW) * BASE + tok_h[i + n]) % MOD
        else:
            in_roll = -1
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
