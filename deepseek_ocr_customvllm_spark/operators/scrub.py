"""Corpus scrubbing operators: cross-corpus boilerplate-paragraph
removal, URL canonicalization dedup, and PII redaction.

These are the cleanup passes a web-scale training-data pipeline runs
between extraction and dedup (cf. CCNet's paragraph-level dedup and the
C4 cleaning recipe — both public):

- :func:`paragraph_dedup` — a paragraph appearing in more than
  ``max_df`` documents is boilerplate (cookie banners, nav, footers)
  and is dropped from EVERY document; body text survives.  This is the
  corpus-frequency complement of the per-page link-density heuristics in
  ``extractor/html_extract.py``: layout-blind, but able to learn what
  "boilerplate" means for each site from repetition alone.
- :func:`canonical_urls` / :func:`url_duplicates` — tracking-parameter
  and fragment stripping so crawl duplicates that differ only in
  ``utm_*``/``#fragment`` collapse to one canonical key.
- :func:`pii_redact` — email/phone pattern redaction with per-document
  counts (training corpora scrub obvious PII before tokenization).

100 TB design notes:

- ``paragraph_dedup`` is two shuffles: (1) paragraph-hash count with
  map-side partial aggregation — the frequent set (df > max_df) is
  bounded above by total_paragraphs / max_df, so at any realistic
  threshold it fits a broadcast; (2) the per-document reassembly
  groupBy.  The frequent set joins back as a BROADCAST anti-join, so
  the full paragraph table is never shuffled for the membership test.
- ``canonical_urls`` / ``pii_redact`` are single-scan narrow maps
  (regexp only, whole-stage codegen, no Python); ``url_duplicates``
  adds the one hash-aggregate shuffle every dedup needs.

Every regex sticks to the dialect-portable subset (character classes,
bounded quantifiers, anchors) that Java's engine and DuckDB's RE2
evaluate identically; the oracles reuse the same pattern strings.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.columns import norm_text

PARA_SEP = "\n\n"

# dialect-portable patterns (Java regex + RE2 agree on this subset).
# Explicit a-zA-Z classes, not lowercase-only: PII scrubbing must catch
# John.Doe@Example.COM, and the input is never pre-lowercased here.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+"
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"
# tracking params are removed by splitting the query string and filtering
# parameters by prefix — regex-only surgery needs lookahead for adjacent
# tracking params, and RE2 (the oracle dialect) has none
# (?i): tracking params appear in any case; (?i) parses identically in
# Java and RE2.
TRACKING_PREFIX_RE = r"(?i)^(utm_[a-z]+|fbclid|gclid)="
FRAGMENT_RE = r"#.*$"
# scheme://host prefix — the ONLY case-insensitive part of a URL per
# RFC 3986 (path and query are case-significant)
SCHEME_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*"


# ---------------------------------------------------------------------------
# boilerplate paragraph removal (CCNet-style corpus-frequency dedup)
# ---------------------------------------------------------------------------

def split_paragraphs(docs: DataFrame) -> DataFrame:
    """``(doc_id, text)`` -> one row per ``(doc_id, idx, para)`` with
    blank-line-separated paragraphs in document order."""
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), PARA_SEP)).alias("idx", "para"),
    ).filter(F.trim(F.col("para")) != "")


def frequent_paragraphs(paras: DataFrame, max_df: int) -> DataFrame:
    """Paragraph hashes appearing in more than ``max_df`` documents.

    One map-side-combined shuffle; the output is bounded by
    total_paragraphs / max_df rows, which is what makes the downstream
    broadcast anti-join safe at corpus scale."""
    return (
        paras.groupBy(F.md5(F.col("para").cast("binary")).alias("ph"))
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") > max_df)
    )


def paragraph_dedup(docs: DataFrame, max_df: int = 10) -> DataFrame:
    """Remove corpus-frequent paragraphs from every document.

    Returns ``(doc_id, clean_text, n_kept, n_dropped)`` — documents whose
    paragraphs are ALL boilerplate survive with an empty ``clean_text``
    (they are what the downstream corpus filter drops, and losing the
    rows silently would corrupt corpus accounting).
    """
    paras = split_paragraphs(docs)
    freq = frequent_paragraphs(paras, max_df)
    # Round 8 fusion (same values, fewer corpus-wide operators): flag
    # boilerplate membership with a broadcast LEFT join instead of an
    # anti-join, then derive the reassembly, the kept count, AND the
    # total count in ONE per-document aggregation — the historical
    # shape ran a second corpus-wide aggregate (totals) plus an outer
    # join to merge them.  collect_list skips nulls, so the
    # when()-guarded struct keeps exactly the non-boilerplate
    # paragraphs; all-boilerplate documents survive with clean_text ''
    # from concat_ws over the empty array.
    flagged = paras.join(
        F.broadcast(freq.select(F.col("ph").alias("_bph"))),
        F.md5(F.col("para").cast("binary")) == F.col("_bph"),
        "left",
    )
    is_kept = F.col("_bph").isNull()
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.concat_ws(
                PARA_SEP,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(is_kept, F.struct("idx", "para"))
                        )
                    ),
                    lambda x: x["para"],
                ),
            ).alias("clean_text"),
            F.sum(F.when(is_kept, 1).otherwise(0)).alias("n_kept"),
            F.count("*").alias("n_paras"),
        )
        .select(
            "doc_id",
            "clean_text",
            F.col("n_kept").cast("int").alias("n_kept"),
            (F.col("n_paras") - F.col("n_kept")).cast("int").alias("n_dropped"),
        )
    )


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

def canonical_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``canonical_url``: fragment stripped, scheme+host lowercased
    (ONLY those — path/query case is significant per RFC 3986), tracking
    params (utm_*/fbclid/gclid) and empty params filtered out of the
    query string, ``www.`` host prefix dropped, trailing slash trimmed.
    Pure whole-stage-codegen expressions — no UDF."""
    raw = F.regexp_replace(F.col(url_col), FRAGMENT_RE, "")
    prefix = F.regexp_extract(raw, SCHEME_HOST_RE, 0)
    # the www strip runs on the scheme://host PREFIX alone: it contains
    # exactly one '://' (so all-occurrences vs first-occurrence regex
    # semantics cannot diverge between engines), and an embedded URL in
    # the PATH is case/byte-significant content that must not be touched
    prefix = F.regexp_replace(F.lower(prefix), r"://www\.", "://")
    c = F.concat(
        prefix, F.substring(raw, F.length(F.regexp_extract(raw, SCHEME_HOST_RE, 0)) + 1, F.length(raw))
    )
    base = F.split_part(c, F.lit("?"), F.lit(1))
    # trailing-slash trim acts on the BASE (before the query is
    # re-appended, so 'path/?x=1' normalizes to 'path?x=1')
    base = F.regexp_replace(base, r"/$", "")
    q = F.when(F.instr(c, "?") > 0, F.substr(c, F.instr(c, "?") + 1)).otherwise(
        F.lit("")
    )
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PREFIX_RE),
    )
    newq = F.array_join(kept, "&")
    canon = F.when(newq == "", base).otherwise(F.concat(base, F.lit("?"), newq))
    return df.withColumn("canonical_url", canon)


def url_duplicates(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Duplicate groups by canonical URL: ``(canonical_url, n_dups,
    keep_doc_id)`` for groups larger than one — the crawl-frontier
    equivalent of ``dedup.exact_duplicates``."""
    return (
        canonical_urls(df, url_col)
        .groupBy("canonical_url")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, redacted, n_emails, n_phones)``: email/phone matches
    replaced with ``<EMAIL>``/``<PHONE>`` tokens, with per-document match
    counts (counted BEFORE redaction, on the same pattern strings the
    replacement uses)."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("redacted"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)).alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# training-chunk preparation
# ---------------------------------------------------------------------------

def chunk_documents(
    docs: DataFrame, chunk_tokens: int = 100, overlap: int = 10
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard pre-tokenization chunking for LLM training samples.

    ``(doc_id, text)`` -> ``(doc_id, chunk_idx, chunk_text, n_tokens)``:
    whitespace tokens of the normalized text, windows of ``chunk_tokens``
    starting every ``chunk_tokens - overlap``; the last window keeps its
    tail (shorter, never empty).  Pure array expressions over one scan —
    the explode multiplies rows but never shuffles; empty documents
    yield no chunks.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    norm = norm_text("text")
    d = docs.select("doc_id", norm.alias("t")).filter(F.col("t") != "")
    d = d.withColumn("ts", F.split("t", " "))
    # n_chunks = ceil((n - overlap) / step), floored at 1 so every
    # non-empty doc yields a chunk.  greatest() is explicit: the
    # numerator goes negative for tiny docs, where truncating (Spark
    # div, and the installed DuckDB 1.0.0's integer //) and flooring
    # division diverge — the clamp pins the result to 0 in BOTH engines
    # whatever their negative-quotient choice (NOTES "integer division")
    chunks = F.expr(
        f"transform(sequence(0, greatest((size(ts) - {overlap} - 1) div {step}, 0)),"
        f" i -> slice(ts, i * {step} + 1, {chunk_tokens}))"
    )
    out = d.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "toks")
    )
    return out.select(
        "doc_id",
        "chunk_idx",
        F.array_join("toks", " ").alias("chunk_text"),
        F.size("toks").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# C4 line-level cleaning (Raffel et al. 2020, §2.2)
# ---------------------------------------------------------------------------

C4_LINE_WORDS = 8  # lined_corpus: words per derived line
C4_TERMINAL_RE = '[.!?"]$'  # dialect-portable (Java regex == RE2 here)


def lined_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic line-structured corpus derived from ``documents``.

    The testdata ``text`` column is a single-line word stream, so the
    C4-style LINE rules need a derivation (same pattern as
    ``similarity.clustered_embeddings`` / ``semdedup_corpus``: the
    corpus is a pure integer-arithmetic function of the row, replayed
    identically by the DuckDB oracle).  Words chunk into 8-word lines;
    per ``(doc_id, j)`` arithmetic then plants each defect class C4
    §2.2 exists to catch:

    - no terminal punctuation  (``pmod(doc_id*131 + j*29, 4) = 0``)
    - short line (3 words)     (``pmod(doc_id*7 + j*13, 7) = 0``)
    - "javascript" boilerplate (``pmod(doc_id*11 + j*5, 11) = 0``)
    - page-level poison: lorem-ipsum line 0 (``doc_id % 97 = 0``) and a
      code line with ``{`` at line 1 (``doc_id % 89 = 0``) — these kill
      the whole page regardless of per-line outcomes.

    Returns ``(doc_id, j, line)``; one narrow explode, no shuffle.
    """
    k = C4_LINE_WORDS
    lines = F.expr(
        f"""transform(sequence(0, (size(ws) + {k - 1}) div {k} - 1), j ->
      CASE WHEN doc_id % 97 = 0 AND j = 0
             THEN 'lorem ipsum dolor sit amet consectetur adipiscing elit.'
           WHEN doc_id % 89 = 0 AND j = 1
             THEN 'function init() {{ return window.state; }}'
           ELSE concat(
             CASE WHEN pmod(doc_id*11 + j*5, 11) = 0 THEN 'javascript ' ELSE '' END,
             array_join(slice(ws, j*{k} + 1,
               CASE WHEN pmod(doc_id*7 + j*13, 7) = 0 THEN 3 ELSE {k} END), ' '),
             CASE WHEN pmod(doc_id*131 + j*29, 4) != 0 THEN '.' ELSE '' END)
      END)"""
    )
    return (
        docs.select("doc_id", F.split(norm_text("text"), " ").alias("ws"))
        .select("doc_id", F.posexplode(lines).alias("j", "line"))
    )


def c4_line_filter(
    lines: DataFrame, min_words: int = 5, min_kept: int = 3
) -> DataFrame:
    """C4's cleaning recipe over a ``(doc_id, j, line)`` frame.

    Line rules (a line survives iff ALL hold):
    terminal punctuation (``[.!?"]$``), at least ``min_words`` words,
    and no "javascript" mention.  Page rules: any line containing
    "lorem ipsum" or ``{`` kills the page; pages with fewer than
    ``min_kept`` surviving lines are dropped (C4's 3-sentence floor).

    Returns ``(doc_id, n_lines, n_kept, clean_text)`` for surviving
    pages, ``clean_text`` = kept lines joined by newline in line order.

    Scale shape: one narrow projection per line, then ONE
    map-side-combinable groupBy(doc_id) computing all page aggregates
    and the ordered reassembly together — the same single-Exchange
    shape as ``paragraph_dedup``'s rebuild, no window, no join.
    """
    flagged = lines.select(
        "doc_id",
        "j",
        "line",
        (
            F.col("line").rlike(C4_TERMINAL_RE)
            & (F.size(F.split("line", " ")) >= min_words)
            & ~F.lower(F.col("line")).contains("javascript")
        ).alias("keep"),
        (
            F.lower(F.col("line")).contains("lorem ipsum")
            | F.col("line").contains("{")
        ).alias("poison"),
    )
    agg = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
        F.max(F.col("poison").cast("int")).alias("poisoned"),
        F.concat_ws(
            "\n",
            F.expr(
                "transform(array_sort(collect_list(CASE WHEN keep THEN"
                " struct(j, line) END)), x -> x.line)"
            ),
        ).alias("clean_text"),
    )
    return agg.filter(
        (F.col("poisoned") == 0) & (F.col("n_kept") >= min_kept)
    ).select("doc_id", "n_lines", "n_kept", "clean_text")


# ---------------------------------------------------------------------------
# domain blocklist filtering (UT1-style, cf. RefinedWeb's first gate)
# ---------------------------------------------------------------------------

def domain_blocklist_report(hosts_df: DataFrame, blocklist) -> DataFrame:
    """Suffix-matching domain blocklist over ``(doc_id, host)`` rows —
    the adult/fraud/malware URL filtering every web-corpus pipeline
    runs first (RefinedWeb applies the UT1 lists before any content
    work).  A rule blocks the host itself AND every subdomain:
    ``example.com`` blocks ``a.b.example.com``.

    Returns one row per input doc: ``(doc_id, host, blocked_by)`` with
    ``blocked_by`` = the MOST SPECIFIC (longest; ties lexicographically
    greatest) matching rule, or NULL for kept docs — the audit frame a
    crawl team reviews before hard-dropping, and a trivial
    ``filter(blocked_by IS NULL)`` away from the filter itself.

    Scale shape: each host explodes into its ≤label-count dot-suffixes
    (bounded by hostname length, not corpus size) and equi-joins the
    BROADCAST rule list — never a regex scan per rule, never a shuffle
    of the corpus against the list.  The specificity pick is one
    map-side-combinable aggregate using a zero-padded length prefix
    (portable max; no struct-ordering dependence).
    """
    spark = hosts_df.sparkSession
    # explicit schema: an EMPTY blocklist (no rules configured) must
    # yield an all-kept report, not a schema-inference error
    rules = spark.createDataFrame([(r,) for r in blocklist], "rule string")
    sfx = F.expr(
        "transform(sequence(0, size(parts) - 1),"
        " i -> array_join(slice(parts, i + 1, size(parts) - i), '.'))"
    )
    exploded = (
        hosts_df.withColumn("parts", F.split("host", "[.]"))
        .select("doc_id", F.explode(sfx).alias("sfx"))
    )
    hits = (
        exploded.join(F.broadcast(rules), exploded["sfx"] == rules["rule"])
        .groupBy("doc_id")
        .agg(
            F.substring(
                F.max(
                    F.concat(
                        F.lpad(F.length("rule").cast("string"), 4, "0"),
                        F.lit(":"),
                        F.col("rule"),
                    )
                ),
                6,
                10_000,
            ).alias("blocked_by")
        )
    )
    return hosts_df.join(hits, "doc_id", "left").select(
        "doc_id", "host", "blocked_by"
    )


def synthetic_hosts(docs: DataFrame) -> DataFrame:
    """Deterministic ``(doc_id, host)`` frame derived from the documents
    table (it has no url column): ``sub<d%7>.site<d%97>.<tld(d%3)>`` —
    pure arithmetic, replayed identically by the DuckDB oracle."""
    return docs.select(
        "doc_id",
        F.expr(
            "concat('sub', doc_id % 7, '.site', doc_id % 97, '.',"
            " CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'"
            " ELSE 'net' END)"
        ).alias("host"),
    )


# --- unicode normalization (the ftfy-style pass) ---------------------------

# Classic CP1252/latin-1 double-encoding artifacts (the UTF-8 bytes of a
# common non-ASCII char re-read as latin-1).  Literal substrings, not
# regex — identical `contains` semantics in every engine.
MOJIBAKE_MARKERS = (
    "\u00c3\u00a9",  # '\u00e9' double-encoded (renders as A-tilde + copyright)
    "\u00c3\u00a8",  # '\u00e8'
    "\u00c3\u00bc",  # '\u00fc'
    "\u00c3\u00b1",  # '\u00f1'
    "\u00e2\u0080",  # CP1252 punctuation family prefix (\u2019 \u201c \u2013 ...)
)

# Deterministic non-ASCII tails planted by accented_corpus; the oracle
# replays them as the same Python-string literals spliced into SQL.
NFD_TAIL = " nfd:cafe\u0301"  # e + COMBINING ACUTE -> NFC composes
NFC_TAIL = " nfc:caf\u00e9"  # already composed: must NOT change
MOJI_TAIL = " moji:test\u00c3\u00a9end"  # 'é' double-encoded


def accented_corpus(df: DataFrame) -> DataFrame:
    """Documents with planted decomposed / composed / mojibake tails
    (``doc_id % 5 / % 11 / % 7``), so the normalization operator has
    guaranteed positives AND guaranteed must-not-change rows."""
    tail5 = F.when(F.col("doc_id") % 5 == 0, F.lit(NFD_TAIL)).otherwise(
        F.lit("")
    )
    tail11 = F.when(F.col("doc_id") % 11 == 0, F.lit(NFC_TAIL)).otherwise(
        F.lit("")
    )
    tail7 = F.when(F.col("doc_id") % 7 == 0, F.lit(MOJI_TAIL)).otherwise(
        F.lit("")
    )
    return df.select(
        "doc_id",
        F.concat(F.col("text"), tail5, tail11, tail7).alias("text"),
    )


@F.pandas_udf(T.StringType())
def _nfc(s: pd.Series) -> pd.Series:
    """Vectorized NFC canonical composition (module level so the
    pandas_udf type hints resolve — see operators/udfs.py)."""
    import unicodedata

    return pd.Series(
        [None if t is None else unicodedata.normalize("NFC", t) for t in s]
    )


def unicode_normalize(df: DataFrame) -> DataFrame:
    """Unicode hygiene over ``(doc_id, text)`` — the normalization pass
    (cf. ftfy; CCNet and C4 both NFC-normalize before hashing) that
    must run before any exact dedup: ``'café'`` in NFD and NFC hash to
    different fingerprints while rendering identically, so an
    un-normalized corpus leaks duplicates straight through
    ``dedup_exact``.

    Returns ``(doc_id, text_nfc, nfc_changed, mojibake_suspect)``:

    - ``text_nfc`` — NFC canonical composition via a vectorized Arrow
      ``pandas_udf`` (Spark has no JVM-side NFC builtin and per-row
      Python is banned; this is the sanctioned slow-path tier, same
      class as ``compression_quality``).  The DuckDB oracle's utf8proc
      ``nfc_normalize`` must agree byte-for-byte — both implement the
      same Unicode canonical composition.
    - ``nfc_changed`` — byte-level change flag (the dedup-leak signal).
    - ``mojibake_suspect`` — literal-substring detector for the classic
      CP1252 double-encoding artifacts (detection is cheap and
      JVM-side; *repair* is a policy decision left to the caller).

    Scale shape: a narrow map — no shuffle, no state; the UDF is one
    Arrow batch round-trip per partition.
    """
    suspect = F.lit(False)
    for m in MOJIBAKE_MARKERS:
        suspect = suspect | F.col("text").contains(F.lit(m))
    return df.select(
        "doc_id",
        _nfc(F.col("text")).alias("text_nfc"),
        "text",
        suspect.alias("mojibake_suspect"),
    ).select(
        "doc_id",
        "text_nfc",
        (F.col("text_nfc") != F.col("text")).alias("nfc_changed"),
        "mojibake_suspect",
    )
