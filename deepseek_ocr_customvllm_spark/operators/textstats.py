"""Text-analysis operators for a large-scale training-data pipeline.

All built from JVM-side ``pyspark.sql.functions`` (whole-stage codegen,
no Python in the hot path): language-ID (stopword-marker heuristic),
quality scoring (length / punctuation / stopword ratios), token counting
(whitespace + BPE-ish regex), and md5 document fingerprinting.

Every function takes/returns DataFrames and keeps expressions
deterministic and dialect-portable so the DuckDB oracle in
``__spark_entry__`` can reproduce them exactly.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints must resolve
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Markers for the language-ID heuristic (frozen).
STOPWORD_PATTERN = r"\b(the|and|of|a|to|in)\b"
# BPE-ish tokenization: letter runs, single digits, single punctuation.
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
PUNCT_PATTERN = r"[.,;:!?]"


# The portable expression helpers live in ``functions.columns``; re-exported
# here because every operator module and ``__spark_entry__`` import them from
# this namespace.
from ..functions.columns import dsum, dtrunc, norm_text  # noqa: E402,F401


def with_norm(df: DataFrame, col: str = "text") -> DataFrame:
    return df.withColumn("t", norm_text(col))


def token_counts(df: DataFrame) -> DataFrame:
    """Per-document token counts over ``documents(doc_id, text)``."""
    d = with_norm(df)
    n_ws = F.when(F.col("t") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("t"), " "))
    )
    return d.select(
        "doc_id",
        F.length("t").alias("n_chars_norm"),
        n_ws.alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(BPE_PATTERN), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# deterministic subword tokenization (frozen greedy-merge scheme)
# ---------------------------------------------------------------------------

#: Frozen BPE-style merge vocabulary: multi-character pieces a greedy
#: longest-match segmenter may consume in one step (single characters
#: are the implicit fallback).  Learned-once-and-frozen is the defining
#: property of a production tokenizer — this table IS the "integer
#: merges table" of the scheme, and changing it changes every
#: downstream token budget, so it is append-only by convention.
SUBWORD_VOCAB = (
    "ation", "ition", "ement",
    "tion", "ment", "ness", "able", "ible", "ight", "ough",
    "ing", "ent", "ant", "est", "ers", "ion", "ous", "ive", "age",
    "ed", "er", "es", "ly", "al", "ar", "or", "an", "en", "in", "on",
    "at", "it", "is", "th", "he", "re", "nd", "st", "le", "se", "de",
    "te", "ti", "ce", "co", "ro", "ra", "li", "la", "ur", "un",
)

#: Words are truncated to this many characters before segmentation —
#: bounds the recursion depth in both engines (frozen rule; a 10^12-doc
#: corpus will contain arbitrarily long junk "words").
SUBWORD_MAX_WORD_CHARS = 32


def _subword_step_case() -> str:
    """The greedy step: length consumed at position ``pos`` of ``word``
    — the longest vocabulary piece that matches, else one character.
    Dialect-portable (``substring`` is 1-based in Spark AND DuckDB)."""
    arms = "\n      ".join(
        f"WHEN substring(word, pos, {len(p)}) = '{p}' THEN {len(p)}"
        for p in sorted(SUBWORD_VOCAB, key=lambda p: (-len(p), p))
    )
    return f"CASE\n      {arms}\n      ELSE 1 END"


def subword_segment_sql(words_rel: str) -> str:
    """The recursive greedy-segmentation CTE body over a relation
    ``words_rel(word)`` of distinct (truncated) words — the SAME text
    runs on Spark and DuckDB (both support ``WITH RECURSIVE``; the
    caller supplies the WITH RECURSIVE header).  Yields
    ``pieces(word, n_pieces)``.

    Termination: ``pos`` strictly grows every step, so the recursion
    depth is bounded by :data:`SUBWORD_MAX_WORD_CHARS` (Spark's default
    recursion limit is 100).  ``n`` increments once per consumed piece;
    the per-word piece count is its max.
    """
    return f"""seg(word, pos, n) AS (
  SELECT word, 1, 0 FROM {words_rel}
  UNION ALL
  SELECT word,
         pos + {_subword_step_case()},
         n + 1
  FROM seg WHERE pos <= length(word)
),
pieces AS (SELECT word, max(n) AS n_pieces FROM seg GROUP BY word)"""


def subword_token_counts(df: DataFrame) -> DataFrame:
    """Per-document counts under the FROZEN greedy-merge subword
    scheme: ``(doc_id, n_ws_tokens, n_subword_tokens)``.

    Real packing budgets are tokenizer-specific (the reference's
    analogue is its token math at ``process/image_process.py:510-518``);
    the whitespace count under-budgets long words and over-budgets
    short ones.  This scheme is deterministic, engine-portable (the
    segmentation is ONE shared recursive-CTE text, run by Spark and the
    DuckDB oracle verbatim), and integer-only — the properties that
    make packed layouts transferable and auditable.  It is NOT a
    trained tokenizer; it is the frozen stand-in with the same shape
    (greedy longest-match over a merges-derived vocabulary, cf.
    Sennrich et al. 2016 / WordPiece's left-to-right longest-match).

    Scale shape: the recursion runs over the DISTINCT truncated words
    (the corpus vocabulary — Heaps-law-bounded, orders of magnitude
    smaller than the token stream), never over occurrences; per-doc
    counts come from one (word)-keyed join of occurrences against the
    segmented vocabulary and a map-side-combined sum.  The explode and
    the vocabulary both partial-aggregate before shuffling.
    """
    spark = df.sparkSession
    d = with_norm(df)
    occs = (
        d.filter(F.col("t") != "")
        .select("doc_id", F.explode(F.split("t", " ")).alias("word"))
        .select(
            "doc_id",
            F.expr(f"substring(word, 1, {SUBWORD_MAX_WORD_CHARS})").alias(
                "word"
            ),
        )
    )
    per_word = occs.groupBy("doc_id", "word").agg(
        F.count("*").alias("cnt")
    )
    vocab = per_word.select("word").distinct()
    pieces = spark.sql(
        "WITH RECURSIVE " + subword_segment_sql("{vocab}")
        + "\nSELECT word, n_pieces FROM pieces",
        vocab=vocab,
    )
    per_doc = (
        per_word.join(pieces, "word")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("n_pieces")).alias(
                "n_subword_tokens"
            )
        )
    )
    n_ws = F.when(F.col("t") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("t"), " "))
    )
    return (
        d.select("doc_id", n_ws.cast("bigint").alias("n_ws_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_ws_tokens",
            F.coalesce(F.col("n_subword_tokens"), F.lit(0))
            .cast("bigint")
            .alias("n_subword_tokens"),
        )
    )


def language_id(df: DataFrame) -> DataFrame:
    """N-gram/stopword-marker language identification.

    A document is tagged ``en`` when marker stopwords make up >= 10% of
    its whitespace tokens, else ``und`` — the standard cheap heuristic
    tier before a real classifier in corpus pipelines.
    """
    d = with_norm(df)
    n_ws = F.when(F.col("t") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("t"), " "))
    )
    n_stop = F.size(F.regexp_extract_all(F.col("t"), F.lit(STOPWORD_PATTERN), F.lit(0)))
    return d.select(
        "doc_id",
        n_stop.alias("n_stopwords"),
        n_ws.alias("n_ws_tokens"),
        F.when((n_stop * 10) >= n_ws, F.lit("en")).otherwise(F.lit("und")).alias(
            "pred_lang"
        ),
    )


# Per-language stopword markers (frozen; order = tie-break priority).
LANG_MARKERS = (
    ("en", r"\b(the|and|of|to|in|was)\b"),
    ("de", r"\b(der|die|das|und|nicht|ist)\b"),
    ("fr", r"\b(le|les|des|est|dans|une)\b"),
    ("es", r"\b(el|los|las|es|por|una)\b"),
)


def language_id_multi(df: DataFrame) -> DataFrame:
    """Multi-language stopword-marker identification (en/de/fr/es/und).

    One marker-count column per language (pure ``regexp_extract_all``,
    JVM-side); prediction = first language in priority order whose count
    ties the maximum (deterministic argmax), gated to ``und`` when the
    winning count is under 5% of the whitespace tokens.  The standard
    cheap tier before a real classifier; the DuckDB oracle reproduces the
    CASE chain verbatim.
    """
    d = with_norm(df)
    n_ws = F.when(F.col("t") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("t"), " "))
    )
    counts = {
        lang: F.size(F.regexp_extract_all(F.col("t"), F.lit(pat), F.lit(0)))
        for lang, pat in LANG_MARKERS
    }
    best = F.greatest(*counts.values())
    pred = F.lit("und")
    for lang, _ in reversed(LANG_MARKERS):
        pred = F.when(counts[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best * 20 >= n_ws, pred).otherwise(F.lit("und"))
    pred = F.when(n_ws == 0, F.lit("und")).otherwise(pred)
    cols = [F.col("doc_id")]
    cols += [counts[lang].alias(f"n_{lang}") for lang, _ in LANG_MARKERS]
    cols += [n_ws.alias("n_ws_tokens"), pred.alias("pred_lang")]
    return d.select(*cols)


def quality_scores(df: DataFrame) -> DataFrame:
    """Deterministic quality features + composite score per document."""
    d = with_norm(df)
    chars = F.length("t")
    words = F.when(F.col("t") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("t"), " "))
    )
    n_stop = F.size(F.regexp_extract_all(F.col("t"), F.lit(STOPWORD_PATTERN), F.lit(0)))
    n_punct = F.size(F.regexp_extract_all(F.col("t"), F.lit(PUNCT_PATTERN), F.lit(0)))
    avg_word_len = dtrunc(chars * F.lit(1.0) / F.greatest(words, F.lit(1)), 4)
    stop_ratio = dtrunc(n_stop * F.lit(1.0) / F.greatest(words, F.lit(1)), 4)
    score = dtrunc(
        F.least(F.lit(1.0), words / F.lit(100.0)) * 0.5
        + stop_ratio * 0.3
        + F.when((avg_word_len >= 3) & (avg_word_len <= 8), F.lit(0.2)).otherwise(
            F.lit(0.0)
        ),
        4,
    )
    return d.select(
        "doc_id",
        chars.alias("n_chars_norm"),
        words.alias("n_words"),
        n_punct.alias("n_punct"),
        avg_word_len.alias("avg_word_len"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
    )


def source_quality_report(df: DataFrame) -> DataFrame:
    """Per-source length distribution — exact percentiles, JVM-side.

    Spark's ``percentile`` aggregate is exact with linear interpolation
    (bit-identical to DuckDB ``quantile_cont`` and numpy ``'linear'`` on
    integer inputs) and its aggregation state is a counts-map keyed by
    DISTINCT value, so per-group memory is O(distinct lengths) — bounded —
    rather than O(group rows).  The previous grouped-map ``applyInPandas``
    version materialized an entire source group in one Python worker: with
    a skewed source ("common-crawl" = 40% of 10^12 docs) that is a
    guaranteed executor OOM, so it was replaced.
    """
    pct = F.expr("percentile(n_chars, array(0.5D, 0.9D))")
    return (
        df.select("source", "n_chars")
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), pct.alias("_pct"))
        .select(
            "source",
            "n_docs",
            F.col("_pct")[0].alias("median_chars"),
            F.col("_pct")[1].alias("p90_chars"),
        )
    )


ZLIB_LEVEL = 6  # frozen: the ratio is part of the operator contract


def compression_quality(df: DataFrame) -> DataFrame:
    """Compression-ratio quality signal (scalar ``pandas_udf`` tier).

    ``len(zlib(text)) / len(text)`` is the classic cheap proxy for
    repetitive/boilerplate content in corpus filtering (highly repetitive
    pages compress far below ~0.4).  zlib is genuinely inexpressible in
    built-in functions, so this is the honest use of the scalar
    Arrow-batched ``pandas_udf`` tier: Python does ONLY the zlib call on
    raw utf-8 bytes (no normalization twins to keep in sync); byte
    lengths and the truncated ratio stay JVM-side.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def zlib_len(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), ZLIB_LEVEL))
            if t is not None
            else 0
        )

    n_bytes = F.octet_length("text")
    return df.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        zlib_len(F.col("text")).alias("n_bytes_z"),
    ).withColumn(
        "compress_ratio",
        dtrunc(F.col("n_bytes_z") * F.lit(1.0) / F.greatest(F.col("n_bytes"), F.lit(1)), 4),
    )


def vocab_topk(df: DataFrame, k: int = 100) -> DataFrame:
    """Corpus vocabulary: top-k tokens by document-wide frequency.

    Explode -> hash-aggregate (map-side combined: the shuffle carries one
    row per distinct token per partition, not one per occurrence) ->
    global top-k with a deterministic (count desc, token asc) tie-break.
    The final ordering is a single-partition sort of only the aggregated
    vocabulary — tiny next to the corpus — which is the correct top-k
    shape at any scale.
    """
    d = with_norm(df)
    toks = d.filter(F.col("t") != "").select(
        F.explode(F.split("t", " ")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("token")).limit(k)


def doc_sample(df: DataFrame, percent: int = 10, salt: str = "sample-v1") -> DataFrame:
    """Deterministic hash sampling — the reproducible way to cut an
    eval/dev slice from a moving corpus.

    Keep iff ``first-8-hex-of-md5(salt || doc_id) mod 100 < percent``:
    a pure function of (doc_id, salt), so the same docs are sampled on
    every run, at any parallelism, and when the corpus grows the old
    sample stays a subset decision per doc (unlike ``df.sample``, whose
    membership depends on partitioning and seed plumbing).  md5-derived
    so the DuckDB oracle agrees bit-for-bit.
    """
    bucket = F.expr(
        "cast(conv(substring(md5(concat('" + salt + "', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 100"
    )
    return df.withColumn("_b", bucket).filter(F.col("_b") < percent).drop("_b")


def domain_stats(df: DataFrame) -> DataFrame:
    """Per-registered-host rollup — the grouping every crawl pipeline
    runs (robots audits, per-site caps, quality triage).

    Host extraction is a plain regex (identical text in the DuckDB
    oracle — deliberately NOT Spark's ``parse_url``, which the oracle
    engine lacks), ``www.`` stripped.  The aggregation is a hash groupBy
    with map-side combine; Zipf-hot domains are exactly the skew the
    AQE skew-join test and the salted extraction repartition exist for.
    """
    host = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/]+)", 1)
    host = F.regexp_replace(host, r"^www\.", "")
    return (
        df.select(host.alias("domain"), "n_chars")
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            (F.floor(F.avg("n_chars") * 100) / 100).alias("avg_chars"),
        )
    )


# corpus-filter thresholds (frozen contract)
FILTER_MIN_WORDS = 10
FILTER_MIN_QUALITY = 0.5
FILTER_RATIO_LO = 0.25
FILTER_RATIO_HI = 0.95


def corpus_filter(df: DataFrame) -> DataFrame:
    """The keep/drop decision a training-data pipeline materializes.

    One pass over ``documents``: every signal is computed inline in a
    single select (one scan, zero joins — at 10^12 docs a join-per-signal
    plan would shuffle the corpus once per signal), reusing the exact
    expressions of the individual operators plus the zlib pandas_udf.
    Rules, checked in order (first failure is the drop reason):

    1. ``too_short``        n_words < 10
    2. ``lang_unknown``     multi-language argmax says 'und'
    3. ``low_quality``      composite quality score < 0.5
    4. ``compress_anomaly`` zlib ratio outside [0.25, 0.95]
                            (too low = degenerate repetition, too high =
                            high-entropy non-text)
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def zlib_len(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), ZLIB_LEVEL))
            if t is not None
            else 0
        )

    d = with_norm(df)
    words = F.when(F.col("t") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("t"), " "))
    )
    n_stop = F.size(F.regexp_extract_all(F.col("t"), F.lit(STOPWORD_PATTERN), F.lit(0)))
    chars = F.length("t")
    avg_word_len = dtrunc(chars * F.lit(1.0) / F.greatest(words, F.lit(1)), 4)
    stop_ratio = dtrunc(n_stop * F.lit(1.0) / F.greatest(words, F.lit(1)), 4)
    score = dtrunc(
        F.least(F.lit(1.0), words / F.lit(100.0)) * 0.5
        + stop_ratio * 0.3
        + F.when((avg_word_len >= 3) & (avg_word_len <= 8), F.lit(0.2)).otherwise(
            F.lit(0.0)
        ),
        4,
    )
    counts = {
        lang: F.size(F.regexp_extract_all(F.col("t"), F.lit(pat), F.lit(0)))
        for lang, pat in LANG_MARKERS
    }
    best = F.greatest(*counts.values())
    pred = F.lit("und")
    for lang, _ in reversed(LANG_MARKERS):
        pred = F.when(counts[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best * 20 >= words, pred).otherwise(F.lit("und"))
    pred = F.when(words == 0, F.lit("und")).otherwise(pred)

    n_bytes = F.octet_length("text")
    ratio = dtrunc(
        zlib_len(F.col("text")) * F.lit(1.0) / F.greatest(n_bytes, F.lit(1)), 4
    )

    sig = d.select(
        "doc_id",
        words.alias("n_words"),
        pred.alias("pred_lang"),
        score.alias("quality_score"),
        ratio.alias("compress_ratio"),
    )
    reason = (
        F.when(F.col("n_words") < FILTER_MIN_WORDS, F.lit("too_short"))
        .when(F.col("pred_lang") == "und", F.lit("lang_unknown"))
        .when(F.col("quality_score") < FILTER_MIN_QUALITY, F.lit("low_quality"))
        .when(
            (F.col("compress_ratio") < FILTER_RATIO_LO)
            | (F.col("compress_ratio") > FILTER_RATIO_HI),
            F.lit("compress_anomaly"),
        )
        .otherwise(F.lit("kept"))
    )
    return sig.withColumn("reason", reason).withColumn(
        "keep", F.col("reason") == "kept"
    )


def fingerprints(df: DataFrame) -> DataFrame:
    """md5 fingerprints of the normalized text (whole doc + 64-char head)."""
    d = with_norm(df)
    return d.select(
        "doc_id",
        F.md5(F.col("t").cast("binary")).alias("fp"),
        F.md5(F.substring(F.col("t"), 1, 64).cast("binary")).alias("fp_head"),
        F.length("t").alias("n_chars_norm"),
    )


# ---------------------------------------------------------------------------
# Gopher-style quality signals + per-source TF-IDF
# ---------------------------------------------------------------------------

# Gopher rules (Rae et al. 2021, table A1 — public): mean word length in
# [3, 10], symbol-to-word ratio (#, ...) <= 0.1, <= 90% bullet lines,
# bounded duplicate-line fraction.  Thresholds below mirror the paper's.
GOPHER_WORD_LEN_LO = 3.0
GOPHER_WORD_LEN_HI = 10.0
GOPHER_SYMBOL_RATIO_MAX = 0.1
GOPHER_BULLET_RATIO_MAX = 0.9
GOPHER_DUP_LINE_RATIO_MAX = 0.3
# explicit [ \t] class, NOT \s: Java's \s includes \x0B, RE2's does not —
# the exact dialect divergence the oracle rules forbid
BULLET_LINE_RE = r"^[ \t]*[-*•]"


def gopher_quality(df: DataFrame) -> DataFrame:
    """Gopher-rule quality signals per document, single scan, pure
    ``F.*`` (whole-stage codegen): word stats over the normalized text,
    line stats over the raw text.  ``keep`` applies the paper thresholds.

    All ratios are floor-truncated (``dtrunc``) so the DuckDB oracle is
    bit-identical.
    """
    d = with_norm(df)
    n_words = F.when(F.col("t") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("t"), " "))
    )
    n_word_chars = F.length(F.regexp_replace(F.col("t"), " ", ""))
    n_symbols = (
        F.length("t")
        - F.length(F.regexp_replace(F.col("t"), "#", ""))
        + F.size(F.regexp_extract_all(F.col("t"), F.lit(r"\.\.\."), F.lit(0)))
    )
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines)
    n_bullets = F.size(
        F.filter(lines, lambda ln: ln.rlike(BULLET_LINE_RE))
    )
    n_dup_lines = n_lines - F.size(F.array_distinct(lines))
    out = d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.when(n_words == 0, F.lit(0.0))
        .otherwise(dtrunc(n_word_chars / n_words, 4))
        .alias("mean_word_len"),
        F.when(n_words == 0, F.lit(0.0))
        .otherwise(dtrunc(n_symbols / n_words, 4))
        .alias("symbol_word_ratio"),
        dtrunc(n_bullets / n_lines, 4).alias("bullet_line_ratio"),
        dtrunc(n_dup_lines / n_lines, 4).alias("dup_line_ratio"),
    )
    keep = (
        (F.col("mean_word_len") >= GOPHER_WORD_LEN_LO)
        & (F.col("mean_word_len") <= GOPHER_WORD_LEN_HI)
        & (F.col("symbol_word_ratio") <= GOPHER_SYMBOL_RATIO_MAX)
        & (F.col("bullet_line_ratio") <= GOPHER_BULLET_RATIO_MAX)
        & (F.col("dup_line_ratio") <= GOPHER_DUP_LINE_RATIO_MAX)
    )
    return out.withColumn("keep", keep)


def tfidf_top_terms(df: DataFrame, k: int = 5, idf_scale: int = 10_000) -> DataFrame:
    """Top-``k`` distinctive terms per source by TF-IDF.

    The IDF uses scaled INTEGER arithmetic (``n_sources * idf_scale div
    df``) instead of ``ln`` — JVM and DuckDB libm may differ by 1 ulp on
    transcendentals, and the ranking (the point of tf-idf) is identical.

    Scale shape: explode -> (source, term) count [map-side combined] ->
    term document-frequency from the tf table itself [vocab-sized] ->
    broadcast the 1-row source count -> window top-k per source over the
    aggregated vocab only, never the raw token stream.
    """
    from pyspark.sql.window import Window

    d = with_norm(df)
    words = (
        d.filter(F.col("t") != "")
        .select("source", F.explode(F.split("t", " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    # tf feeds three consumers (the scoring join, the document
    # frequency, and the source count), and Spark shares no common
    # subplans, so the explode+aggregate runs three times.  A
    # MEMORY_AND_DISK persist of tf was measured this round and
    # REJECTED: the cache build + extra AQE stage cost ~0.3 s while the
    # re-derived scans cost less at sandbox SF.  At true corpus scale a
    # production job materializes tf between stages; revisit there.
    tf = words.groupBy("source", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_sources = tf.select(F.count_distinct("source").alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_sources))
        .select(
            "source",
            "term",
            "tf",
            "df",
            F.expr(f"tf * ((n * {idf_scale}) div df)").alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def _hash_quota_sample(
    df: DataFrame, partition_col: str, cols: list, per: int, salt: str
) -> DataFrame:
    """Shared determinism-critical quota core: keep the ``per`` docs with
    the smallest ``md5(salt || doc_id)`` within each ``partition_col``
    group — a pure function of doc_id, so membership is stable across
    runs, partitionings, and corpus growth.

    One window per group over a narrow projection; at corpus scale the
    rank prunes everything beyond the quota before any wide column is
    touched.  Both quota samplers ride this one implementation so a
    tie-break or null-ordering fix can never drift between them.
    """
    from pyspark.sql.window import Window

    key = F.md5(F.concat(F.lit(salt + "|"), F.col("doc_id").cast("string")))
    w = Window.partitionBy(partition_col).orderBy(
        key.asc(), F.col("doc_id").asc()
    )
    return (
        df.select("doc_id", *cols, key.alias("sort_key"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= per)
    )


def language_stratified_sample(
    df: DataFrame, per_lang: int = 20, salt: str = "stratify-v1"
) -> DataFrame:
    """Deterministic per-language quota sample — the
    balanced-multilingual-subset selection step of corpus curation
    (see :func:`_hash_quota_sample` for the determinism contract)."""
    return _hash_quota_sample(df, "lang", ["lang", "source"], per_lang, salt)


def domain_quota_sample(
    df: DataFrame, per_domain: int = 10, salt: str = "domcap-v1"
) -> DataFrame:
    """Per-domain document cap — the anti-spam balancing step every
    crawl-scale corpus applies (a handful of template-heavy hosts
    otherwise dominate the token budget).  Caps the per-``source`` head
    with the shared quota core (see :func:`_hash_quota_sample`);
    Zipf-hot domains are exactly where the rank prunes hardest.
    """
    return _hash_quota_sample(
        df, "source", ["source", "n_chars"], per_domain, salt
    )


def repetition_signals(df: DataFrame) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    character fraction covered by the most frequent word 2-gram, and the
    character fraction inside word 3-grams that occur more than once.

    Frozen, dialect-portable definitions (documented quirks):

    - fractions are ``count * length(gram) / length(norm_text)`` with
      overlapping occurrences counted — an upper bound of the paper's
      char-coverage number, identical in both engines;
    - the top 2-gram ties break to the lexicographically SMALLEST gram;
    - docs with fewer than 2 (resp. 3) tokens score 0.0.

    Scale: the gram tables explode to ~n_tokens rows per doc but
    aggregate with map-side combine on (doc_id, gram); the top-1 window
    runs over the already-aggregated per-doc gram counts (bounded by
    distinct grams per doc, never corpus-wide).
    """
    from pyspark.sql.window import Window

    d = with_norm(df).select("doc_id", "t").filter(F.col("t") != "")
    toks = d.withColumn("ts", F.split("t", " "))

    g2 = (
        toks.filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.length("t").alias("n_chars_norm"),
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ts) - 2),"
                    " i -> concat(ts[i], ' ', ts[i+1]))"
                )
            ).alias("gram"),
        )
        .groupBy("doc_id", "n_chars_norm", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    w2 = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("gram").asc()
    )
    top2 = (
        g2.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("gram").alias("top_2gram"),
            dtrunc(
                F.col("cnt") * F.length("gram") / F.col("n_chars_norm"), 4
            ).alias("top_2gram_char_frac"),
        )
    )

    g3 = (
        toks.filter(F.size("ts") >= 3)
        .select(
            "doc_id",
            F.length("t").alias("n_chars_norm"),
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ts) - 3),"
                    " i -> concat(ts[i], ' ', ts[i+1], ' ', ts[i+2]))"
                )
            ).alias("gram"),
        )
        .groupBy("doc_id", "n_chars_norm", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    dup3 = (
        g3.filter(F.col("cnt") > 1)
        .groupBy("doc_id", "n_chars_norm")
        .agg(F.sum(F.col("cnt") * F.length("gram")).alias("dup_chars"))
        .select(
            "doc_id",
            dtrunc(F.col("dup_chars") / F.col("n_chars_norm"), 4).alias(
                "dup_3gram_char_frac"
            ),
        )
    )

    return (
        df.select("doc_id")
        .join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("top_2gram", F.lit("")).alias("top_2gram"),
            F.coalesce("top_2gram_char_frac", F.lit(0.0)).alias(
                "top_2gram_char_frac"
            ),
            F.coalesce("dup_3gram_char_frac", F.lit(0.0)).alias(
                "dup_3gram_char_frac"
            ),
        )
    )


# above this many input rows, corpus_length_report(mode="auto") switches
# to the histogram path: a single language's rows no longer fit one
# executor's partition sort comfortably past the low millions
LENGTH_REPORT_HIST_THRESHOLD = 5_000_000


def corpus_length_report(df: DataFrame, mode: str = "window") -> DataFrame:
    """Per-language length distribution with EXACT order statistics —
    the corpus-balance report curation runs before fixing token budgets.

    Median and p90 are the values at deterministic ranks over
    ``(n_chars, doc_id)`` order — ``rank = (n+1) div 2`` and
    ``max(1, (9n) div 10)``, integer arithmetic only, so Spark and the
    DuckDB oracle agree bit-for-bit (approx_percentile would not).

    Two physical strategies computing the IDENTICAL result
    (property-tested equal in ``tests/test_spark_pipeline.py``):

    - ``mode="window"`` (the DEFAULT — pure lazy, like every other
      operator here): one narrow window per language partition
      (rank + count), then a hash groupBy; only two columns ever
      shuffle.  Limit: a single language's rows must fit one
      partition sort.
    - ``mode="histogram"``: the scale escape — the value at rank r in
      ``(n_chars, doc_id)`` order depends only on the n_chars multiset
      (the doc_id tiebreak never changes the VALUE at a rank), so a
      ``groupBy(lang, n_chars)`` histogram (map-side combined) followed
      by a cumulative window over DISTINCT LENGTHS gives the same
      ranks.  The per-lang sort now touches one row per distinct
      length — bounded by the value domain, not the corpus.
    - ``mode="auto"``: histogram above
      :data:`LENGTH_REPORT_HIST_THRESHOLD` input rows, window below.
      EAGER — it fires a ``df.count()`` Spark job at construction time
      to pick the strategy (cheap against a bare parquet scan, a full
      pass over any derived lineage), which is why it is NOT the
      default: callers at histogram scale know it and should say so.
    """
    from pyspark.sql.window import Window

    if mode == "auto":
        mode = (
            "histogram"
            if df.count() > LENGTH_REPORT_HIST_THRESHOLD
            else "window"
        )
    if mode == "histogram":
        hist = (
            df.select("lang", "n_chars")
            .groupBy("lang", "n_chars")
            .agg(F.count("*").alias("c"))
        )
        wl = Window.partitionBy("lang").orderBy(F.col("n_chars").asc())
        wtot = Window.partitionBy("lang")
        h = hist.withColumn("cum", F.sum("c").over(wl)).withColumn(
            "cnt", F.sum("c").over(wtot)
        )
        med_pos = F.expr("(cnt + 1) div 2")
        p90_pos = F.greatest(F.lit(1), F.expr("(cnt * 9) div 10"))
        return (
            h.groupBy("lang")
            .agg(
                F.sum("c").alias("n_docs"),
                F.min("n_chars").alias("min_chars"),
                F.max("n_chars").alias("max_chars"),
                # value at rank r = smallest length whose cumulative
                # count reaches r
                F.min(
                    F.when(F.col("cum") >= med_pos, F.col("n_chars"))
                ).alias("median_chars"),
                F.min(
                    F.when(F.col("cum") >= p90_pos, F.col("n_chars"))
                ).alias("p90_chars"),
            )
        )
    if mode != "window":
        raise ValueError(f"unknown mode: {mode!r}")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    wc = Window.partitionBy("lang")
    r = df.select("lang", "doc_id", "n_chars").withColumn(
        "rn", F.row_number().over(w)
    ).withColumn("cnt", F.count("*").over(wc))
    med_pos = F.expr("(cnt + 1) div 2")
    p90_pos = F.greatest(F.lit(1), F.expr("(cnt * 9) div 10"))
    return (
        r.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.max(F.when(F.col("rn") == med_pos, F.col("n_chars"))).alias(
                "median_chars"
            ),
            F.max(F.when(F.col("rn") == p90_pos, F.col("n_chars"))).alias(
                "p90_chars"
            ),
        )
    )


def inverted_index(df: DataFrame, k: int = 10) -> DataFrame:
    """Posting-list index shard over ``documents(doc_id, text)`` — the
    build step of a corpus search index (term → document frequency,
    collection frequency, and a bounded posting sample).

    Returns ``(term, df, cf, posting)``: ``df`` = documents containing
    the term, ``cf`` = total occurrences, ``posting`` = the ``k``
    SMALLEST doc_ids containing the term, comma-joined in doc order —
    the deterministic head of the full posting list (real shards store
    the rest on disk; the head is what index routers and df-cutoff
    logic read).

    Scale shape: the token explode aggregates to per-(doc, term) counts
    with map-side combine; then a row_number window and the final
    groupBy share ONE ``term``-keyed Exchange (the
    ``corpus_length_report`` pattern).  The posting cap happens INSIDE
    the aggregation — ``collect_list(CASE WHEN rn <= k ...)`` skips the
    NULLs, so no term ever buffers more than ``k`` ids in memory, while
    the window's sort spills safely for stopword-sized groups.  df/cf
    stay exact over all rows.
    """
    from pyspark.sql.window import Window

    d = with_norm(df)
    words = (
        d.filter(F.col("t") != "")
        .select("doc_id", F.explode(F.split("t", " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    rn = F.row_number().over(Window.partitionBy("term").orderBy("doc_id"))
    ranked = tf.withColumn("rn", rn)
    return ranked.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("c").cast("bigint").alias("cf"),
        F.concat_ws(
            ",",
            F.expr(
                f"transform(array_sort(collect_list("
                f"CASE WHEN rn <= {k} THEN doc_id END)),"
                " x -> cast(x as string))"
            ),
        ).alias("posting"),
    )


# --- BM25 ranked retrieval -------------------------------------------------

# Default query: one rare term + two common ones, so idf genuinely
# discriminates on the testdata vocabulary (df 25 vs ~385 at sf0.01).
BM25_QUERY_TERMS = ("dup", "spark", "vector")
BM25_TOPK = 25
BM25_TF_SCALE = 1 << 16  # fixed-point scale of the tf-normalization term


def bm25_topk(
    df: DataFrame,
    query_terms=BM25_QUERY_TERMS,
    k: int = BM25_TOPK,
    persist: bool = True,
) -> DataFrame:
    """BM25 ranked retrieval over ``documents(doc_id, text)`` — the
    query side of the :func:`inverted_index` build step (Robertson et
    al., Okapi at TREC-3 1994; the Lucene "+1" idf variant so weights
    stay positive for terms in over half the corpus).

    All arithmetic is integer-exact and engine-portable (the tfidf /
    pagerank discipline — floating point would make the ranking
    parallelism-dependent):

    - ``k1 = 1.2`` and ``b = 0.75`` are carried as exact rationals and
      cleared to integers: with ``avgdl10 = (10·Σdl) div N``,

          tfnorm_fx = (22·tf·avgdl10·S) div
                      (10·tf·avgdl10 + 3·avgdl10 + 90·dl)

      which is ``tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` scaled by
      ``S = 2^16``, every step a bigint.
    - ``idf_fx = lg(2N+2) − lg(2df+1)`` in 2^-8-bit units via
      :func:`curation.log2_fx_int` — ``log2(1 + (N−df+0.5)/(df+0.5))``
      with the halves cleared by doubling; always positive.
    - ``score = Σ_q idf_fx(q) · tfnorm_fx(q)``, descending, ties by
      ``doc_id`` — a total deterministic order.

    Scale shape: ONE wide shuffle.  The token explode aggregates
    straight to one compact row per document (``dl`` + a conditional
    ``tf`` column per query term — no per-term join, no second corpus
    scan), with map-side combine.  Corpus stats and per-term document
    frequencies come from a single bounded 1-row aggregate (the
    kmeans-seed bounded-collect class), idf weights are computed
    driver-side in exact Python ints and folded back as literals, and
    the top-k is a TakeOrdered, never a global sort.
    """
    from .curation import log2_fx_int

    terms = list(query_terms)
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    d = with_norm(df)
    words = (
        d.filter(F.col("t") != "")
        .select("doc_id", F.explode(F.split("t", " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    agg = words.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    if persist:
        # two consumers (the stats aggregate below is an action, the
        # scoring projection re-reads) — stop the explode running twice
        agg = agg.localCheckpoint()
    stats = agg.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("tot"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]  # bounded: ONE row
    n = int(stats["n"]) or 1
    avgdl10 = (10 * int(stats["tot"] or 0)) // n
    avgdl10 = max(avgdl10, 1)
    lg_num = log2_fx_int(2 * n + 2)
    idf_fx = [
        lg_num - log2_fx_int(2 * int(stats[f"df{i}"] or 0) + 1)
        for i in range(len(terms))
    ]
    s = BM25_TF_SCALE
    contribs = [
        (
            F.lit(idf_fx[i]).cast("bigint")
            * F.expr(
                f"(22 * tf{i} * {avgdl10} * {s}) div "
                f"(10 * tf{i} * {avgdl10} + 3 * {avgdl10} + 90 * dl)"
            )
        )
        for i in range(len(terms))
    ]
    hit = sum(
        F.when(F.col(f"tf{i}") > 0, 1).otherwise(0) for i in range(len(terms))
    )
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    scored = agg.select(
        "doc_id",
        F.col("dl").cast("bigint").alias("dl"),
        hit.cast("int").alias("n_hit_terms"),
        score.cast("bigint").alias("score_fx"),
    ).filter(F.col("n_hit_terms") > 0)
    return scored.orderBy(F.col("score_fx").desc(), F.col("doc_id").asc()).limit(k)


# ---------------------------------------------------------------------------
# Unicode-script profile (multilingual curation signal)
# ---------------------------------------------------------------------------

# Explicit BMP codepoint ranges, NOT \p{Script} property classes: Java
# regex and DuckDB's RE2 ship different Unicode table versions, but a
# literal range class means the same characters in every engine (and in
# the Python `re` twin used by unit tests).  All planted/expected chars
# are BMP, where Spark's UTF-16 `length` and DuckDB's codepoint `length`
# agree.
SCRIPT_RANGES = {
    "latin": "A-Za-zÀ-ɏ",      # basic + Latin-1/Ext-A/B letters
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "cjk": "぀-ヿ一-鿿",  # kana + unified ideographs
    "arabic": "؀-ۿ",
}
SCRIPT_PRIORITY = ["latin", "cyrillic", "greek", "cjk", "arabic"]

# Planted non-Latin tails for the registry corpus (mirrored as literals
# in the DuckDB oracle): every script class gets guaranteed positives,
# and the %9 CJK tail is repeated so `dominant_script` genuinely flips.
CYR_TAIL = " скрипт тест"  # "скрипт тест"
CJK_TAIL = "漢字テスト"  # "漢字テスト"
GREEK_TAIL = " δοκιμή"  # "δοκιμή"
CJK_REPEAT = 150  # 750 CJK chars — dominates any base doc (max 553 chars)


def scripted_corpus(df: DataFrame) -> DataFrame:
    """Documents with planted script tails: ``doc_id % 4`` Cyrillic,
    ``doc_id % 9`` CJK ×CJK_REPEAT (long enough to dominate), ``doc_id % 13``
    Greek."""
    tail4 = F.when(F.col("doc_id") % 4 == 0, F.lit(CYR_TAIL)).otherwise(
        F.lit("")
    )
    tail9 = F.when(
        F.col("doc_id") % 9 == 0, F.repeat(F.lit(CJK_TAIL), CJK_REPEAT)
    ).otherwise(F.lit(""))
    tail13 = F.when(F.col("doc_id") % 13 == 0, F.lit(GREEK_TAIL)).otherwise(
        F.lit("")
    )
    return df.select(
        "doc_id",
        F.concat(F.col("text"), tail4, tail9, tail13).alias("text"),
    )


def script_profile(df: DataFrame) -> DataFrame:
    """Per-document Unicode-script histogram + dominant script — the
    signal multilingual curation uses before any model-based language
    ID (fastText-style identifiers are gated on script agreement, and
    script mixing inside one doc is itself a spam/mojibake indicator).

    Counts characters per script class via ``length(regexp_replace)``
    over literal codepoint ranges (pure JVM, whole-stage codegen);
    ``dominant_script`` is the priority-ordered argmax, ``'und'`` when
    no class matched.  A narrow map — no shuffle, no UDF, scales as
    pure scan work.
    """
    t = norm_text()
    counts = {
        name: F.length(F.regexp_replace(t, f"[^{rng}]", ""))
        for name, rng in SCRIPT_RANGES.items()
    }
    best = F.greatest(*[counts[n] for n in SCRIPT_PRIORITY])
    dominant = F.lit("und")
    for name in reversed(SCRIPT_PRIORITY):
        dominant = F.when(
            (best > 0) & (counts[name] == best), F.lit(name)
        ).otherwise(dominant)
    return df.select(
        "doc_id",
        *[counts[n].alias(f"n_{n}") for n in SCRIPT_PRIORITY],
        dominant.alias("dominant_script"),
    )


# ---------------------------------------------------------------------------
# Distributed BPE merge induction (tokenizer TRAINING)
# ---------------------------------------------------------------------------

def _merge_adjacent(syms: F.Column, left: F.Column, right: F.Column, joined: F.Column) -> F.Column:
    """Left-to-right non-overlapping merge of adjacent ``(left, right)``
    symbol occurrences — the exact Sennrich apply rule — as a pure-SQL
    ``aggregate`` fold (accumulator = emitted prefix + one pending
    symbol).  Column-API lambdas throughout: the symbols are corpus
    data and must never be spliced into SQL text."""
    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(st, x):
        return (
            F.when(
                st.getField("pend").isNull(),
                F.struct(st.getField("acc").alias("acc"), x.alias("pend")),
            )
            .when(
                (st.getField("pend") == left) & (x == right),
                F.struct(
                    F.concat(
                        st.getField("acc"), F.array(joined)
                    ).alias("acc"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(
                        st.getField("acc"), F.array(st.getField("pend"))
                    ).alias("acc"),
                    x.alias("pend"),
                )
            )
        )

    def finish(st):
        return F.when(
            st.getField("pend").isNull(), st.getField("acc")
        ).otherwise(F.concat(st.getField("acc"), F.array(st.getField("pend"))))

    return F.aggregate(syms, init, step, finish)


def bpe_induce(
    df: DataFrame,
    n_merges: int = 8,
    top_n: int | None = 200,
) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (Sennrich et al. 2016): learn
    ``n_merges`` merge rules from the corpus and return the resulting
    symbol inventory — the induction counterpart of the frozen
    greedy-merge tokenizer (`subword_token_counts` applies a merges
    table; this is where such a table comes from).

    The Sennrich formulation is already the scalable one: all work runs
    on the DISTINCT-WORD table with counts (vocabulary-sized, not
    corpus-sized — one corpus scan builds it, map-side combined).  Each
    round is (1) an adjacent-pair count over the word table's symbol
    arrays weighted by word frequency, (2) a 1-row argmax to the driver
    (count desc, then lexicographic (left, right) — deterministic
    ties), (3) a pure-SQL non-overlapping merge fold applied word-wise.
    Rounds localCheckpoint via the shared `RoundCheckpointer` (the
    kmeans/PageRank lineage-truncation contract).  At 10^12 documents
    the word table is ~10^8 rows — each round shuffles vocabulary-sized
    data only.

    Returns the ``top_n`` final symbols as ``(symbol, n_tokens)``
    (corpus-weighted, count desc then symbol — deterministic;
    ``top_n=None`` returns the FULL inventory unsorted — a
    ``limit(huge)`` would allocate a bounded priority queue of that
    capacity per task and OOM): the
    merged symbols' counts verify the entire induce+apply chain, since
    one wrong merge or one mis-applied fold changes the inventory.
    """
    from ..plans.iterate import RoundCheckpointer

    d = with_norm(df)
    words = (
        d.filter(F.col("t") != "")
        .select(F.explode(F.split("t", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        # Java's split matches the zero-width (?!^) at end-of-string too,
        # emitting a trailing "" element — drop empties.
        .select(
            "n",
            F.filter(
                F.split("word", "(?!^)"), lambda x: x != ""
            ).alias("syms"),
        )
    )
    ck = RoundCheckpointer(words)
    words = ck.ckpt(words)
    for _ in range(n_merges):
        pairs = (
            words.filter(F.size("syms") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2),"
                        " i -> struct(syms[i] as l, syms[i + 1] as r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
        )
        best = pairs.orderBy(
            F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1).collect()
        if not best:
            break
        left, right = best[0]["l"], best[0]["r"]
        words = ck.ckpt(
            words.select(
                "n",
                _merge_adjacent(
                    F.col("syms"),
                    F.lit(left),
                    F.lit(right),
                    F.lit(left + right),
                ).alias("syms"),
            )
        )
    out = (
        words.select("n", F.explode("syms").alias("symbol"))
        .groupBy("symbol")
        .agg(F.sum("n").alias("n_tokens"))
    )
    if top_n is not None:
        out = out.orderBy(
            F.col("n_tokens").desc(), F.col("symbol").asc()
        ).limit(top_n)
    return out
