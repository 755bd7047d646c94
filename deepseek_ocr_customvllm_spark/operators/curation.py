"""Training-set assembly operators: sequence packing and targeted
data selection.

These extend the corpus-curation family (``textstats`` / ``scrub`` /
``dedup``) with the two steps that turn a *cleaned* corpus into an
actual *training set*:

* :func:`sequence_pack` — concat-and-chunk token packing (the T5 /
  GPT-3 pretraining layout: documents concatenated in a deterministic
  order, sliced into fixed-length sequences; Raffel et al. 2020 §3.1.2,
  Brown et al. 2020 App. B).  Shard-parallel by construction.
* :func:`dsir_select` — hashed-n-gram importance selection toward a
  target domain (DSIR, Xie et al. 2023, "Data Selection for Language
  Models via Importance Resampling"), in an integer-exact scoring
  variant so the DuckDB oracle agrees bit-for-bit.

Both are pure JVM-side ``pyspark.sql.functions`` plans (whole-stage
codegen, zero Python in the hot path) and keep every output column
integer-typed — no transcendentals, no float summation order to drift
between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.columns import ensure_safe_salt
from .textstats import with_norm


def _md5_bigint(expr: str, salt: str, nibbles: int = 8) -> F.Column:
    """First ``nibbles`` hex chars of ``md5(salt || expr)`` as bigint —
    the same portable hash used by ``doc_sample`` (DuckDB twin:
    ``dedup.hex_to_bigint_sql``).

    ``salt`` is interpolated into a SQL fragment, so it is validated
    against the shared safe charset (:func:`..functions.columns.
    ensure_safe_salt`)."""
    ensure_safe_salt(salt)
    return F.expr(
        f"cast(conv(substring(md5(concat('{salt}', {expr})), 1, {nibbles}),"
        " 16, 10) as bigint)"
    )


def sequence_pack(
    df: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 8,
    salt: str = "pack-v1",
    tokenizer: str = "ws",
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document its
    token span in the packed training layout.

    Documents are hash-sharded, deterministically ordered within each
    shard (md5 of the salted doc_id — stable across runs, partitionings,
    and corpus growth), and concatenated; the packed stream is sliced
    into ``seq_len``-token training sequences.  Per document we emit its
    shard, its token offset in the shard's stream, and the first/last
    pack (sequence index) it lands in — everything a writer needs to
    materialize packed examples, and everything an auditor needs to
    locate a document inside the training layout.

    Scale shape: ONE hash Exchange on ``shard`` followed by a running
    window per shard.  Packs never cross shards, so shards are the
    embarrassingly-parallel unit — on a real corpus pick ``n_shards`` so
    one shard's (doc_id, n_tokens) rows fit an executor's sort buffer
    (the window sorts only that narrow projection; ~16 bytes/doc means
    hundreds of millions of docs per shard before spill).  This mirrors
    how production packing runs: each worker packs its shard
    independently; cross-shard sequence boundaries don't exist.

    Determinism contract: shard and order are pure functions of
    (salt, doc_id), so the packed layout is reproducible bit-for-bit —
    the property that makes training-data audits and resumable packing
    possible.  All outputs are integers (no floats anywhere).

    ``tokenizer`` selects the token-budget definition: ``"ws"`` (the
    default — whitespace tokens, the definition every sibling operator
    shares) or ``"subword"`` (the frozen greedy-merge scheme,
    :func:`textstats.subword_token_counts` — tokenizer-shaped budgets
    that transfer to a real training stack).  The layout invariants
    (gapless per-shard streams, exact seq_len slicing, parallelism
    invariance) are tokenizer-independent and re-proven under both
    modes in ``tests/test_curation.py``.  Note
    :func:`sequence_pack_rows` materializes token STREAMS and is
    whitespace-only — under a subword budget the packed unit is the
    subword piece, which the space-joined text column cannot carry.
    """
    if tokenizer == "ws":
        toks = with_norm(df).select(
            "doc_id", _n_ws_tokens().alias("n_tokens")
        )
    elif tokenizer == "subword":
        from .textstats import subword_token_counts

        toks = subword_token_counts(df).select(
            "doc_id", F.col("n_subword_tokens").alias("n_tokens")
        )
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    return _pack_layout(toks, seq_len, n_shards, salt)


def _n_ws_tokens() -> F.Column:
    """Whitespace token count of the normalized column ``t`` — ONE
    definition shared by :func:`sequence_pack` and
    :func:`training_set_assembly` (and matching
    ``textstats.token_counts``'s ``n_ws_tokens``), so the packing and
    gating stages can never disagree on what a token is."""
    return (
        F.when(F.col("t") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("t"), " ")))
        .cast("bigint")
    )


def _pack_layout(
    toks: DataFrame,
    seq_len: int,
    n_shards: int,
    salt: str,
) -> DataFrame:
    """The packing core over a pre-tokenized ``(doc_id, n_tokens)``
    frame — shared by :func:`sequence_pack` (whole corpus) and
    :func:`training_set_assembly` (the curated sample)."""
    key = _md5_bigint("cast(doc_id as string)", salt)
    toks = toks.filter(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        (key % n_shards).cast("int").alias("shard"),
        F.md5(
            F.concat(F.lit(salt), F.col("doc_id").cast("string"))
        ).alias("sort_key"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("sort_key").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end = F.sum("n_tokens").over(w)
    packed = toks.select(
        "doc_id",
        "shard",
        "n_tokens",
        (end - F.col("n_tokens")).alias("start_tok"),
        (end - 1).alias("_end0"),
    )
    # `div`, never `/`: float division would corrupt the pack indices
    # (NOTES.md portability rule 4)
    return packed.select(
        "doc_id",
        "shard",
        "n_tokens",
        "start_tok",
        F.expr(f"start_tok div {seq_len}").alias("pack_first"),
        F.expr(f"_end0 div {seq_len}").alias("pack_last"),
        F.expr(f"(_end0 div {seq_len}) - (start_tok div {seq_len}) + 1")
        .cast("int")
        .alias("n_packs"),
    )


def sequence_pack_rows(
    df: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 8,
    salt: str = "pack-v1",
    drop_tail: bool = True,
) -> DataFrame:
    """MATERIALIZE the packed training sequences: one row per
    ``(shard, pack_id)`` carrying the actual ``seq_len``-token sequence
    (space-joined — lossless under the whitespace tokenizer), plus how
    many documents contributed.  This is the writer side of
    :func:`sequence_pack`: the layout says where every document lands;
    this emits the packs themselves, ready to train on (the reference's
    analogue is its token-budget batch assembly,
    ``process/image_process.py:510-518``, which feeds real batches —
    not an audit plan).

    Frozen conventions: documents are concatenated in the layout's
    deterministic (salt, doc_id) order and sliced into exact
    ``seq_len``-token sequences; with ``drop_tail=True`` (the T5 /
    GPT-3 "concat and chunk, drop the remainder" rule, Raffel 2020
    §3.1.2) each shard's final partial pack is dropped, so EVERY emitted
    pack has exactly ``seq_len`` tokens and the shard's stream is
    gapless from slot 0 of pack 0.

    Scale shape: the narrow layout (doc_id, shard, start_tok) computes
    first (window over ~16-byte rows, see :func:`_pack_layout`), then
    joins text back on doc_id — one doc_id-keyed shuffle — and explodes
    to (shard, pack_id, slot, token) rows that aggregate straight into
    packs on the (shard, pack_id) key.  Token rows never carry text
    larger than one token, packs are bounded at ``seq_len`` tokens, and
    every stage is a plain hash shuffle — no corpus-wide sort, no
    driver collection.  Write the result with
    :func:`write_packed_shards` for the shard-partitioned layout.

    Determinism: slots are unique within a pack (global positions are
    unique within a shard), so the ordered rebuild is a pure function
    of (salt, corpus content) — byte-stable across any input
    partitioning; pinned by ``tests/test_curation.py``.
    """
    d = with_norm(df).select("doc_id", "t")
    toks = d.select("doc_id", "t", _n_ws_tokens().alias("n_tokens"))
    layout = _pack_layout(
        toks.select("doc_id", "n_tokens"), seq_len, n_shards, salt
    )
    joined = toks.select("doc_id", "t").join(
        layout.select("doc_id", "shard", "start_tok"), "doc_id"
    )
    placed = joined.select(
        "doc_id",
        "shard",
        F.posexplode(F.split("t", " ")).alias("pos", "tok"),
        "start_tok",
    ).select(
        "doc_id",
        "shard",
        "tok",
        (F.col("start_tok") + F.col("pos")).alias("gpos"),
    )
    packs = (
        placed.select(
            "doc_id",
            "shard",
            "tok",
            F.expr(f"gpos div {seq_len}").alias("pack_id"),
            (F.col("gpos") % seq_len).cast("int").alias("slot"),
        )
        .groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(struct(slot, tok))),"
                    " x -> x.tok)"
                ),
            ).alias("text"),
        )
    )
    if drop_tail:
        packs = packs.filter(F.col("n_tokens") == seq_len)
    return packs.select("shard", "pack_id", "n_docs", "n_tokens", "text")


def write_packed_shards(packs: DataFrame, path: str) -> None:
    """Write materialized packs (:func:`sequence_pack_rows`) as the
    production training-shard layout: parquet partitioned by ``shard``,
    so each training worker reads exactly its shard's directory and the
    pack files stream in ``pack_id`` order.  Overwrite semantics keep
    re-runs idempotent (the pack layout is deterministic, so a re-run
    writes byte-identical content)."""
    (
        packs.repartition("shard")
        .sortWithinPartitions("pack_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def dsir_select(
    df: DataFrame,
    target_source: str = "src0",
    n_buckets: int = 256,
    scale: int = 10_000,
    k: int = 50,
    salt: str = "dsir-v1",
    persist: bool = True,
) -> DataFrame:
    """DSIR-style targeted data selection: score raw documents by how
    much their hashed-n-gram profile resembles a target slice, keep the
    top ``k``.

    Xie et al. 2023 hash n-grams into buckets, fit unigram bucket
    distributions on the target and raw corpora, and weight each raw
    document by its importance under the target distribution.  This
    implementation keeps the hashed-feature machinery but scores with
    scaled INTEGER ratios instead of summed log-probabilities: per
    bucket ``r = ((ct + 1) * scale) div (cr + 1)`` (add-one smoothing;
    the global ``T_raw/T_target`` normalizer is constant across buckets,
    so dropping it cannot reorder documents *per bucket* and keeps every
    value bigint-exact in both engines — JVM and DuckDB libm may differ
    by 1 ulp on ``ln``, which a hash-identity oracle cannot tolerate).
    The ranking produced by the linear-ratio score tracks the log-space
    DSIR weight on separable corpora; ``tests/test_curation.py`` pins
    that on a synthetic two-domain corpus the selected set equals the
    log-space selection.

    Scale shape: ONE wide shuffle — the token explode aggregated to
    (doc_id, is_target, bucket) counts with map-side combine.  That
    aggregate is localCheckpoint-ed by default (``persist=True``)
    because it feeds two consumers (the bucket distributions and the
    per-doc scores); without it Catalyst re-runs the explode — the
    most expensive stage — per branch (same rationale as
    ``dedup.dedup_spans_apply``).  Bucket distributions are
    ``n_buckets`` rows → broadcast to the scoring join; the final top-k
    is an ``orderBy().limit()`` (TakeOrdered: per-partition heads then a
    k-row merge, never a corpus-wide window sort).

    Overflow bounds: ``(ct+1)*scale`` stays under 2^63 while any single
    bucket's target count is below ~9e14 tokens; past that, widen the
    ratio to decimal(38,0) in both engines.
    """
    d = with_norm(df).select(
        "doc_id",
        (F.col("source") == target_source).alias("is_target"),
        "t",
    )
    words = d.filter(F.col("t") != "").select(
        "doc_id",
        "is_target",
        F.explode(F.split("t", " ")).alias("term"),
    ).filter(F.col("term") != "")
    feat = words.groupBy(
        "doc_id",
        "is_target",
        (_md5_bigint("term", salt) % n_buckets).cast("int").alias("bucket"),
    ).agg(F.count("*").alias("cnt"))
    if persist:
        # eager cut: the explode above runs exactly once, both branches
        # below read the materialized (doc_id, is_target, bucket, cnt)
        feat = feat.localCheckpoint()
    dist = feat.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), F.col("cnt")).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("is_target"), F.col("cnt")).otherwise(0)).alias("cr"),
    )
    ratios = dist.select(
        "bucket",
        F.expr(f"((ct + 1) * {scale}) div (cr + 1)").alias("r"),
    )
    scores = (
        feat.filter(~F.col("is_target"))
        .join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("r")).alias("score"))
    )
    return scores.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def temperature_sample(
    df: DataFrame,
    budget: int = 150,
    salt: str = "temp-v1",
    persist: bool = True,
) -> DataFrame:
    """Temperature-based multilingual resampling (alpha = 0.5): the
    corpus-mixing step multilingual pretraining uses to keep head
    languages from drowning the tail (mT5, Xue et al. 2021 §3.1;
    XLM-R, Conneau et al. 2020 §3 — they sample language l with
    probability proportional to ``n_l^alpha``).

    Per-language quota = ``(budget * isqrt(n_l)) div sum_m isqrt(n_m)``
    — the alpha = 0.5 exponent computed as an INTEGER square root:
    ``floor(sqrt(double(n)))`` is exact and engine-portable (IEEE-754
    requires correctly-rounded sqrt, and no integer below 2^52 can
    round across a perfect square), so no transcendental ever reaches
    the compare path.  Selection within a language is the md5-rank
    prefix (deterministic, corpus-stable — the same portable-hash
    device as ``doc_sample``/``lang_stratified_sample``; what
    temperature sampling adds is the sublinear per-language quota).

    Returns the sampled docs: ``(doc_id, lang, n_docs, quota,
    samp_rank)`` — quota and population alongside each row so the
    mixing ratios are auditable.

    Scale shape: language counts are a map-side-combined aggregate of
    ~10^2 rows, localCheckpoint-ed by default — it feeds two consumers
    (the isqrt total and the quotas), and without the cut each branch
    would re-scan the corpus (the dsir_select lesson; the checkpoint
    itself is ~10^2 rows).  Quotas broadcast back; the one full-data
    Exchange is the md5 rank window's hash on ``lang``.  The
    per-language window sort holds only (doc_id, sort-key) projections;
    for a language too large for one partition sort the histogram
    device of ``corpus_length_report`` applies (rank depends only on
    the md5-key multiset).
    """
    return _temperature_select(
        df.select("doc_id", "lang"), budget, salt, persist
    ).orderBy("doc_id")


def _temperature_select(
    d: DataFrame,
    budget: int,
    salt: str,
    persist: bool,
) -> DataFrame:
    """The quota + md5-rank selection core over a ``(doc_id, lang)``
    frame — shared by :func:`temperature_sample` (whole corpus) and
    :func:`training_set_assembly` (the deduped, gated corpus)."""
    counts = (
        d.groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .withColumn(
            "isq",
            F.expr("cast(floor(sqrt(cast(n_docs as double))) as bigint)"),
        )
    )
    if persist:
        # eager cut: the corpus count aggregate runs exactly once; the
        # total and the quota projection both read the ~10^2-row result
        counts = counts.localCheckpoint()
    tot = counts.agg(F.sum("isq").alias("s"))
    quotas = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.expr(f"({budget} * isq) div s").alias("quota"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
        F.col("doc_id"),
    )
    ranked = d.withColumn("samp_rank", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quotas), "lang")
        .filter(F.col("samp_rank") <= F.col("quota"))
        .select("doc_id", "lang", "n_docs", "quota", "samp_rank")
    )


def ccnet_bucket(
    df: DataFrame,
    persist: bool = True,
) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document by its
    mean per-token surprisal under a language model fit on the corpus
    itself, then split each language into head / middle / tail thirds
    (Wenzek et al. 2020 §4.3 — the head/middle/tail partition is what
    downstream LLM-data pipelines consume as a quality tier).

    CCNet scores with a KenLM 5-gram; this graft uses the corpus's own
    per-language UNIGRAM model with an integer surprisal measure:
    ``bits(term) = length(bin(T_lang div c_term))`` — the bit-width of
    the inverse relative frequency, i.e. ``floor(log2(T/c)) + 1``.
    ``bin()`` is the engine-portable integer log2 (Spark and DuckDB
    render identical minimal binary strings), so the whole score path
    is bigint-exact — no libm ``ln`` whose last ulp could differ
    between JVM and DuckDB (same device as ``dsir_select``).  The doc
    score is ``(1000 * sum(cnt * bits)) div sum(cnt)`` — mean bits
    per token, x1000 (the constant is part of the column contract:
    ``bits_x1000`` and the DuckDB oracle both bake it in).

    Returns ``(doc_id, lang, bits_x1000, ppl_bucket)`` with
    ``ppl_bucket`` in {'head', 'middle', 'tail'} — head = lowest
    surprisal, per CCNet's convention.  Tercile boundaries use exact
    ranks (``rank * 3 <= n_l``), ties broken by doc_id.  Documents
    whose normalized text is empty carry no tokens to score and emit
    NO row (the same convention as every token-explode operator here);
    the buckets partition the non-empty corpus.

    Scale shape: the token explode aggregates straight to
    (doc_id, lang, term) counts with map-side combine, and that
    aggregate is localCheckpoint-ed by default because it feeds BOTH
    the language model and the per-doc scores (``persist=False`` would
    re-run the explode per consumer — the dsir_select /
    dedup_spans_apply lesson); the vocabulary aggregate ``lm`` is cut
    the same way (it feeds the language totals AND the bits
    projection).  The LM join shuffles on (lang, term)
    — vocabulary-sized, map-side combined; language totals are ~10^2
    rows, broadcast.  The per-language tercile window holds only
    (doc_id, score) pairs; scores live in a bounded integer domain
    (<= 64,000), so the ``corpus_length_report`` histogram escape
    applies verbatim if one language outgrows a partition sort.
    """
    d = with_norm(df).select("doc_id", "lang", "t")
    words = (
        d.filter(F.col("t") != "")
        .select("doc_id", "lang", F.explode(F.split("t", " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = words.groupBy("doc_id", "lang", "term").agg(F.count("*").alias("cnt"))
    if persist:
        # eager cut: the explode runs exactly once; the LM and the doc
        # scores both read the materialized counts
        tf = tf.localCheckpoint()
    lm = tf.groupBy("lang", "term").agg(F.sum("cnt").alias("c"))
    if persist:
        # lm also feeds two consumers (language totals + the bits
        # projection); without the cut the vocabulary aggregate — a
        # full shuffle over the (doc, term) counts — runs twice
        lm = lm.localCheckpoint()
    tot = lm.groupBy("lang").agg(F.sum("c").alias("tt"))
    bits = lm.join(F.broadcast(tot), "lang").select(
        "lang",
        "term",
        F.expr("cast(length(bin(tt div c)) as int)").alias("bits"),
    )
    doc = (
        tf.join(bits, ["lang", "term"])
        .groupBy("doc_id", "lang")
        .agg(
            F.expr("(1000 * sum(cnt * bits)) div sum(cnt)").alias(
                "bits_x1000"
            )
        )
    )
    # nl as a window count over the SAME lang partitioning as the rank
    # window: one Exchange, and `doc` — the expensive (lang, term) join
    # + per-doc aggregate — stays single-consumer (a separate groupBy
    # branch would re-run it; the dsir_select lesson, again)
    w = Window.partitionBy("lang").orderBy("bits_x1000", "doc_id")
    wn = Window.partitionBy("lang")
    ranked = doc.withColumn("r", F.row_number().over(w)).withColumn(
        "nl", F.count("*").over(wn)
    )
    bucket = (
        F.when(F.col("r") * 3 <= F.col("nl"), F.lit("head"))
        .when(F.col("r") * 3 <= 2 * F.col("nl"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(
        "doc_id", "lang", "bits_x1000", bucket.alias("ppl_bucket")
    ).orderBy("doc_id")


def bigram_surprisal(df: DataFrame, persist: bool = True) -> DataFrame:
    """Per-document mean BIGRAM surprisal under the corpus's own
    order-2 LM — one order up from :func:`ccnet_bucket`'s unigram
    model, the next step toward CCNet's KenLM-5 scoring (Wenzek et al.
    2020): boilerplate prose built from common word SEQUENCES scores
    low even when its individual words are rare, and word salad built
    from common words scores high even though unigram surprisal loves
    it.

    Model and measure, all bigint-exact (the ccnet_bucket device):
    ``P(w2|w1) = c(w1 w2) / c(w1·)`` with ``c(w1·)`` the count of
    bigrams STARTING with w1 (so the conditional sums to 1), and
    ``bits(bigram) = length(bin(c(w1·) div c(w1 w2)))`` — the
    engine-portable ``floor(log2(1/P)) + 1``.  Returns
    ``(doc_id, n_bigrams, bits_x1000)`` with ``bits_x1000 =
    (1000 * sum(bits)) div n_bigrams``; documents with fewer than two
    normalized tokens carry no bigram and emit NO row (the standing
    token-explode convention).

    Scale shape: ONE bigram explode feeds three consumers (the bigram
    counts, the first-token counts, and the per-doc scoring join), so
    it is localCheckpointed by default; both count aggregates are
    map-side-combined; the scoring joins are on the keys the counts
    were just aggregated by.  The explode is ~n_tokens rows — the same
    volume every shingle operator here already shuffles.
    """
    d = with_norm(df)
    toks = (
        d.filter(F.col("t") != "")
        .withColumn("ts", F.split("t", " "))
        .filter(F.size("ts") >= 2)
    )
    bg = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(ts) - 2), "
                "i -> concat(ts[i], ' ', ts[i+1]))"
            )
        ).alias("bg"),
    )
    if persist:
        bg = bg.localCheckpoint()
    c12 = bg.groupBy("bg").agg(F.count("*").alias("c12"))
    c1 = (
        bg.select(F.substring_index("bg", " ", 1).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    scored = (
        bg.join(c12, "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .join(c1, "w1")
        .select(
            "doc_id",
            F.expr("cast(length(bin(c1 div c12)) as bigint)").alias("bits"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("bits").alias("_sb"))
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("(1000 * _sb) div n_bigrams").cast("bigint").alias(
                "bits_x1000"
            ),
        )
    )


def training_set_assembly(
    df: DataFrame,
    budget: int = 200,
    seq_len: int = 512,
    min_tokens: int = 10,
    n_shards: int = 8,
    temp_salt: str = "temp-v1",
    pack_salt: str = "pack-v1",
    persist: bool = True,
) -> DataFrame:
    """The end-to-end curation capstone: raw corpus → exact dedup →
    quality gate → temperature-balanced sample → packed training
    layout, as ONE composed lineage.

    This is the pipeline shape every LLM-data stack runs (CCNet /
    Gopher / LLaMA data recipes): deduplicate, drop junk, rebalance
    languages, lay the survivors out as fixed-length training
    sequences.  Each stage is the sibling operator's core —
    fingerprint keeper-selection (cf. ``dedup.dedup_exact``), a
    minimum-length gate, :func:`_temperature_select`, and
    :func:`_pack_layout` — so the composite stays bit-reproducible
    and oracle-checkable like its parts.

    Returns one row per packed document: ``(doc_id, lang, shard,
    n_tokens, start_tok, pack_first, pack_last, n_packs)``.

    Scale shape and persist points: the (fingerprint, n_tokens)
    projection is localCheckpoint-ed (it feeds the keeper aggregate
    AND the keeper semi-join), and so is the deduped+gated corpus —
    it feeds three consumers (language counts, the rank window, and
    the token-count join into packing), and at production scale this
    intermediate IS the published deduped corpus, so materializing it
    mirrors what a real pipeline writes to a table anyway.  The
    sampled set is ≤ ``budget`` rows — its joins broadcast.
    """
    d = with_norm(df)
    toks = d.select(
        "doc_id",
        "lang",
        F.md5("t").alias("fp"),
        _n_ws_tokens().alias("n_tokens"),
    )
    if persist:
        toks = toks.localCheckpoint()
    # exact dedup: the lowest doc_id per normalized fingerprint survives
    keep = toks.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    kept = toks.join(keep, ["fp", "doc_id"], "left_semi")
    gated = kept.filter(F.col("n_tokens") >= min_tokens)
    if persist:
        gated = gated.localCheckpoint()
    sampled = _temperature_select(
        gated.select("doc_id", "lang"), budget, temp_salt, persist
    )
    st = F.broadcast(sampled.select("doc_id", "lang")).join(
        gated.select("doc_id", "n_tokens"), "doc_id"
    )
    if persist:
        # st feeds the pack layout AND the lang join-back; it is
        # <= budget rows, so the cut costs nothing and saves a second
        # pass over the gated corpus
        st = st.localCheckpoint()
    layout = _pack_layout(
        st.select("doc_id", "n_tokens"), seq_len, n_shards, pack_salt
    )
    return (
        layout.join(F.broadcast(st.select("doc_id", "lang")), "doc_id")
        .select(
            "doc_id",
            "lang",
            "shard",
            "n_tokens",
            "start_tok",
            "pack_first",
            "pack_last",
            "n_packs",
        )
        .orderBy("doc_id")
    )


LOG2FX_F = 8  # fractional bits of the fixed-point log2
NBQ_ALPHA_K = 256  # interpolation weight: alpha_c = T_c / K per class


def log2_fx_int(x: int, f: int = LOG2FX_F) -> int:
    """``floor``-chain fixed-point ``log2``: an integer approximation of
    ``log2(x) * 2^f`` for ``x >= 1`` using ONLY portable integer ops
    (bit length, multiply, truncating divide) — the engine-exact log
    the ``length(bin())`` trick cannot give beyond whole bits.

    Spec (keep in LOCKSTEP with the DuckDB chain `_log2fx_duck` in
    ``__spark_entry__``; a differential test sweeps them equal):

        i = bit_length(x) - 1                     # integer part
        m = x * 2^20 div 2^i                      # mantissa in [2^20, 2^21)
        repeat f times:
            m = (m * m) div 2^20                  # in [2^20, 2^22)
            if m >= 2^21: m = m div 2; emit bit 1 else emit bit 0
        result = i * 2^f + emitted bits (MSB first)

    Max error vs true log2 is < 2^-f (one-sided: never overestimates).
    Overflow-safe for x below 2^62 and the mantissa never exceeds 2^42.
    """
    if x < 1:
        raise ValueError("log2_fx_int needs x >= 1")
    i = x.bit_length() - 1
    m = (x >> (i - 20)) if i >= 20 else (x << (20 - i))
    out = i << f
    for k in range(1, f + 1):
        m = (m * m) >> 20
        if m >= 1 << 21:
            m >>= 1
            out += 1 << (f - k)
    return out


def nb_quality_classifier(
    df: DataFrame,
    positive_sources=("src0", "src1"),
    n_buckets: int = 256,
    salt: str = "nbq-v1",
    persist: bool = True,
) -> DataFrame:
    """GPT-3-style model-based quality classification (Brown et al.
    2020, Appendix A): train a Naive Bayes classifier on seed labels
    (curated sources = positive, the rest = negative), then score EVERY
    document and label it high/low quality.

    Two pieces of arithmetic make the decision trustworthy AND
    engine-exact (no libm anywhere):

    - **Interpolated (Jelinek-Mercer-style) smoothing**, not add-one:
      ``P(w|c) ∝ c_w·K + T_c`` with ``K = NBQ_ALPHA_K``.  Add-one
      smoothing plus the vocabulary mass systematically biases EVERY
      token against the smaller training class (the +B term is a far
      larger fraction of a 20-doc seed's total than of the crawl's),
      which swamps the real signal on long documents — measured, not
      hypothetical: the first cut of this operator failed its own eval
      exactly that way.  Interpolation makes a token whose per-class
      rates match the class totals weigh EXACTLY zero.
    - **Fixed-point fractional log2** (:func:`log2_fx_int`, 2^-8-bit
      units) rather than whole-bit ``length(bin())``: whole-bit floors
      put every near-neutral token at ±1 bit, again dominating long
      documents.

        w_b   = lg(c_pos·K + T_pos) - lg(c_neg·K + T_neg)
              - lg(T_pos) + lg(T_neg)          # lg = log2_fx_int
        score = Σ_b cnt_b · w_b        label = high iff score >= 0

    Scale shape: ONE wide shuffle — the token explode aggregated to
    (doc_id, is_pos, bucket) with map-side combine, localCheckpoint-ed
    (two consumers); the per-bucket class distribution is a BOUNDED
    ``n_buckets``-row frame, collected and weighted driver-side in
    exact Python ints (same bounded-collect class as the k-means seeds
    and IVF bucket lists), then broadcast back for the scoring join +
    one groupBy(doc_id).

    Returns ``(doc_id, n_terms, score, quality)``; documents with no
    tokens yield no row (nothing to classify).
    """
    d = with_norm(df).select(
        "doc_id",
        F.col("source").isin(*positive_sources).alias("is_pos"),
        "t",
    )
    words = (
        d.filter(F.col("t") != "")
        .select("doc_id", "is_pos", F.explode(F.split("t", " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    feat = words.groupBy(
        "doc_id",
        "is_pos",
        (_md5_bigint("term", salt) % n_buckets).cast("int").alias("bucket"),
    ).agg(F.count("*").alias("cnt"))
    if persist:
        feat = feat.localCheckpoint()
    dist = (
        feat.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_pos"), F.col("cnt")).otherwise(0)).alias("cp"),
            F.sum(F.when(~F.col("is_pos"), F.col("cnt")).otherwise(0)).alias("cn"),
        )
        .collect()  # bounded: at most n_buckets rows
    )
    tp = sum(r["cp"] for r in dist)
    tn = sum(r["cn"] for r in dist)
    K, lg = NBQ_ALPHA_K, log2_fx_int
    base = lg(max(tp, 1)) - lg(max(tn, 1))
    weights = [
        (
            int(r["bucket"]),
            lg(max(r["cp"] * K + tp, 1)) - lg(max(r["cn"] * K + tn, 1)) - base,
        )
        for r in dist
    ]
    spark = df.sparkSession
    wt = spark.createDataFrame(weights, "bucket int, w bigint")
    return (
        feat.join(F.broadcast(wt), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_terms"),
            F.sum(F.col("cnt") * F.col("w")).cast("bigint").alias("score"),
        )
        .select(
            "doc_id",
            "n_terms",
            "score",
            F.when(F.col("score") >= 0, F.lit("high"))
            .otherwise(F.lit("low"))
            .alias("quality"),
        )
    )


NBQ_POS_MARKERS = " ".join(f"qualw{k}" for k in range(8))
NBQ_NEG_MARKERS = " ".join(f"junkw{k}" for k in range(8))


def labeled_quality_corpus(df: DataFrame) -> DataFrame:
    """Planted-truth corpus for classifier evaluation, derived from the
    documents table by pure arithmetic (the oracle replays it):

    - TRUTH: ``doc_id % 2 == 0`` docs get the ``qualw*`` marker
      vocabulary appended, the rest ``junkw*`` — the separable signal.
    - SEED LABELS: only truth-positive docs with ``doc_id % 5 == 0``
      are labeled the curated source (``goodseed``); everything else is
      ``crawl``.  The negative training side is therefore a ~50/50
      noisy mix of both classes — exactly GPT-3's setup (curated
      positives vs raw-crawl negatives that contain good documents).

    The original word-soup text is KEPT as shared class-independent
    noise the classifier must see through.
    """
    return df.select(
        "doc_id",
        F.expr(
            f"concat(text, ' ', CASE WHEN doc_id % 2 = 0"
            f" THEN '{NBQ_POS_MARKERS}' ELSE '{NBQ_NEG_MARKERS}' END)"
        ).alias("text"),
        F.expr(
            "CASE WHEN doc_id % 2 = 0 AND doc_id % 5 = 0"
            " THEN 'goodseed' ELSE 'crawl' END"
        ).alias("source"),
    )


def quality_classifier_eval(df: DataFrame) -> DataFrame:
    """Confusion matrix + integer precision/recall of
    :func:`nb_quality_classifier` against the planted truth of
    :func:`labeled_quality_corpus` — the classifier's acceptance
    metric, measured the way the dedup/ANN recall reports measure
    theirs (an approximate tier is only trustworthy with its accuracy
    against ground truth pinned next to it).

    One row: ``(n_docs, tp, fp, fn, tn, precision_x10000,
    recall_x10000)`` — rates as ``(x * 10000) div max(denom, 1)``
    (integer-exact; the guard keeps a zero denominator an explicit 0
    in BOTH engines, per the dedup_recall_report lesson).
    """
    corpus = labeled_quality_corpus(df)
    scored = nb_quality_classifier(corpus, positive_sources=("goodseed",))
    ev = scored.select(
        "doc_id",
        (F.col("score") >= 0).alias("pred"),
        (F.col("doc_id") % 2 == 0).alias("truth"),
    )
    def _n(cond):  # coalesce: an EMPTY corpus must report 0s, not NULLs
        return F.coalesce(
            F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
        ).cast("bigint")

    cm = ev.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        _n(F.col("pred") & F.col("truth")).alias("tp"),
        _n(F.col("pred") & ~F.col("truth")).alias("fp"),
        _n(~F.col("pred") & F.col("truth")).alias("fn"),
        _n(~F.col("pred") & ~F.col("truth")).alias("tn"),
    )
    return cm.select(
        "n_docs", "tp", "fp", "fn", "tn",
        F.expr("(tp * 10000) div greatest(tp + fp, 1)").alias("precision_x10000"),
        F.expr("(tp * 10000) div greatest(tp + fn, 1)").alias("recall_x10000"),
    )


# --- balanced output-shard planning ---------------------------------------

SHARD_PLAN_WRITERS = 8
SHARD_PLAN_TARGET_BYTES = 4096


def output_shard_plan(
    df: DataFrame,
    n_writers: int = SHARD_PLAN_WRITERS,
    target_bytes: int = SHARD_PLAN_TARGET_BYTES,
    bytes_col: str = "n_chars",
    salt: str = "shard-v1",
) -> DataFrame:
    """Size-balanced output-file layout for the corpus — the WRITE-side
    twin of ``operators.extract.salted_repartition``: at 100 TB the
    bottleneck after the last transform is writers producing wildly
    uneven parquet files (HDFS/S3 small-file storms at one end,
    un-splittable multi-GB files at the other), so production jobs plan
    the layout instead of letting arrival order decide it.

    Deterministic, content-keyed, two-level:

    - ``writer = md5(doc_id) % n_writers`` routes every document to a
      writer group independent of ingest order (a skewed upstream
      partition cannot concentrate bytes on one writer);
    - within a writer, docs are laid out in md5-key order and a file
      rolls when the bytes laid out so far reach ``target_bytes``:
      ``file_seq = cum_bytes_before div target_bytes`` — the standard
      streaming-writer roll policy, expressed as one window.

    Returns one row per planned file ``(writer, file_seq, n_docs,
    file_bytes)``.  Every file except a writer's last lands strictly
    inside ``(target_bytes − max_doc_bytes, target_bytes +
    max_doc_bytes)`` — each file boundary is within one document of its
    nominal offset, so imbalance is bounded by data, not by luck.

    Scale shape: ONE Exchange on ``writer`` (the window and the final
    groupBy share it); the per-writer sort is each writer's own file
    layout — exactly the work a writer does anyway — and no global
    sort or driver pass exists.  ``bytes_col`` is whatever byte
    accounting the caller trusts (here ``n_chars``; an ASCII corpus).
    """
    from pyspark.sql.window import Window

    key = F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
    k = df.select(
        "doc_id",
        F.col(bytes_col).cast("bigint").alias("b"),
        (_md5_bigint("doc_id", salt) % n_writers).cast("int").alias("writer"),
        key.alias("k"),
    )
    w = (
        Window.partitionBy("writer")
        .orderBy(F.col("k").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = k.withColumn("cumb", F.coalesce(F.sum("b").over(w), F.lit(0)))
    return (
        c.groupBy(
            "writer",
            F.expr(f"cumb div {target_bytes}").cast("bigint").alias("file_seq"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("b").cast("bigint").alias("file_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# Curation funnel telemetry
# ---------------------------------------------------------------------------

def _funnel_flags(docs: DataFrame, lang_gate: bool = True) -> DataFrame:
    """The funnel's per-doc gate flags — ONE corpus scan shared by the
    report (:func:`curation_funnel`) and the apply path
    (:func:`funnel_apply`), so the two can never disagree on what a
    gate means.  Returns ``(doc_id, fp, s1, s2, s3)`` (cumulative
    survival flags; ``fp`` = md5 of the normalized text).

    ``lang_gate=False`` turns stage 2 into a pass-through (the stage
    row is still reported, dropping nothing) — for multilingual dumps
    where an English-stopword gate is wrong by construction."""
    from .textstats import BULLET_LINE_RE, STOPWORD_PATTERN

    d = with_norm(docs)
    t = F.col("t")
    n_tok = F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, " ")))
    n_stop = F.size(
        F.regexp_extract_all(t, F.lit(STOPWORD_PATTERN), F.lit(0))
    )
    n_word_chars = F.length(F.regexp_replace(t, " ", ""))
    n_symbols = (
        F.length(t)
        - F.length(F.regexp_replace(t, "#", ""))
        + F.size(F.regexp_extract_all(t, F.lit(r"\.\.\."), F.lit(0)))
    )
    # Line ratios run over NON-EMPTY lines: structured text (markdown,
    # reflowed HTML) uses blank lines as block separators, and counting
    # them as "duplicate lines" would flunk every well-formed document
    # (Gopher's rule targets repeated content, not layout).
    lines = F.filter(
        F.split(F.col("text"), "\n"), lambda ln: ln != ""
    )
    n_lines = F.size(lines)
    n_bullets = F.size(F.filter(lines, lambda ln: ln.rlike(BULLET_LINE_RE)))
    n_dup = n_lines - F.size(F.array_distinct(lines))

    s1 = t != ""
    s2 = s1 & (n_stop * 10 >= n_tok) if lang_gate else s1
    gopher_ok = (
        (3 * n_tok <= n_word_chars)
        & (n_word_chars <= 10 * n_tok)
        & (10 * n_symbols <= n_tok)
        & (10 * n_bullets <= 9 * n_lines)
        & (10 * n_dup <= 3 * n_lines)
    )
    s3 = s2 & gopher_ok
    return d.select(
        "doc_id",
        F.md5(t).alias("fp"),
        s1.alias("s1"),
        s2.alias("s2"),
        s3.alias("s3"),
    )


def _funnel_keepers(flagged: DataFrame) -> DataFrame:
    """Canonical (min doc_id) per fingerprint among stage-3 survivors."""
    return (
        flagged.where(F.col("s3"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"))
    )


def funnel_apply(docs: DataFrame, lang_gate: bool = True) -> DataFrame:
    """APPLY the funnel: return only the documents that survive every
    stage (nonempty → lang → Gopher → exact-dedup canonical), original
    columns intact.  Shares :func:`_funnel_flags` with the report, so
    ``funnel_apply(docs).count() == curation_funnel(docs)``'s final
    ``n_kept`` by construction (pinned in tests)."""
    flagged = _funnel_flags(docs, lang_gate=lang_gate)
    keep_ids = (
        flagged.join(_funnel_keepers(flagged), "fp")
        .where(F.col("s3") & (F.col("doc_id") == F.col("keep_doc_id")))
        # distinct: a doc_id hash collision (two texts, two fps, one id)
        # could otherwise list the id twice and duplicate rows through
        # the join below
        .select("doc_id")
        .distinct()
    )
    return docs.join(keep_ids, "doc_id")


def curation_funnel(docs: DataFrame, lang_gate: bool = True) -> DataFrame:
    """Stage-by-stage survival funnel of the standard curation cascade —
    the single report a production corpus team watches per crawl dump
    (RefinedWeb Fig. 2 and FineWeb both publish exactly this shape:
    docs surviving each gate, in gate order).

    Stages, cumulative (each applies to the previous stage's
    survivors):

    1. ``nonempty``    — normalized text is non-blank
    2. ``lang_en``     — the `textstats.lang_id` stopword rule
       (``10 * n_stopwords >= n_ws_tokens``)
    3. ``gopher_keep`` — the four Gopher thresholds, applied
       *integer-exactly* (``3*w <= chars <= 10*w`` etc.) so the gate is
       engine-portable without `dtrunc`; same thresholds as
       `textstats.gopher_quality`, sharper semantics at the boundary
    4. ``exact_dedup`` — md5(norm) canonical (min ``doc_id``) among the
       stage-3 survivors

    Returns one row per stage: ``(stage_idx, stage, n_in, n_kept)``.

    Scale shape: ONE corpus scan computes every per-doc flag
    (whole-stage codegen, no UDF); the dedup stage adds one
    fingerprint-keyed aggregate + join (both sides hash-partitioned on
    ``fp``); the funnel itself is a single 1-row aggregate exploded to
    stage rows with ``stack`` — at 10^12 docs nothing but the
    fingerprint Exchange moves data.
    """
    flagged = _funnel_flags(docs, lang_gate=lang_gate)
    keepers = _funnel_keepers(flagged)
    s4 = F.col("s3") & (F.col("doc_id") == F.col("keep_doc_id"))
    agg = (
        flagged.join(keepers, "fp", "left")
        .agg(
            F.count("*").alias("n0"),
            F.sum(F.col("s1").cast("bigint")).alias("n1"),
            F.sum(F.col("s2").cast("bigint")).alias("n2"),
            F.sum(F.col("s3").cast("bigint")).alias("n3"),
            F.sum(s4.cast("bigint")).alias("n4"),
        )
    )
    return agg.select(
        F.expr(
            "stack(4,"
            " 1, 'nonempty',    n0, n1,"
            " 2, 'lang_en',     n1, n2,"
            " 3, 'gopher_keep', n2, n3,"
            " 4, 'exact_dedup', n3, n4)"
        ).alias("stage_idx", "stage", "n_in", "n_kept")
    )


# Constructed funnel-probe texts (pure ASCII literals, spliced verbatim
# into the DuckDB oracle).  GOOD passes every gate: 6/12 stopword ratio,
# mean word length ~3.4, no bullets/symbols/dup lines.  POISON passes
# the language gate (10/30 stopwords) but fails Gopher twice: mean word
# length 44/30 < 3 and 10 of 11 lines are bullets (> 0.9).
FUNNEL_GOOD = "the data and spark to index in table of stream for batch"
FUNNEL_POISON = (
    "the and of to in the and of to in" + "\n- b" * 10
)


def funnel_corpus(docs: DataFrame) -> DataFrame:
    """Documents plus planted funnel probes so every stage of
    :func:`curation_funnel` has guaranteed hits: ``doc_id % 3`` adds a
    passes-everything row (unique ``v<id>`` tail), ``doc_id % 6`` adds
    an EXACT twin of that row (stage-4 drop), ``doc_id % 5`` adds a
    lang-pass / Gopher-fail bullet-poison row (stage-3 drop).
    Mirrored verbatim in the oracle's ``fun`` CTE."""
    base = docs.select("doc_id", "text")
    good_text = F.concat(
        F.lit(FUNNEL_GOOD + " v"), F.col("doc_id").cast("string")
    )
    good = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"), good_text.alias("text")
    )
    twin = docs.filter(F.col("doc_id") % 6 == 0).select(
        (F.col("doc_id") + 4000000).alias("doc_id"), good_text.alias("text")
    )
    poison = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.concat(
            F.lit(FUNNEL_POISON + " v"), F.col("doc_id").cast("string")
        ).alias("text"),
    )
    return base.unionByName(good).unionByName(twin).unionByName(poison)


def snapshot_term_drift(
    docs: DataFrame,
    dump_size: int = 100,
    n_buckets: int = 64,
    salt: str = "drift-v1",
    ppm: int = 1_000_000,
    persist: bool = True,
) -> DataFrame:
    """Term-distribution drift between consecutive crawl snapshots —
    the data-shift monitor a corpus team reads alongside
    :func:`dedup.snapshot_dedup_report`'s redundancy curve (a dump whose
    vocabulary distribution jumps is a crawl-config change, a seed-list
    shift, or an extraction regression, long before model evals see it).

    Documents map to synthetic dumps of ``dump_size`` consecutive
    ``doc_id``s (the convention shared with ``snapshot_dedup_report`` /
    ``incremental_dedup``); terms hash into ``n_buckets`` buckets (the
    DSIR convention, same portable md5 hash).  Each dump's bucket
    distribution is quantized to integer parts-per-million
    (``(c * ppm) div n_tok``) and consecutive dumps are compared by
    total-variation distance ``sum(|r1 - r2|) div 2`` — TV over the
    quantized rates, so every compared value is a bigint: no float
    summation order, no libm, engine-exact.  The ppm quantization is
    also the scale story: per-bucket RATES stay bounded regardless of
    corpus size, where raw-count cross-products (``c1*N2``) would
    overflow bigint near 10^12-token dumps.

    Returns one row per consecutive dump pair:
    ``(dump_from, dump_to, n_tok_from, n_tok_to, tv_ppm)``.

    Scale shape: one token explode → map-side-combined
    ``(dump, bucket)`` counts (at most ``n_dumps × n_buckets`` rows
    survive the combine); the dense grid, rates, pair join, and rollup
    all run on that tiny aggregate — nothing downstream of the first
    groupBy touches corpus-sized data.  The counts aggregate feeds FOUR
    consumers (totals, the rates join, both sides of the pair
    self-join), so it is localCheckpoint-ed by default
    (``persist=True``, eager at construction) — without it Catalyst
    re-runs the corpus explode once per consumer (plan-pinned in
    ``tests/test_curation.py``).
    """
    d = with_norm(docs)
    toks = (
        d.filter(F.col("t") != "")
        .select(
            F.expr(f"doc_id div {int(dump_size)}").alias("dump"),
            F.explode(F.split("t", " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    counts = (
        toks.select(
            "dump",
            (_md5_bigint("term", salt) % n_buckets).cast("int").alias("bucket"),
        )
        .groupBy("dump", "bucket")
        .agg(F.count("*").alias("c"))
    )
    if persist:
        counts = counts.localCheckpoint()
    totals = counts.groupBy("dump").agg(F.sum("c").alias("n_tok"))
    grid = totals.select(
        "dump",
        "n_tok",
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("bucket"),
    )
    rates = grid.join(counts, ["dump", "bucket"], "left").select(
        "dump",
        "bucket",
        "n_tok",
        F.expr(f"(coalesce(c, 0) * {int(ppm)}) div n_tok").alias("rate"),
    )
    r1, r2 = rates.alias("r1"), rates.alias("r2")
    pairs = r1.join(
        r2,
        (F.col("r1.dump") + 1 == F.col("r2.dump"))
        & (F.col("r1.bucket") == F.col("r2.bucket")),
    )
    return (
        pairs.groupBy(
            F.col("r1.dump").alias("dump_from"),
            F.col("r2.dump").alias("dump_to"),
            F.col("r1.n_tok").alias("n_tok_from"),
            F.col("r2.n_tok").alias("n_tok_to"),
        )
        .agg(
            F.expr("sum(abs(r1.rate - r2.rate)) div 2").alias("tv_ppm")
        )
    )


def mixture_plan(
    docs: DataFrame,
    weights: DataFrame,
    budget_tokens: int = 1_000_000,
) -> DataFrame:
    """Training-mixture planner: turn per-source token inventories plus
    target mixture weights into per-source token quotas and
    repeat/subsample factors — the GPT-3 Table 2.2 computation (each
    dataset's "weight in training mix" vs "epochs elapsed when training
    for 300B tokens"; Common Crawl sampled at <1 epoch, Wikipedia
    repeated 3.4×), the planning artifact every mixture-weighted
    pretraining run starts from.

    ``weights`` is a tiny ``(source, weight)`` frame (integer weights —
    ratios, not normalized); sources absent from it are excluded.
    Returns ``(source, n_tokens, weight, target_tokens, repeat_x1000)``
    where ``target_tokens = budget * weight div Σweight`` and
    ``repeat_x1000`` is the epochs-×1000 factor (> 1000 ⇒ the source
    repeats; < 1000 ⇒ subsample), NULL for an empty source.  All
    arithmetic is bigint ``div`` — exact in both engines, and safe to
    10^12-token budgets (``budget × weight ≤ 1e15`` stays far under
    bigint).

    Scale shape: ONE map-side-combined corpus aggregate (source
    cardinality rows survive); the weights table and the 1-row weight
    total are broadcast — nothing else moves.
    """
    toks = (
        with_norm(docs)
        .select("source", _n_ws_tokens().alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("n_tokens"))
    )
    total = weights.agg(
        F.sum("weight").cast("bigint").alias("total_w")
    )
    joined = (
        toks.join(F.broadcast(weights), "source")
        .crossJoin(F.broadcast(total))
    )
    target = F.expr(f"({int(budget_tokens)} * weight) div total_w")
    return joined.select(
        "source",
        "n_tokens",
        F.col("weight").cast("bigint").alias("weight"),
        target.alias("target_tokens"),
        F.when(F.col("n_tokens") > 0, (target * 1000))
        .otherwise(F.lit(None))
        .cast("bigint")
        .alias("_t1000"),
    ).select(
        "source",
        "n_tokens",
        "weight",
        "target_tokens",
        F.expr("_t1000 div n_tokens").alias("repeat_x1000"),
    )
