"""Deduplication operators: exact, MinHash+LSH, SimHash.

The scale path for corpus dedup (10^12 docs):

- **exact**: md5 of normalized text, hash-groupBy — one shuffle on the
  fingerprint, map-side partial aggregation for free.
- **MinHash + LSH**: word-3-gram shingles -> ``N_HASHES`` seeded-md5
  minhashes -> banded bucket keys -> self-join on band buckets (only
  bucket-mates are compared; never O(n^2)) -> exact n-gram Jaccard
  verification of the candidates.
- **SimHash**: 32-bit signature from per-token hashes via bitwise
  majority vote; near-dup pairs block on the 4 signature bytes and
  verify with ``bit_count(xor) <= HAMMING_MAX``.

Portability contract: every hash is derived from md5 hex (identical in
Spark and DuckDB) — never engine-private hashes like ``xxhash64`` — so
the driver's DuckDB oracle reproduces results bit-for-bit.  The integer
nibble-fold ``HEX32_SQL`` converts the first 8 md5 hex chars to a bigint
using only ``instr``/``substr`` arithmetic, which both dialects evaluate
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.columns import norm_text
from ..plans.iterate import RoundCheckpointer

N_HASHES = 8  # minhash signature length
N_BANDS = 4  # bands of 2 hashes each
JACCARD_MIN = 0.5
HAMMING_MAX = 3
SHINGLE_WORDS = 3
# SimHash geometry: 60 bits (15 md5 nibbles, bigint-safe in both
# engines), blocked on 4 bands of 15 bits.  4 bands guarantee recall for
# hamming <= 3 (pigeonhole: 3 flipped bits cannot dirty all 4 bands) and
# 2^15 buckets/band keep candidate generation selective.
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS


def hex_to_bigint_sql(col_expr: str, nibbles: int = 8) -> str:
    """Dialect-portable SQL: first ``nibbles`` hex chars of md5(col) ->
    bigint (identical in Spark and DuckDB; ``nibbles <= 15`` keeps the
    value under 2^60, bigint-safe in both engines)."""
    terms = " + ".join(
        f"(cast(instr('0123456789abcdef', substr(md5({col_expr}), {k}, 1)) as bigint) - 1) * {16 ** (nibbles - k)}"
        for k in range(1, nibbles + 1)
    )
    return f"({terms})"


def hex32_sql(col_expr: str) -> str:
    return hex_to_bigint_sql(col_expr, 8)


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def shingles(df: DataFrame, distinct: bool = True) -> DataFrame:
    """``documents(doc_id, text)`` -> ``(doc_id, sh)`` word 3-gram
    shingles of the normalized text.

    ``distinct=True`` is required for exact set-Jaccard verification; the
    MinHash signature path passes ``distinct=False`` because ``min()``
    over a multiset equals ``min()`` over its set.  Measured neutral at
    sandbox SF (map-side partial aggregation collapses both shapes
    before the wire), but at corpus scale the signature branch then
    shuffles 8 partial minima per (partition, doc) instead of the
    distinct shingle set — strictly less data as documents grow.
    """
    norm = norm_text("text")
    d = df.select("doc_id", norm.alias("t")).filter(F.col("t") != "")
    d = d.withColumn("ts", F.split("t", " ")).filter(F.size("ts") >= SHINGLE_WORDS)
    sh = F.explode(
        F.expr(
            "transform(sequence(0, size(ts) - 3), "
            "i -> concat(ts[i], ' ', ts[i+1], ' ', ts[i+2]))"
        )
    )
    out = d.select("doc_id", sh.alias("sh"))
    return out.distinct() if distinct else out


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame) -> DataFrame:
    """Duplicate groups by md5 of normalized text."""
    norm = norm_text("text")
    fp = df.select("doc_id", F.md5(norm.cast("binary")).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(sh: DataFrame) -> DataFrame:
    """``(doc_id, sh)`` -> one row per doc with minhash columns m0..m7."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")).cast("binary"))).alias(
            f"m{i}"
        )
        for i in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _cap_hot_buckets(
    bands: DataFrame,
    max_bucket: int | None,
    bucket_cols: tuple = ("band", "bk"),
) -> DataFrame:
    """Drop band buckets with more than ``max_bucket`` members BEFORE the
    self-join.  A degenerate corpus (k boilerplate docs sharing a band
    key — and exact duplicates share ALL bands) otherwise produces k^2/2
    candidate rows inside one bucket: invisible at sandbox SF, a
    straggler/OOM at 10^12 docs.  Recall is lost only inside degenerate
    buckets, whose members are overwhelmingly exact duplicates already
    owned by the exact-dedup tier.  ``None`` (default) keeps recall exact.
    """
    if max_bucket is None:
        return bands
    w = Window.partitionBy(*bucket_cols)
    return (
        bands.withColumn("_n", F.count("*").over(w))
        .filter(F.col("_n") <= max_bucket)
        .drop("_n")
    )


def _banded(sig: DataFrame) -> DataFrame:
    """``(doc_id, band, bk)`` band keys (2 hashes per band) from a
    signature frame — one ``posexplode`` over an array of band keys (a
    4-way union would compile 4x the operators for the same result).
    Shared by the self-join (:func:`lsh_candidate_pairs`) and the
    two-corpus join (:func:`incremental_dedup`)."""
    band_keys = F.array(
        *[
            F.md5(
                F.concat(F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}")).cast("binary")
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.select("doc_id", F.posexplode(band_keys).alias("band", "bk"))


def _pairs_from_bands(
    bands: DataFrame, max_bucket: int | None = None
) -> DataFrame:
    """Bucket self-join over an already-banded ``(doc_id, band, bk)``
    frame (the shared core of :func:`lsh_candidate_pairs` and the
    streaming sink, which reuses a checkpointed band table)."""
    bands = _cap_hot_buckets(bands, max_bucket)
    a = bands.alias("a")
    b_ = bands.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def lsh_candidate_pairs(
    sig: DataFrame, max_bucket: int | None = None
) -> DataFrame:
    """Band the signatures and self-join on bucket.

    ``max_bucket`` is the hot-bucket cap (see ``_cap_hot_buckets``)."""
    return _pairs_from_bands(_banded(sig), max_bucket)


def jaccard_verify(
    cand: DataFrame, sh: DataFrame, jaccard_min: float = JACCARD_MIN
) -> DataFrame:
    """Exact n-gram Jaccard for the LSH candidates.

    Two shapes, chosen by the shingle frame's schema:

    - ``(doc_id, sh)``: the historical shape — per-doc set sizes are a
      separate aggregate joined back twice.
    - ``(doc_id, sh, n)`` with ``n`` = the doc's distinct-shingle count
      carried on every row (round 6, built by
      :func:`minhash_lsh_duplicates` ``persist=True``): sizes ride the
      verification join itself — ``max(n)`` lands in the same
      ``(id_a, id_b)`` aggregation as the intersection count, deleting
      the corpus-wide sizes aggregate AND both size joins (3 fewer
      scheduled stages; at 10^12 docs, two fewer corpus-wide joins).
    """
    carried_n = "n" in sh.columns
    inter_aggs = [F.count("*").alias("n_int")]
    if carried_n:
        # n is constant within a doc, so max() is just "pick it up"
        inter_aggs += [
            F.max("s1.n").alias("_na"), F.max("s2.n").alias("_nb"),
        ]
    inter = (
        cand.join(sh.alias("s1"), F.col("id_a") == F.col("s1.doc_id"))
        .join(
            sh.alias("s2"),
            (F.col("id_b") == F.col("s2.doc_id")) & (F.col("s1.sh") == F.col("s2.sh")),
        )
        .groupBy("id_a", "id_b")
        .agg(*inter_aggs)
    )
    if carried_n:
        na, nb = F.col("_na"), F.col("_nb")
        joined = inter
    else:
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
        na, nb = F.col("na.n"), F.col("nb.n")
        joined = inter.join(
            sizes.alias("na"), F.col("id_a") == F.col("na.doc_id")
        ).join(sizes.alias("nb"), F.col("id_b") == F.col("nb.doc_id"))
    out = joined.select(
        "id_a",
        "id_b",
        # floor-truncation, not round(): portable across engines
        (
            F.floor(
                F.col("n_int") * F.lit(10000.0) / (na + nb - F.col("n_int"))
            )
            / 10000
        ).alias("jaccard"),
    )
    return out.filter(F.col("jaccard") >= jaccard_min)


def minhash_lsh_duplicates(
    df: DataFrame, persist: bool = True, max_bucket: int | None = None
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline over ``documents``.

    ``persist=True`` (the DEFAULT since round 6) derives EVERYTHING from
    ONE checkpointed distinct-shingle scan: the signature aggregation,
    and both sides of the Jaccard verification join, all read the
    materialized ``(doc_id, sh)`` table.  Value-identical to the lazy
    shape because ``min()`` over a shingle multiset equals ``min()``
    over its set — the signature branch loses nothing by reading the
    distinct table, with each row carrying its doc's shingle-set size
    so verification needs no sizes aggregate or size joins
    (:func:`_shingle_table_with_sizes`, :func:`jaccard_verify`).
    Measured effect (round 6, sf0.1, local[8]): scheduled jobs drop
    9 → 7 and the corpus-wide stage count falls by a sizes aggregate
    plus two joins — the per-query serial floor is stage schedulings,
    so fusing scans is how it shrinks (BASELINE.md "Query-engine
    scaling").  At cluster scale the checkpoint is the bucketed shingle
    table a production pipeline would materialize anyway between the
    signature and verify stages.

    NOTE: since round 8 ``persist=True`` materializes via the SQL cache
    (MEMORY_AND_DISK persist) instead of ``localCheckpoint`` — lazy (no
    jobs run at construction; the first action populates the cache),
    partitioning-preserving (a checkpoint degraded every downstream
    consumer to ``UnknownPartitioning``), and shared by all consumers
    including both sides of the banded self-join.  ``persist=False``
    keeps the historical fully-lazy plan: the shingle pipeline
    recomputes per consumer (3x), with the signature branch reading the
    cheaper non-distinct stream — the right shape when a caller embeds
    this operator inside a larger plan it will optimize as a whole.

    ``max_bucket`` caps hot LSH buckets (see ``_cap_hot_buckets``).
    """
    if persist:
        from pyspark import StorageLevel

        sh = _shingle_table_with_sizes(df)
        # the signature table feeds BOTH sides of the banded self-join;
        # without its own cache Spark re-runs the signature aggregation
        # once per side (no common-subplan sharing).  One (doc_id,
        # m0..m7) row per document — the signature store a production
        # pipeline materializes anyway.
        sig = minhash_signatures(sh.select("doc_id", "sh")).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        cand = lsh_candidate_pairs(sig, max_bucket=max_bucket)
        out = jaccard_verify(cand, sh)
        # the SQL cache is not GC-owned: expose the cached tables so a
        # long-lived caller can release executor storage once it has
        # materialized (or finished with) the result
        out._graft_caches = (sh, sig)
        return out
    sh = shingles(df)
    # min is duplicate-blind, so the lazy signature branch skips the
    # distinct shuffle by reading the raw stream
    sig = minhash_signatures(shingles(df, distinct=False))
    cand = lsh_candidate_pairs(sig, max_bucket=max_bucket)
    return jaccard_verify(cand, sh)


def _shingle_table_with_sizes(df: DataFrame) -> DataFrame:
    """The fused pipeline's materialized shingle table:
    ``(doc_id, sh, n)`` — distinct shingles with the doc's
    distinct-shingle count carried on every row — built behind ONE
    Exchange (pinned by ``tests/test_plans.py``): the explicit
    ``repartition(doc_id)`` satisfies both the (doc_id, sh) dedup (hash
    partitioning on a subset of the grouping keys co-locates every
    group) and the window count, so neither adds a shuffle.

    Round-8 changes (both measured; see OPTIMIZATION_r08.md):

    - the repartition moved BEFORE the shingle explode: it now ships the
      normalized *documents* (one row per doc) instead of the raw
      shingle stream (~3 rows per word — each word lands in 3 shingles),
      so the one Exchange carries roughly a third of the bytes AND the
      explode itself parallelizes past a single-split source.  Shingling
      is row-local, so doc co-location (what the dedup + window need) is
      preserved.
    - ``persist`` (MEMORY_AND_DISK) instead of ``localCheckpoint``: a
      checkpoint erases the plan's partitioning metadata
      (``UnknownPartitioning`` on the ExistingRDD scan), which made
      every downstream doc_id-keyed consumer re-Exchange and re-sort the
      table; the in-memory cache keeps the ``repartition(doc_id)``
      partitioning visible to Catalyst, and all three consumers (the
      signature aggregation and both sides of the verify join) share ONE
      materialization instead of re-reading checkpoint blocks through
      separate subplans.

    Trade vs ``shingles(df)`` (distinct): unchanged — one Exchange total
    against a sizes aggregate plus two corpus-wide joins downstream.  A
    document is bounded by the ingest size gate, so the per-doc grouping
    cannot skew a partition.
    """
    from pyspark import StorageLevel

    w = Window.partitionBy("doc_id")
    # explicit projection BEFORE the exchange (guide §2.3): ship only the
    # two columns the shingler reads, whatever the caller's frame carries
    raw = shingles(
        df.select("doc_id", "text").repartition("doc_id"), distinct=False
    )
    return (
        raw.dropDuplicates(["doc_id", "sh"])
        .withColumn("n", F.count("*").over(w))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def incremental_dedup(
    df: DataFrame,
    boundary: int = 1_000_000,
    max_bucket: int | None = None,
    jaccard_min: float = JACCARD_MIN,
) -> DataFrame:
    """Snapshot-vs-corpus dedup: which NEW documents are near-duplicates
    of the EXISTING corpus — the join every production crawl pipeline
    runs per snapshot (each Common-Crawl dump is deduped against all
    previous dumps, not just against itself; cf. Lee et al. 2022 §3,
    Penedo et al. 2024 §3.3's per-dump-vs-global discussion).

    The two-corpus shape differs from :func:`minhash_lsh_duplicates` in
    the join: band keys of the NEW side equi-join the OLD side's —
    never a self-join — so the candidate count is |new ∩ buckets|, not
    |corpus|², and the old side's band table is exactly what a
    production store keeps precomputed between snapshots (append-only:
    each finished snapshot's bands append to it).  Here the split is a
    ``doc_id >= boundary`` predicate over one input frame (the sandbox
    corpus encodes snapshot membership in the id space); the operator
    body is the general shape for any old/new partition.

    The hot-bucket cap applies to the OLD side only — the accumulated
    corpus is what carries the boilerplate head; a fresh snapshot's
    buckets are bounded by the snapshot size.

    Returns one row per DROPPED new document:
    ``(doc_id, n_old_matches, first_old_id, max_jaccard)`` — the
    verified old-corpus matches, their lowest id (the canonical doc the
    production pipeline records as the duplicate target), and the best
    Jaccard, ordered by doc_id.
    """
    is_new = F.col("doc_id") >= boundary
    # round 6: ONE checkpointed shingle scan feeds both signature sides
    # and the verification join (was 3 independent corpus scans); the
    # old/new split is a post-checkpoint filter on the narrow table
    sh_all = _shingle_table_with_sizes(df)
    old_sig = minhash_signatures(
        sh_all.filter(~is_new).select("doc_id", "sh")
    )
    new_sig = minhash_signatures(
        sh_all.filter(is_new).select("doc_id", "sh")
    )
    bo = _cap_hot_buckets(_banded(old_sig), max_bucket)
    bn = _banded(new_sig)
    cand = (
        bn.alias("n")
        .join(
            bo.alias("o"),
            (F.col("n.band") == F.col("o.band"))
            & (F.col("n.bk") == F.col("o.bk")),
        )
        .select(
            F.col("n.doc_id").alias("id_a"),
            F.col("o.doc_id").alias("id_b"),
        )
        .distinct()
    )
    ver = jaccard_verify(cand, sh_all, jaccard_min)
    return (
        ver.groupBy(F.col("id_a").alias("doc_id"))
        .agg(
            F.count("*").alias("n_old_matches"),
            F.min("id_b").alias("first_old_id"),
            F.max("jaccard").alias("max_jaccard"),
        )
        .orderBy("doc_id")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    jaccard_min: float = 0.2,
    persist: bool = False,
    max_bucket: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity with single-hash blocking.

    The lighter sibling of the full MinHash pipeline: candidates are
    pairs sharing minhash ``m0`` (1-hash LSH — high recall only for very
    similar docs), then exact word-3-gram Jaccard is computed for each.
    Useful as the verification tier when a cheaper blocker already
    exists, and as a direct ``jaccard(doc_a, doc_b)`` operator.

    The m0 blocker concentrates candidates in the most common min-shingle
    bucket under Zipf text, so it inherits the same hot-bucket exposure
    as the banded join — ``max_bucket`` applies the same cap (here the
    "band" is the single m0 hash).  Cache semantics as in
    ``minhash_lsh_duplicates``.
    """
    sh = shingles(df)
    if persist:
        from pyspark import StorageLevel

        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sig = minhash_signatures(shingles(df, distinct=False)).select("doc_id", "m0")
    sig = _cap_hot_buckets(sig, max_bucket, bucket_cols=("m0",))
    a = sig.alias("a")
    b = sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.m0") == F.col("b.m0"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    out = jaccard_verify(cand, sh, jaccard_min=jaccard_min)
    if persist:
        out = out.localCheckpoint()
        sh.unpersist()
    return out


# ---------------------------------------------------------------------------
# duplicate clustering: connected components over near-dup pairs
# ---------------------------------------------------------------------------


def duplicate_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Near-dup pairs ``(id_a, id_b)`` -> ``(doc_id, component_id)``.

    A dedup pipeline must pick ONE canonical doc per duplicate CLUSTER,
    not per pair — pairs (a,b),(b,c) are one cluster of three.  This is
    min-label propagation (the standard large-scale connected-components
    algorithm, cf. GraphX/GraphFrames): every node starts labeled with
    itself; each round takes the min of its own and its neighbors'
    labels; converges in O(component diameter) rounds.  Duplicate
    clusters are shallow (diameter << 25) so the driver-side loop runs a
    handful of DISTRIBUTED rounds — each round is one shuffle-join; the
    loop only checks the converged flag.  Each round's checkpoint blocks
    are unpersisted as soon as the next round is materialized, so block-
    manager storage stays O(1) rounds, not O(max_iter).

    ``component_id`` = the minimum doc_id in the component (making the
    canonical-doc choice deterministic and oracle-reproducible).

    Each round is ``localCheckpoint``-ed: iterative plans MUST truncate
    lineage, not just cache — a cached plan still nests the previous
    round's plan, so plan size (and Catalyst/explain cost) doubles per
    round and OOMs the driver around round 10.  On a cluster use
    ``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` for
    executor-loss-tolerant truncation; localCheckpoint is the local-mode
    equivalent.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without
    convergence (graph diameter > max_iter): a silently-unconverged label
    table would canonicalize duplicate clusters WRONG, and for a dedup
    pipeline that is data corruption, not degradation.  Raise ``max_iter``
    for pathological chain-shaped graphs.
    """
    ck = RoundCheckpointer(pairs)

    edges = pairs.select("id_a", "id_b")
    sym = ck.pin(
        edges.unionByName(
            edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        )
    )
    labels = ck.ckpt(
        sym.select(F.col("id_a").alias("doc_id"))
        .distinct()
        .withColumn("comp", F.col("doc_id"))
    )
    converged = False
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["id_b"] == labels["doc_id"])
            .groupBy("id_a")
            .agg(F.min("comp").alias("nbr_min"))
        )
        # The convergence diff below still reads the PREVIOUS round, so
        # its blocks are freed by rotate() only after the count.
        new_labels = ck.ckpt(
            labels.join(nbr_min, labels["doc_id"] == nbr_min["id_a"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_min"), F.col("comp"))
                ).alias("comp"),
            ),
            free_previous=False,
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        ck.rotate()  # new round is materialized; old blocks can go
        labels = new_labels
        if changed == 0:
            converged = True
            break
    ck.release_pinned()  # labels is checkpointed; it no longer reads sym
    if not converged:
        ck.free()
        raise RuntimeError(
            f"duplicate_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter); raise max_iter"
        )
    return labels.select("doc_id", F.col("comp").alias("component_id"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

#: Salt of the second, independent signature of the x2 tier — frozen so
#: the DuckDB oracle and any persisted signature store stay comparable.
SIMHASH_X2_SALT = "simx2:"


def simhash_signatures(df: DataFrame, salt: str | None = None) -> DataFrame:
    """60-bit simhash per document (md5-derived, dialect-portable).

    Value-identical to the DuckDB oracle's aggregate formulation, but
    ONE aggregation instead of the historical explode shape: 30 packed
    ones-count sum aggregates (two 31-bit fields per long) over the
    token-value stream, composed into the signature in a
    post-aggregation projection.  Versus the round-1..7 shape
    (60-way bit explode -> (doc_id, bit) aggregate -> signature
    aggregate) this deletes the 60x row explosion and TWO corpus-wide
    Exchanges: the only shuffle left carries 31 longs per (partition,
    doc) of partial state — less than the (doc_id, v, cnt) rows the
    old first Exchange shipped.  Measured (sf0.1, local[32]): steady
    state 2.4 s -> ~1.2 s, signatures bit-identical; the packed width
    keeps the first-execution whole-stage compile at ~0.5 s (the
    round-2 note about a >10 s Janino compile was for a wide aggregate
    whose every term re-derived the token hash; over a precomputed
    ``v`` column the expressions are tiny).

    The input is :func:`~..plans.layout.spread_input`-guarded: a
    single-row-group parquet source otherwise serializes the token
    explode + md5 hashing onto one task (guide §2.5 input skew); at
    production scale the guard is a no-op.

    ``salt`` (optional) prepends a literal to every token before
    hashing, producing an INDEPENDENT signature family over the same
    token multiset — the ingredient of the x2 tier
    (:func:`simhash_near_pairs_x2`).  ``None`` keeps the historical
    unsalted signature bit-for-bit.
    """
    from ..plans.layout import spread_input

    norm = norm_text("text")
    toks = (
        spread_input(df.select("doc_id", "text"))
        .select("doc_id", norm.alias("t"))
        .filter(F.col("t") != "")
        .select("doc_id", F.explode(F.split("t", " ")).alias("tok"))
    )
    if salt is None:
        tok_expr = "tok"
    else:
        # salt is interpolated into a SQL fragment — shared safe-charset
        # rule (functions.columns.ensure_safe_salt)
        from ..functions.columns import ensure_safe_salt

        ensure_safe_salt(salt)
        tok_expr = f"'{salt}' || tok"
    # Spark-only fast twin of ``hex_to_bigint_sql(tok_expr, 15)``: the
    # first 15 md5 hex chars as a base-16 number — conv() computes the
    # identical integer in one call instead of 15 instr/substr terms
    # (and one md5 instead of relying on subexpression elimination to
    # fold 15 of them).  The DuckDB oracle keeps the portable nibble
    # formulation; values are equal by definition of base-16.
    vals = toks.select(
        "doc_id",
        F.expr(
            f"cast(conv(substring(md5({tok_expr}), 1, 15), 16, 10) as bigint)"
        ).alias("v"),
    )
    # Per-bit majority vote as PACKED sum aggregates: 30 sums, each
    # accumulating TWO 31-bit ones-counters in one bigint (bit 2j in the
    # low field, bit 2j+1 shifted to bit 31).  Fields cannot interact:
    # every row adds 0/1 per field and a field's total is the doc's
    # ones-count for that bit, bounded by its token count < 2^30 (a JVM
    # string caps at 2^31-1 chars, so even a degenerate 1-char-token doc
    # stays under 2^30 tokens) — provably no carry into the next field,
    # and the packed sum stays under 2^62.  The vote ``sign(2*ones - n)``
    # with ``n = count(*)`` equals the historical count-weighted ±1 sum
    # exactly (integer arithmetic, commutative at any partitioning).
    # Width trade (measured): 60 plain ±1 sums compile ~1.3 s of
    # whole-stage codegen on first execution, the 30 packed sums ~0.5 s,
    # for identical results — and the bench cold run is what the driver
    # times.  shiftright, NOT float division: v has up to 60 significant
    # bits, beyond double's 53-bit mantissa.
    # one selectExpr call = one py4j round trip for all 30 packed terms
    # (a Column-DSL build of the same costs ~100 round trips of driver
    # wall); the project fuses into the partial aggregation under
    # whole-stage codegen, so the shape is unchanged
    packed = vals.selectExpr(
        "doc_id",
        *[
            f"(shiftright(v, {2 * j}) % 2)"
            f" + shiftleft(shiftright(v, {2 * j + 1}) % 2, 31) as c{j}"
            for j in range(SIMHASH_BITS // 2)
        ],
    )
    aggs = [F.sum(f"c{j}").alias(f"p{j}") for j in range(SIMHASH_BITS // 2)]
    aggs.append(F.count("*").alias("n"))
    per_doc = packed.groupBy("doc_id").agg(*aggs)
    # ONE parsed expression for the 60-term composition: a python-side
    # chain of Column ops costs ~300 py4j round trips (~0.8 s of driver
    # wall per query build); a single F.expr is one parse
    mask = (1 << 31) - 1
    sig_sql = "cast(" + " + ".join(
        f"(case when 2 * (shiftright(p{b // 2}, {31 * (b % 2)}) & {mask})"
        f" > n then {1 << b} else 0 end)"
        for b in range(SIMHASH_BITS)
    ) + " as bigint)"
    return per_doc.select("doc_id", F.expr(sig_sql).alias("simhash"))


def simhash_near_pairs(
    sig: DataFrame,
    hamming_max: int = HAMMING_MAX,
    n_bands: int = SIMHASH_BANDS,
    max_bucket: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Near-dup pairs: block on signature bands, verify Hamming distance.

    ``persist=True`` (default) caches the signature input
    (MEMORY_AND_DISK) before the banded self-join.  Spark does not share
    common subplans: without the cache BOTH sides of the self-join
    re-run the whole upstream signature pipeline (token explode + md5 +
    aggregation — observed as two full copies of it in the physical
    plan), doubling its compute and codegen.  The cached table is tiny
    (one ``(doc_id, simhash)`` row per document) and is exactly the
    signature store a production pipeline materializes between the
    signature and pairing stages; re-persisting an already-cached frame
    is a no-op, so callers that manage their own caching are unaffected.

    Banding is the corpus-size knob (pigeonhole: ``n_bands`` bands of
    ``60 / n_bands`` bits give GUARANTEED recall for
    ``hamming <= n_bands - 1``; wider bands = fewer bands = fewer false
    candidates but a lower guarantee):

    - 4 x 15 bits (default): recall guaranteed to hamming 3, 2^15
      buckets/band — right up to ~10^6 docs per partition-group.
    - 5 x 12 / 6 x 10: higher recall (hamming 4 / 5), MORE candidates —
      use when the verify tier is cheap relative to misses.
    - 3 x 20 / 2 x 30: at 10^8+ docs, 15-bit buckets saturate
      (n^2/2^15 collisions); drop the guarantee to hamming 2 / 1 and
      widen, or re-run banding within each oversized bucket.

    ``max_bucket`` (optional) skips buckets with more than that many
    members before pairing — the standard hot-bucket cap against
    adversarial/degenerate keys (e.g. boilerplate-only documents).  It
    trades recall ONLY inside degenerate buckets, where near-identical
    members are overwhelmingly exact duplicates better handled by the
    exact-dedup tier; the default (None) keeps recall exact.
    """
    if SIMHASH_BITS % n_bands:
        raise ValueError(f"n_bands must divide {SIMHASH_BITS}, got {n_bands}")
    if persist:
        from pyspark import StorageLevel

        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    band_bits = SIMHASH_BITS // n_bands
    band_mod = 2 ** band_bits
    byte_keys = F.array(
        *[
            # integer division (60-bit values exceed double precision)
            (F.expr(f"simhash div {band_mod ** k}L") % band_mod)
            for k in range(n_bands)
        ]
    )
    bands = sig.select(
        "doc_id", "simhash", F.posexplode(byte_keys).alias("band", "bk")
    )
    if max_bucket is not None:
        w = Window.partitionBy("band", "bk")
        bands = (
            bands.withColumn("_n", F.count("*").over(w))
            .filter(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    a = bands.alias("a")
    b_ = bands.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.expr("bit_count(sim_a ^ sim_b)")
    out = pairs.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= hamming_max)
    if persist:
        # expose the cached signature table for caller-side release
        # (the SQL cache is not GC-owned) — same contract as
        # minhash_lsh_duplicates
        out._graft_caches = (sig,)
    return out


def simhash_near_pairs_x2(
    docs: DataFrame,
    hamming_max: int = HAMMING_MAX,
    n_bands: int = SIMHASH_BANDS,
    max_bucket: int | None = None,
    s1_pairs: DataFrame | None = None,
) -> DataFrame:
    """Two-signature simhash tier: a pair is a near-duplicate if EITHER
    of two independent 60-bit signatures (unsalted + salted token hash)
    is within ``hamming_max``.

    Why: a single 60-bit simhash is a random projection — a true
    Jaccard-duplicate pair lands over the Hamming threshold with
    material probability (measured 0.18-0.30 miss rate on the planted
    corpus, ``dedup_recall_report``).  Two independent projections give
    each true pair two chances: miss probability squares
    (1-p -> (1-p)^2), which is the standard multi-probe trade.  Unlike
    widening to 6x10-bit bands, this KEEPS 15-bit band buckets — at
    10^8+ docs, 2^10-bucket bands saturate quadratically while 2^15
    stays workable, so the x2 tier is the scale-safe way to buy recall.
    Candidate volume is at most 2x the single tier's (same banding, two
    signature families), and each signature's verify stays a cheap
    integer ``bit_count``.

    Output: distinct ``(id_a, id_b, hamming)`` with ``hamming`` = the
    minimum distance across the two signatures (the stronger evidence).

    ``s1_pairs`` lets a caller that ALREADY ran the unsalted tier (e.g.
    :func:`dedup_recall_report`, which reports it standalone) pass its
    ``(id_a, id_b, hamming)`` pairs in, so the unsalted token explode +
    majority vote + banded self-join run once, not twice.
    """
    s1 = (
        s1_pairs.select("id_a", "id_b", "hamming")
        if s1_pairs is not None
        else simhash_near_pairs(
            simhash_signatures(docs),
            hamming_max=hamming_max, n_bands=n_bands, max_bucket=max_bucket,
        )
    )
    s2 = simhash_near_pairs(
        simhash_signatures(docs, salt=SIMHASH_X2_SALT),
        hamming_max=hamming_max, n_bands=n_bands, max_bucket=max_bucket,
    )
    out = (
        s1.unionByName(s2)
        .groupBy("id_a", "id_b")
        .agg(F.min("hamming").alias("hamming"))
    )
    # propagate the tiers' pinned signature caches for caller release
    out._graft_caches = tuple(
        getattr(s1, "_graft_caches", ()) + getattr(s2, "_graft_caches", ())
    )
    return out


def release_caches(df: DataFrame) -> None:
    """Unpersist the cached tables a dedup operator pinned for plan
    sharing (``_graft_caches``); no-op for frames without them.  Call
    once the result is materialized (e.g. checkpointed or written) —
    the frame stays valid afterwards, it would just recompute."""
    for c in getattr(df, "_graft_caches", ()):
        c.unpersist()


# ---------------------------------------------------------------------------
# pair-recall report: the dedup family's acceptance metric
# ---------------------------------------------------------------------------

def dedup_recall_report(
    docs: DataFrame, sub_mod: int = 4, jaccard_min: float = JACCARD_MIN
) -> DataFrame:
    """Pair recall of the approximate near-dup tiers against the exact
    Jaccard ground truth — the dedup twin of the ANN family's
    ``ann_recall_report``: the number a pipeline publishes before
    trusting banded LSH / simhash blocking over exhaustive comparison.

    Ground truth: on the ``doc_id % sub_mod == 0`` subset, every pair
    sharing at least one shingle (COMPLETE for jaccard > 0 — disjoint
    shingle sets have jaccard 0) verified at ``jaccard_min``.  The
    shingle self-join is the expensive exhaustive tier, which is exactly
    why it runs on the bounded subset only — the same exact/approx
    layering the ANN report uses.  ``sub_mod`` must divide the planted
    duplicate id offsets (1000000, 2000000) so planted pairs stay within
    the subset.

    One row per method ``(method, n_truth, n_found, n_hits, recall)``:

    - ``minhash_lsh``: the banded production tier.  At the 0.5 Jaccard
      threshold 8-hash/4-band LSH collides with probability
      ~1-(1-s^2)^4 (~0.68 at s=0.5, ~1 at s>=0.9), so near-threshold
      organic pairs are where recall is lost — which is what the report
      exists to measure.
    - ``simhash``: Hamming <= 3 banding.  A DIFFERENT similarity notion
      measured against the Jaccard truth: the report quantifies how much
      of the Jaccard-duplicate mass the cheaper bit-signature tier
      would catch alone.
    - ``simhash_x2``: the two-signature tier
      (:func:`simhash_near_pairs_x2`) — measured 0.90 at sf0.01 vs the
      single signature's 0.70.

    TRADE DOCUMENTED AS FINAL (round 6): the SimHash family cannot
    reach recall ~1 against a Jaccard-0.5 truth at any practical
    threshold — the residual misses are Jaccard ~0.78 pairs whose
    signatures differ by 7-11 of 60 bits on BOTH independent
    projections (measured per-pair; BASELINE.md "SimHash recall
    ceiling").  Catching Hamming-11 pairs by banding needs <=5-bit band
    buckets, which saturate quadratically at corpus scale.  The
    **MinHash-LSH tier (measured recall 1.0) is the designated primary
    near-dup tier**; SimHash (x2 where recall matters) is the cheap
    secondary for Hamming-style telemetry, not the dedup decision
    maker.
    """
    from ..functions.columns import dtrunc

    sub = docs.filter(F.col("doc_id") % sub_mod == 0)
    sh = shingles(sub)
    a, b = sh.alias("a"), sh.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    # the exhaustive truth feeds 4 consumers (n_truth agg + a semi-join
    # per method) and each tier's pairs feed 2; localCheckpoint the TINY
    # pair lists once instead of re-running the shingle self-join and
    # the tier pipelines per consumer — the same trade dedup_spans_apply
    # defaults to, for the same reason
    truth = (
        jaccard_verify(cand, sh, jaccard_min=jaccard_min)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    # the unsalted simhash tier is BOTH a reported method and half of
    # the x2 tier: checkpoint it once (with hamming) and feed it to x2
    # so the unsalted pipeline never runs twice.  Each tier's pinned
    # signature/shingle caches are released as soon as the checkpoint
    # has materialized the pairs — this report is called once per
    # corpus, and leaving its internal caches registered would hold
    # executor storage for the life of the session.
    s1_raw = simhash_near_pairs(simhash_signatures(sub))
    s1 = s1_raw.localCheckpoint()
    release_caches(s1_raw)
    mh_raw = minhash_lsh_duplicates(sub)
    mh = mh_raw.select("id_a", "id_b").localCheckpoint()
    release_caches(mh_raw)
    x2_raw = simhash_near_pairs_x2(sub, s1_pairs=s1)
    x2 = x2_raw.select("id_a", "id_b").localCheckpoint()
    release_caches(x2_raw)
    tiers = [
        ("minhash_lsh", mh),
        ("simhash", s1.select("id_a", "id_b")),
        ("simhash_x2", x2),
    ]
    base = truth.agg(F.count("*").alias("n_truth"))
    rows = []
    for method, found in tiers:
        n_found = found.agg(F.count("*").alias("n_found"))
        hits = truth.join(found, ["id_a", "id_b"], "left_semi").agg(
            F.count("*").alias("n_hits")
        )
        rows.append(
            base.join(F.broadcast(n_found))
            .join(F.broadcast(hits))
            .select(
                F.lit(method).alias("method"),
                "n_truth",
                "n_found",
                "n_hits",
                dtrunc(
                    F.col("n_hits") / F.greatest(F.col("n_truth"), F.lit(1)),
                    4,
                ).alias("recall"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def dedup_keep_best(docs: DataFrame, quality: DataFrame) -> DataFrame:
    """Quality-priority canonical selection: in every near-duplicate
    cluster keep the HIGHEST-quality member, not the earliest-crawled
    one (``corpus_dedup_apply`` / :func:`dedup_job.run_dedup_job` keep
    ``min(doc_id)``).

    The retention policy production dedup actually wants: when a page
    was crawled twice and one extraction is cleaner (boilerplate
    stripped better, fuller text), dropping by admission order throws
    the better copy away.  Keeper = max ``quality_score``, ties broken
    by min ``doc_id`` (deterministic; with identical planted copies the
    tie-break reproduces the min-id policy exactly).

    ``quality`` is any ``(doc_id, quality_score)`` frame —
    ``textstats.quality_scores`` in the registry wiring.  Returns the
    surviving ``(doc_id, quality_score)`` rows, one per kept doc;
    cluster members MISSING from ``quality`` rank below every scored
    member (sentinel −1; real scores live in [0, 1]) and surviving
    unscored docs carry a NULL ``quality_score`` — a partial quality
    frame must not exempt a doc from deduplication or drop it from the
    corpus.

    Scale shape: pairs -> components as in the min-id path; the keeper
    choice is ONE ``row_number`` window partitioned by component_id
    (components are duplicate clusters — small by construction, no skew
    beyond what the hot-bucket cap already bounds); the drop list is
    bounded by the duplicate mass and anti-joins the quality frame.
    The quality projection is scanned twice (cluster scoring + final
    anti-join); a production run materializes it once alongside the
    corpus — here it is a stateless single-scan projection.
    """
    pairs_raw = minhash_lsh_duplicates(docs)
    comp = duplicate_components(pairs_raw.select("id_a", "id_b"))
    # components are materialized (eager rounds): the MinHash pass's
    # pinned caches are no longer needed by anything downstream
    release_caches(pairs_raw)
    q = quality.select("doc_id", "quality_score")
    scored = comp.join(q, "doc_id", "left").select(
        "doc_id",
        "component_id",
        F.coalesce(F.col("quality_score"), F.lit(-1.0)).alias(
            "quality_score"
        ),
    )
    w = Window.partitionBy("component_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    drops = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select("doc_id")
    )
    return (
        docs.select("doc_id")
        .join(drops, "doc_id", "left_anti")
        .join(q, "doc_id", "left")
        .select("doc_id", "quality_score")
    )


def domain_dup_report(docs: DataFrame) -> DataFrame:
    """Per-domain near-duplicate rate — the telemetry that finds
    template farms: a domain whose pages are mostly near-duplicates of
    each other (or of other domains) is boilerplate-heavy, and crawl
    schedulers down-weight it.

    ``docs`` must carry ``(doc_id, text, domain)``.  One row per domain:
    ``(domain, n_docs, n_dup, dup_frac)`` where ``n_dup`` counts the
    NON-CANONICAL members of near-dup components (the docs a dedup pass
    would drop) and ``dup_frac`` is floor-truncated to 4 decimals.

    Scale shape: the pair/component machinery is the capped banded tier;
    the domain rollup is one map-side-combined aggregate over a
    left join against the bounded drop list — Zipf-hot domains are a
    groupBy skew, not a join explosion.
    """
    from ..functions.columns import dtrunc

    pairs_raw = minhash_lsh_duplicates(docs.select("doc_id", "text"))
    comp = duplicate_components(pairs_raw.select("id_a", "id_b"))
    release_caches(pairs_raw)  # components materialized; caches done
    non_canon = (
        comp.filter(F.col("doc_id") != F.col("component_id"))
        .select("doc_id")
        .withColumn("_dup", F.lit(1))
    )
    return (
        docs.select("doc_id", "domain")
        .join(non_canon, "doc_id", "left")
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0)))
            .cast("bigint")
            .alias("n_dup"),
        )
        .select(
            "domain",
            "n_docs",
            "n_dup",
            dtrunc(F.col("n_dup") / F.col("n_docs"), 4).alias("dup_frac"),
        )
    )


def snapshot_dedup_report(docs: DataFrame, dump_size: int = 100) -> DataFrame:
    """Cross-snapshot exact re-crawl rate: the dedup-rate-over-time
    curve a crawl team watches across dumps (a snapshot whose content
    mostly predates it is a re-crawl; rising redundancy = crawl budget
    wasted).

    Documents are assigned to synthetic dumps of ``dump_size``
    consecutive ``doc_id``s (admission order — the same convention as
    :func:`incremental_dedup` and :func:`doc_novelty`).  A doc is
    REDUNDANT when its exact normalized content (md5 fingerprint, the
    ``exact_duplicates``/``doc_fingerprint`` convention) first appeared
    in an EARLIER dump; first-in-corpus copies and same-dump duplicates
    are not counted (same-dump dups are the in-snapshot dedup pass's
    job).  One row per dump: ``(dump, n_docs, n_redundant, redundant_frac)``.

    Scale shape: one fingerprint scan; first-seen is a map-side-combined
    ``min(doc_id)`` per fingerprint (min doc_id ⇒ min dump — ``div`` is
    monotonic); the join back is on the fingerprint key both sides
    already shuffle on; the dump rollup is a tiny aggregate.
    """
    from ..functions.columns import dtrunc, norm_text

    fp = docs.select("doc_id", F.md5(norm_text("text")).alias("fp"))
    first = fp.groupBy("fp").agg(F.min("doc_id").alias("first_id"))
    dump = F.expr(f"doc_id div {int(dump_size)}")
    first_dump = F.expr(f"first_id div {int(dump_size)}")
    per_doc = fp.join(first, "fp").select(
        dump.alias("dump"),
        (first_dump < dump).cast("bigint").alias("is_re"),
    )
    return (
        per_doc.groupBy("dump")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("is_re").cast("bigint").alias("n_redundant"),
        )
        .select(
            "dump",
            "n_docs",
            "n_redundant",
            dtrunc(F.col("n_redundant") / F.col("n_docs"), 4).alias(
                "redundant_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# eval-set decontamination
# ---------------------------------------------------------------------------

def contaminated_docs(
    train: DataFrame, eval_docs: DataFrame, min_hits: int = 2
) -> DataFrame:
    """Training documents sharing word n-grams with any eval document —
    the decontamination pass every serious pre-training corpus runs
    (cf. the n-gram overlap checks published with GPT-3 appendix C /
    Llama 2 §A.6).

    ``(doc_id, n_hits, n_eval_docs)`` for training docs with at least
    ``min_hits`` distinct shingles found in the eval set.  Shape at
    corpus scale: the EVAL side is tiny by definition, so its distinct
    shingle set broadcasts and the training side is one scan + explode +
    broadcast semi-join + one map-side-combined aggregation — no
    training-side self-join anywhere.
    """
    # distinct=False: the downstream count_distinct() aggregations are
    # duplicate-proof, so the training-side distinct shuffle (the
    # dominant cost at corpus scale) buys nothing
    train_sh = shingles(train, distinct=False)
    eval_sh = (
        shingles(eval_docs)
        .select(F.col("doc_id").alias("eval_id"), "sh")
        .distinct()
    )
    hits = train_sh.join(F.broadcast(eval_sh), "sh")
    return (
        hits.groupBy("doc_id")
        .agg(
            # DISTINCT shingles, not join rows: a single shared 3-gram
            # that happens to appear in many eval docs is one overlap,
            # not many (the threshold would be meaningless otherwise)
            F.count_distinct("sh").alias("n_hits"),
            F.count_distinct("eval_id").alias("n_eval_docs"),
        )
        .filter(F.col("n_hits") >= min_hits)
    )


def eval_contamination_report(
    train: DataFrame, eval_docs: DataFrame, dirty_bp: int = 1000
) -> DataFrame:
    """The eval-side view of decontamination: for EVERY eval document,
    what fraction of its distinct word n-grams appears anywhere in the
    training corpus — the "percent clean / percent dirty" accounting
    GPT-3 appendix C and Llama 2 §A.6 publish alongside their results
    (:func:`contaminated_docs` is the train-side drop list; this is the
    audit you hand to the eval's consumers).

    ``(eval_id, n_shingles, n_hit, overlap_frac, is_dirty)``, one row
    per eval doc (zero-overlap docs included — an audit that omits the
    clean rows isn't an audit; docs too short to shingle, under 3
    normalized words, appear with ``n_shingles = 0``, overlap 0, not
    dirty).  ``dirty_bp`` is the dirtiness threshold in basis points
    (1000 = 10%); the flag compares ``n_hit * 10000 >= dirty_bp *
    n_shingles`` in pure integers ON SHINGLED DOCS, so the boundary
    case is exact in every engine.  ``overlap_frac`` is floor-truncated
    to 4 decimals for display only.

    Scale shape (the mirror of :func:`contaminated_docs`): the eval
    side is tiny by definition, so its distinct shingle set broadcasts
    into ONE pass over the training corpus; hits dedup per
    ``(eval_id, sh)`` with a map-side-combined aggregate keyed by the
    broadcast-small eval side — the 10^12-row train side is scanned
    once and never shuffled on its own key.  Production runs use
    13-grams (GPT-3's choice); the shared 3-gram shingle core keeps the
    oracle twin verbatim-comparable here.
    """
    from ..functions.columns import dtrunc

    eval_sh = (
        shingles(eval_docs)
        .select(F.col("doc_id").alias("eval_id"), "sh")
        .distinct()
    )
    # left join from the eval ids, not from the shingle table: a doc
    # too short to shingle must still get its audit row
    totals = (
        eval_docs.select(F.col("doc_id").alias("eval_id"))
        .distinct()
        .join(
            eval_sh.groupBy("eval_id").agg(F.count("*").alias("n_shingles")),
            "eval_id",
            "left",
        )
        .select(
            "eval_id",
            F.coalesce(F.col("n_shingles"), F.lit(0)).alias("n_shingles"),
        )
    )
    # distinct=False: the count_distinct below is duplicate-proof, so
    # the train-side distinct shuffle buys nothing (cf. contaminated_docs)
    hits = (
        shingles(train, distinct=False)
        .join(F.broadcast(eval_sh), "sh")
        .groupBy("eval_id")
        .agg(F.count_distinct("sh").alias("n_hit"))
    )
    return (
        totals.join(hits, "eval_id", "left")
        .select(
            "eval_id",
            "n_shingles",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
        )
        .select(
            "eval_id",
            "n_shingles",
            "n_hit",
            # zero-shingle docs: overlap 0, never dirty (0/0 would be
            # NULL here and an error in the oracle engine)
            F.when(F.col("n_shingles") == 0, F.lit(0.0))
            .otherwise(dtrunc(F.col("n_hit") / F.col("n_shingles"), 4))
            .alias("overlap_frac"),
            (
                (F.col("n_shingles") > 0)
                & (
                    F.col("n_hit") * 10000
                    >= F.lit(dirty_bp) * F.col("n_shingles")
                )
            ).alias("is_dirty"),
        )
    )


# ---------------------------------------------------------------------------
# LSH bucket audit: the skew telemetry a corpus-scale dedup run watches
# ---------------------------------------------------------------------------

def lsh_bucket_audit(docs: DataFrame, cap: int = 100) -> DataFrame:
    """Per-band LSH bucket-skew telemetry for the MinHash tier: the
    numbers an operator of a 10^12-document dedup run watches to know
    whether the banded self-join is about to explode.

    One row per band: ``(band, n_docs, n_buckets, max_bucket,
    n_pairs_uncapped, n_buckets_over_cap, n_docs_over_cap,
    n_pairs_capped)`` where ``n_pairs_uncapped = Σ k·(k−1)/2`` over the
    band's bucket sizes k (the exact candidate volume the self-join
    would produce) and ``n_pairs_capped`` is the same sum restricted to
    buckets with ``k <= cap`` — the volume after
    :func:`_cap_hot_buckets`.  All columns are integers; the
    uncapped-vs-capped pair is exactly the evidence behind the
    production cap default (NOTES.md "scale-knob defaults"; the 100k
    smoke's "4.6% of budget" figure is this report's bottom line).

    Scale shape: signatures -> band explode -> ONE (band, bk) count
    aggregate (map-side combined) -> a 4-row per-band rollup.  Nothing
    here ever materializes a candidate pair; the quadratic term is
    computed arithmetically from bucket counts, which is why the audit
    is safe to run where the join it predicts is not.
    """
    bands = _banded(minhash_signatures(shingles(docs)))
    buckets = bands.groupBy("band", "bk").agg(F.count("*").alias("k"))
    k = F.col("k")
    # integer DIV, not double /: exact for any bucket a real corpus can
    # produce (double loses pair counts above k ~ 9.5e7)
    pairs = F.expr("k * (k - 1) DIV 2")
    over = k > F.lit(cap)
    return buckets.groupBy("band").agg(
        F.sum(k).cast("bigint").alias("n_docs"),
        F.count("*").alias("n_buckets"),
        F.max(k).cast("bigint").alias("max_bucket"),
        F.sum(pairs).cast("bigint").alias("n_pairs_uncapped"),
        F.sum(over.cast("bigint")).alias("n_buckets_over_cap"),
        F.sum(F.when(over, k).otherwise(0)).cast("bigint").alias(
            "n_docs_over_cap"
        ),
        F.sum(F.when(over, F.lit(0)).otherwise(pairs))
        .cast("bigint")
        .alias("n_pairs_capped"),
    )


# ---------------------------------------------------------------------------
# shingle novelty: how much of each doc the corpus hasn't seen before
# ---------------------------------------------------------------------------

def doc_novelty(docs: DataFrame) -> DataFrame:
    """Per-document novelty against the corpus in ``doc_id`` order:
    the fraction of a doc's distinct word 3-grams whose FIRST
    occurrence (minimum ``doc_id`` over the corpus) is the doc itself.

    ``(doc_id, n_shingles, n_novel, novelty_frac)``.  Novelty is the
    content-freshness signal crawl pipelines rank sources by (a dump
    whose docs are mostly first-occurrences is worth keeping; one whose
    shingles all predate it is a re-crawl) and the doc-level complement
    of :func:`duplicate_spans` — span dedup cuts repeats, novelty
    scores how much would survive.  With ``doc_id`` assigned by
    admission time, "lower id" = "seen earlier", the same convention
    as :func:`incremental_dedup`'s boundary.

    Scale shape: one distinct-shingle scan; first-seen is a map-side-
    combined ``min(doc_id)`` per shingle; novelty is ONE equi-join of
    the doc's shingles against that aggregate on the shingle key — the
    same shuffle key both sides already have, so AQE coalesces it into
    a single co-partitioned pass.  No self-join, no window over the
    corpus.
    """
    from ..functions.columns import dtrunc

    sh = shingles(docs)
    first_seen = sh.groupBy("sh").agg(F.min("doc_id").alias("first_id"))
    return (
        sh.join(first_seen, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                (F.col("first_id") == F.col("doc_id")).cast("bigint")
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            dtrunc(F.col("n_novel") / F.col("n_shingles"), 4).alias(
                "novelty_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# exact substring-duplicate spans (Lee et al. 2022-style)
# ---------------------------------------------------------------------------

def duplicate_spans(docs: DataFrame, n: int = 20, min_docs: int = 2) -> DataFrame:
    """Token positions opening an ``n``-gram that appears in at least
    ``min_docs`` documents — the span-level signal behind exact substring
    deduplication ("Deduplicating Training Data Makes Language Models
    Better", Lee et al. 2022: cut repeated >=50-token spans instead of
    dropping whole documents; ``n`` is the knob).

    Returns ``(doc_id, start_tok, span_hash)`` per duplicated span start.
    Shape at corpus scale: one scan -> positional n-gram explode (hashes
    only — never the text — cross the wire) -> one map-side-combined
    count shuffle -> semi-join back.  The suffix-array construction of
    the paper is the single-machine shape; the hash-count formulation is
    its standard distributed equivalent.
    """
    d = docs.select("doc_id", norm_text("text").alias("t")).filter(
        F.col("t") != ""
    )
    d = d.withColumn("ts", F.split("t", " ")).filter(F.size("ts") >= n)
    grams = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(ts) - {n}),"
                f" i -> md5(array_join(slice(ts, i + 1, {n}), ' ')))"
            )
        ).alias("start_tok", "span_hash"),
    )
    hot = (
        grams.groupBy("span_hash")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("span_hash")
    )
    return grams.join(hot, "span_hash").select("doc_id", "start_tok", "span_hash")


def dedup_spans_apply(
    docs: DataFrame, n: int = 20, min_docs: int = 2, persist: bool = True
) -> DataFrame:
    """Exact substring dedup APPLIED (Lee et al. 2022): for every
    duplicated ``n``-gram span, the lowest doc_id keeps its occurrences
    and every other document drops the covered tokens; returns the
    rebuilt corpus ``(doc_id, text, n_kept, n_dropped)``.

    Deterministic keeper rule (frozen): ``min(doc_id)`` per span hash.
    Scale shape: only TOUCHED documents ever explode to token rows — the
    span detection is hash-only (see :func:`duplicate_spans`), coverage
    expands ``n`` positions per dropped span start, and the rebuild is a
    single (doc_id)-keyed aggregation with an ordered ``collect_list``
    (bounded by document length, the same bound the extractor already
    holds per row).  Untouched documents pass through as their
    normalized text with zero shuffled token rows.

    ``spans`` feeds two consumers (keeper + drops) and ``cover`` three
    (touched, anti-join, drop counts): Catalyst recomputes DataFrame
    lineage per branch, so without persistence the n-gram explode runs
    up to twice and the coverage expansion up to three times.
    ``persist=True`` (the DEFAULT — the checkpoints are tiny relative to
    the recompute, so this is the right call at every scale) eagerly
    localCheckpoints both; ``tests/test_plans.py`` pins that the gram
    md5 expression then appears exactly once across the job's plans.
    ``persist=False`` keeps the operator a pure lazy DataFrame for
    callers composing larger plans.

    .. note:: release-note semantics (round 5): the default flipped
       from ``persist=False`` to ``True``, so merely *constructing*
       this DataFrame now fires Spark jobs (the localCheckpoints are
       eager).  Callers that need a fully lazy plan — e.g. building a
       plan against a session that is not yet ready to execute — must
       pass ``persist=False`` explicitly.
    """
    d = docs.select("doc_id", norm_text("text").alias("t"))
    spans = duplicate_spans(docs, n=n, min_docs=min_docs)
    if persist:
        spans = spans.localCheckpoint()
    keeper = spans.groupBy("span_hash").agg(F.min("doc_id").alias("keep_doc"))
    drops = (
        spans.join(keeper, "span_hash")
        .filter(F.col("doc_id") != F.col("keep_doc"))
        .select("doc_id", "start_tok")
    )
    cover = drops.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(start_tok, start_tok + {n - 1})")
        ).alias("pos"),
    ).distinct()
    if persist:
        cover = cover.localCheckpoint()
    touched = cover.select("doc_id").distinct()
    toks = d.join(touched, "doc_id").select(
        "doc_id", F.posexplode(F.split("t", " ")).alias("pos", "tok")
    )
    kept = toks.join(cover, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.expr(
                "transform(array_sort(collect_list(struct(pos, tok))),"
                " x -> x.tok)"
            ),
        ).alias("_text"),
        F.count("*").alias("_n_kept"),
    )
    ndrop = cover.groupBy("doc_id").agg(F.count("*").alias("_n_dropped"))
    n_toks = F.when(F.col("t") == "", F.lit(0)).otherwise(
        F.size(F.split("t", " "))
    )
    return (
        d.join(rebuilt, "doc_id", "left")
        .join(ndrop, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                F.col("_n_dropped").isNotNull(),
                F.coalesce("_text", F.lit("")),
            )
            .otherwise(F.col("t"))
            .alias("text"),
            F.when(
                F.col("_n_dropped").isNotNull(), F.coalesce("_n_kept", F.lit(0))
            )
            .otherwise(n_toks)
            .cast("bigint")
            .alias("n_kept"),
            F.coalesce("_n_dropped", F.lit(0)).cast("bigint").alias("n_dropped"),
        )
    )


def cluster_size_report(components: DataFrame) -> DataFrame:
    """Near-dup cluster-size histogram over a ``(doc_id, component_id)``
    frame: one row per cluster size — ``(cluster_size, n_clusters,
    n_docs)`` — the telemetry that distinguishes a corpus of scattered
    pair-dups from one dominated by template farms (a handful of
    10^5-member clusters), which changes both the dedup retention
    policy and the crawl budget.

    Scale shape: two map-side-combined aggregates, each over data no
    larger than the components frame (clusters, then sizes) — the
    second input is cluster-cardinality, the third size-cardinality.
    """
    sizes = components.groupBy("component_id").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
    )
