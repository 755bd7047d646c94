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

from .textstats import with_norm


def _md5_bigint(expr: str, salt: str, nibbles: int = 8) -> F.Column:
    """First ``nibbles`` hex chars of ``md5(salt || expr)`` as bigint —
    the same portable hash used by ``doc_sample`` (DuckDB twin:
    ``dedup.hex_to_bigint_sql``)."""
    return F.expr(
        f"cast(conv(substring(md5(concat('{salt}', {expr})), 1, {nibbles}),"
        " 16, 10) as bigint)"
    )


def sequence_pack(
    df: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 8,
    salt: str = "pack-v1",
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
    """
    from pyspark.sql.window import Window

    toks = with_norm(df).select(
        "doc_id",
        F.when(F.col("t") == "", F.lit(0))
        .otherwise(F.size(F.split(F.col("t"), " ")))
        .cast("bigint")
        .alias("n_tokens"),
    )
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
