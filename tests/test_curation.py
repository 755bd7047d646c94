"""Semantics of the training-set assembly operators (curation.py).

Cross-engine bit-identity with the DuckDB oracles is covered by
``test_oracle_parity`` (registry-parametrized); here we pin the
*meaning*:

- sequence_pack: the per-shard token streams are gapless and
  exhaustive, pack indices slice the stream in exact ``seq_len`` steps,
  and the layout is a pure function of (salt, doc_id) — reproducible at
  any parallelism.
- dsir_select: on a separable two-domain corpus the integer-exact
  linear-ratio score selects the same set as the log-space DSIR weight
  (Xie et al. 2023) computed longhand in Python.
"""

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_sequence_pack_streams_are_gapless(spark, docs):
    from deepseek_ocr_customvllm_spark.operators.curation import sequence_pack

    rows = sequence_pack(docs, seq_len=64).collect()
    assert rows, "non-empty corpus must pack"
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.start_tok)
        pos = 0
        for r in rs:
            # gapless concatenation: each doc starts where the previous ended
            assert r.start_tok == pos, (shard, r)
            assert r.n_tokens > 0
            end0 = r.start_tok + r.n_tokens - 1
            assert r.pack_first == r.start_tok // 64
            assert r.pack_last == end0 // 64
            assert r.n_packs == r.pack_last - r.pack_first + 1
            pos += r.n_tokens


def test_sequence_pack_covers_every_nonempty_doc_once(spark, docs):
    from deepseek_ocr_customvllm_spark.operators.curation import sequence_pack

    out = sequence_pack(docs)
    n_out = out.count()
    assert out.select("doc_id").distinct().count() == n_out
    n_nonempty = (
        docs.select(
            F.regexp_replace(
                F.trim(F.lower("text")), r"[ \t\n\r\f\x0B]+", " "
            ).alias("t")
        )
        .filter(F.col("t") != "")
        .count()
    )
    assert n_out == n_nonempty


def test_sequence_pack_layout_is_parallelism_invariant(spark, docs):
    """The packed layout must be a pure function of (salt, doc_id):
    repartitioning the input arbitrarily cannot move a single token."""
    from deepseek_ocr_customvllm_spark.operators.curation import sequence_pack

    a = sorted(map(tuple, sequence_pack(docs).collect()))
    b = sorted(map(tuple, sequence_pack(docs.repartition(17)).collect()))
    assert a == b


def _two_domain_corpus(spark):
    """Target source speaks vocab A; raw docs split between vocab A
    (wanted) and vocab B (unwanted).  Same length everywhere so neither
    scoring variant gets a length confound."""
    vocab_a = ["alpha", "beta", "gamma", "delta", "epsilon"]
    vocab_b = ["zeta", "eta", "theta", "iota", "kappa"]

    def text(vocab, i):
        return " ".join(vocab[(i + j) % len(vocab)] for j in range(30))

    rows = []
    for i in range(10):  # target slice
        rows.append((1000 + i, text(vocab_a, i), "en", "src0", 0))
    for i in range(10):  # raw, target-like
        rows.append((2000 + i, text(vocab_a, i + 3), "en", "src1", 0))
    for i in range(10):  # raw, off-domain
        rows.append((3000 + i, text(vocab_b, i), "en", "src2", 0))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_dsir_select_matches_log_space_selection(spark):
    from deepseek_ocr_customvllm_spark.operators.curation import dsir_select

    corpus = _two_domain_corpus(spark)
    picked = {
        r.doc_id for r in dsir_select(corpus, k=10, n_buckets=256).collect()
    }
    assert picked == {2000 + i for i in range(10)}, picked

    # longhand log-space DSIR weights over the same hashed buckets
    import hashlib

    def bucket(term):
        h = hashlib.md5(("dsir-v1" + term).encode()).hexdigest()
        return int(h[:8], 16) % 256

    target_counts, raw_counts, doc_feats = {}, {}, {}
    for row in corpus.collect():
        feats = {}
        for term in row.text.lower().split():
            feats[bucket(term)] = feats.get(bucket(term), 0) + 1
        if row.source == "src0":
            for b, c in feats.items():
                target_counts[b] = target_counts.get(b, 0) + c
        else:
            doc_feats[row.doc_id] = feats
            for b, c in feats.items():
                raw_counts[b] = raw_counts.get(b, 0) + c
    t_tot = sum(target_counts.values()) + 256
    r_tot = sum(raw_counts.values()) + 256
    log_scores = {
        doc_id: sum(
            c
            * math.log(
                ((target_counts.get(b, 0) + 1) / t_tot)
                / ((raw_counts.get(b, 0) + 1) / r_tot)
            )
            for b, c in feats.items()
        )
        for doc_id, feats in doc_feats.items()
    }
    log_top = {
        d for d, _ in sorted(log_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    }
    assert picked == log_top


def test_dsir_select_scores_are_descending_and_capped(spark, docs):
    from deepseek_ocr_customvllm_spark.operators.curation import dsir_select

    rows = dsir_select(docs, k=25).collect()
    assert 0 < len(rows) <= 25
    scores = sorted((r.score for r in rows), reverse=True)
    assert all(s > 0 for s in scores)
    # nothing outside the top-k can out-score the selected minimum
    all_scores = dsir_select(docs, k=10**6).collect()
    kth = scores[-1]
    better = [r for r in all_scores if r.score > kth]
    assert len(better) <= 25
