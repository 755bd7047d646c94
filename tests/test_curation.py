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


def test_temperature_sample_quotas_follow_sqrt(spark):
    """alpha = 0.5 means a 16:1 population imbalance becomes a 4:1
    sampling imbalance — the tail-language upweighting that IS
    temperature sampling (mT5 §3.1)."""
    from deepseek_ocr_customvllm_spark.operators.curation import (
        temperature_sample,
    )

    rows = [
        (i, "big" if i < 1600 else "small", f"doc {i}")
        for i in range(1700)  # big: 1600 docs, small: 100 docs
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = temperature_sample(df, budget=100).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    qb = by_lang["big"][0].quota
    qs = by_lang["small"][0].quota
    # isqrt(1600)=40, isqrt(100)=10 -> quotas 100*40//50=80, 100*10//50=20
    assert (qb, qs) == (80, 20)
    # proportional sampling would have given small ~5 of 100 — the
    # temperature exponent quadruples its share
    assert len(by_lang["big"]) == qb and len(by_lang["small"]) == qs
    # every emitted rank is within quota and ranks are distinct per lang
    for lang, rs in by_lang.items():
        ranks = sorted(r.samp_rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))


def test_temperature_sample_is_deterministic(spark, docs):
    from deepseek_ocr_customvllm_spark.operators.curation import (
        temperature_sample,
    )

    a = [tuple(r) for r in temperature_sample(docs).collect()]
    b = [tuple(r) for r in temperature_sample(docs).collect()]
    assert a == b and len(a) > 0


def test_integer_sqrt_is_exact_at_perfect_square_boundaries(spark):
    """The quota path trusts floor(sqrt(double(n))) to be exact: IEEE
    correctly-rounded sqrt cannot round k^2 - 1 up to k, nor k^2 below
    k, for any n < 2^52.  Pin it through the same Spark expression the
    operator uses, at the boundaries where it would first break."""
    ks = [2, 3, 10, 1000, 2**20, 2**26 - 1]
    cases = []
    for k in ks:
        cases.append((k * k, k))
        cases.append((k * k - 1, k - 1))
        cases.append((k * k + 1, k))
    df = spark.createDataFrame(cases, "n long, want long")
    bad = df.filter(
        F.expr("cast(floor(sqrt(cast(n as double))) as bigint) != want")
    ).count()
    assert bad == 0


def test_ccnet_bucket_orders_rare_token_docs_into_tail(spark):
    """Docs made of corpus-rare tokens must land in 'tail' (high
    surprisal), docs of the dominant token in 'head', and the per-lang
    tercile sizes must differ by at most one."""
    from deepseek_ocr_customvllm_spark.operators.curation import ccnet_bucket

    rows = []
    # 9 docs in one language: 3 of a dominant token (repeated), 3 mixed,
    # 3 of per-doc-unique rare tokens
    for i in range(3):
        rows.append((i, "xx", "common " * 50))
    for i in range(3, 6):
        rows.append((i, "xx", "common common rare" + str(i) + " "))
    for i in range(6, 9):
        rows.append((i, "xx", ("unique" + str(i) + "x ") * 2))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.doc_id: r for r in ccnet_bucket(df).collect()}
    assert len(out) == 9
    buckets = [out[i].ppl_bucket for i in range(9)]
    assert buckets[:3] == ["head"] * 3
    assert buckets[6:] == ["tail"] * 3
    from collections import Counter

    sizes = Counter(buckets)
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # scores are monotone with the construction
    assert out[0].bits_x1000 < out[3].bits_x1000 < out[6].bits_x1000


def test_ccnet_bucket_bits_formula(spark):
    """One language, two terms: the dominant term's surprisal is the
    bit-width of T/c — pin the arithmetic end to end."""
    from deepseek_ocr_customvllm_spark.operators.curation import ccnet_bucket

    # 'a' appears 12 times, 'b' 4 times -> T=16; bits(a)=len(bin(16//12=1))=1,
    # bits(b)=len(bin(16//4=4))=3
    rows = [
        (0, "xx", "a a a a a a a a a a a a"),
        (1, "xx", "b b b b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.doc_id: r for r in ccnet_bucket(df).collect()}
    assert out[0].bits_x1000 == 1000 * 1
    assert out[1].bits_x1000 == 1000 * 3


def test_training_set_assembly_composes_all_four_stages(spark, docs):
    """The capstone must show each stage's fingerprint in its output:
    deduped (no two rows share a normalized-text fingerprint), gated
    (every doc >= min_tokens), budgeted (<= budget rows), and packed
    (per-shard token streams gapless from offset 0)."""
    from deepseek_ocr_customvllm_spark.operators.curation import (
        training_set_assembly,
    )

    rows = training_set_assembly(docs).collect()
    assert 0 < len(rows) <= 200
    assert all(r.n_tokens >= 10 for r in rows)
    # dedup stage: recompute fingerprints for the selected docs
    ids = {r.doc_id for r in rows}
    fps = {
        r.doc_id: r.fp
        for r in docs.selectExpr(
            "doc_id",
            "md5(regexp_replace(trim(lower(text)),"
            " '[ \\t\\n\\r\\f\\u000B]+', ' ')) AS fp",
        ).collect()
        if r.doc_id in ids
    }
    assert len(set(fps.values())) == len(ids), "duplicate texts survived"
    # pack stage: gapless per-shard streams
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.start_tok)
        pos = 0
        for r in rs:
            assert r.start_tok == pos
            assert r.pack_first == r.start_tok // 512
            pos += r.n_tokens


def test_training_set_assembly_keeps_lowest_doc_id_per_duplicate(spark):
    """Planted exact duplicates: only the lowest doc_id of each
    duplicate set may appear in the layout."""
    from deepseek_ocr_customvllm_spark.operators.curation import (
        training_set_assembly,
    )

    rows = [(i, "xx", "the same exact text " * 5) for i in range(5)]
    rows += [(10 + i, "xx", f"unique text number {i} " * 5) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.doc_id for r in training_set_assembly(df, budget=50).collect()}
    assert 0 in out
    assert not (out & {1, 2, 3, 4}), "non-keeper duplicates leaked"


def test_training_set_assembly_is_parallelism_invariant(spark, docs):
    """The layout must be a pure function of the corpus content — the
    same rows whatever the input partitioning (the property that makes
    the assembly reproducible on any cluster size)."""
    from deepseek_ocr_customvllm_spark.operators.curation import (
        training_set_assembly,
    )

    a = [tuple(r) for r in training_set_assembly(docs.repartition(3)).collect()]
    b = [tuple(r) for r in training_set_assembly(docs.repartition(11)).collect()]
    assert a == b and len(a) > 0


def test_bigram_surprisal_hand_computed(spark):
    """Integer-exact order-2 surprisal on a corpus small enough to do by
    hand.  Corpus bigrams: 'a b'x3, 'b a'x1, 'b c'x1; first-token
    counts: a->3, b->2.  bits('a b') = len(bin(3//3)) = 1,
    bits('b a') = bits('b c') = len(bin(2//1)) = 2."""
    from deepseek_ocr_customvllm_spark.operators.curation import (
        bigram_surprisal,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in bigram_surprisal(docs).collect()}
    assert set(got) == {1, 2}  # doc 3 has no bigram, no row
    # doc 1: bits (1, 2, 1) over 3 bigrams -> 1000*4 div 3
    assert got[1].n_bigrams == 3 and got[1].bits_x1000 == 1333
    # doc 2: bits (1, 2) over 2 bigrams -> 1500
    assert got[2].n_bigrams == 2 and got[2].bits_x1000 == 1500
    # persist=False is value-identical (the default only saves re-runs)
    lazy = {
        (r.doc_id, r.n_bigrams, r.bits_x1000)
        for r in bigram_surprisal(docs, persist=False).collect()
    }
    assert lazy == {(1, 3, 1333), (2, 2, 1500)}


def test_md5_bigint_rejects_unsafe_salt(spark):
    """The salt is interpolated into a SQL fragment — a quote must be
    rejected up front, never reach the generated expression."""
    import pytest
    from deepseek_ocr_customvllm_spark.operators.curation import _md5_bigint

    _md5_bigint("text", "pack.v1:a-b|c_d")  # safe charset builds fine
    # trailing newline included: re.match + '$' would accept it
    for bad in ("it's", 'a"b', "a\\b", "a;b", "a b", "ok\n"):
        with pytest.raises(ValueError):
            _md5_bigint("text", bad)


class TestSequencePackRows:
    """Materialized packs (sequence_pack_rows): every emitted pack is
    exactly seq_len tokens, shards are gapless prefixes of the layout's
    concatenated stream, and the result is byte-stable across input
    partitionings."""

    def test_every_pack_exactly_seq_len_and_gapless(self, spark, docs):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            sequence_pack,
            sequence_pack_rows,
        )

        packs = sequence_pack_rows(docs, seq_len=64).collect()
        assert packs
        by_shard = {}
        for r in packs:
            assert r.n_tokens == 64
            assert len(r.text.split(" ")) == 64
            by_shard.setdefault(r.shard, []).append(r)
        # pack_ids per shard are 0..n-1 with no holes (gapless stream)
        for shard, rows in by_shard.items():
            ids = sorted(r.pack_id for r in rows)
            assert ids == list(range(len(ids)))
        # cross-check against the layout: the layout's total stream per
        # shard div seq_len = number of full packs emitted
        layout = sequence_pack(docs, seq_len=64).collect()
        per_shard_tokens = {}
        for r in layout:
            per_shard_tokens[r.shard] = (
                per_shard_tokens.get(r.shard, 0) + r.n_tokens
            )
        for shard, total in per_shard_tokens.items():
            assert len(by_shard.get(shard, [])) == total // 64

    def test_packs_are_the_concatenated_doc_stream(self, spark, docs):
        """Joining a shard's packs in pack_id order reproduces the
        concatenation of its documents in layout order, truncated to
        the last full pack — the pack writer invents and loses
        nothing."""
        from deepseek_ocr_customvllm_spark.operators.curation import (
            sequence_pack,
            sequence_pack_rows,
        )
        from deepseek_ocr_customvllm_spark.operators.textstats import (
            with_norm,
        )

        texts = {
            r.doc_id: r.t
            for r in with_norm(docs).select("doc_id", "t").collect()
        }
        layout = sorted(
            sequence_pack(docs, seq_len=64).collect(),
            key=lambda r: (r.shard, r.start_tok),
        )
        streams = {}
        for r in layout:
            streams.setdefault(r.shard, []).extend(
                texts[r.doc_id].split(" ")
            )
        packs = sequence_pack_rows(docs, seq_len=64).collect()
        by_shard = {}
        for r in packs:
            by_shard.setdefault(r.shard, {})[r.pack_id] = r.text
        for shard, stream in streams.items():
            got = " ".join(
                by_shard.get(shard, {})[i]
                for i in range(len(by_shard.get(shard, {})))
            )
            want = " ".join(stream[: (len(stream) // 64) * 64])
            assert got == want

    def test_drop_tail_false_keeps_partials(self, spark, docs):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            sequence_pack_rows,
        )

        full = sequence_pack_rows(docs, seq_len=64, drop_tail=False)
        partials = full.filter(F.col("n_tokens") != 64).collect()
        # at most one partial per shard, each strictly under seq_len
        shards = [r.shard for r in partials]
        assert len(shards) == len(set(shards))
        assert all(0 < r.n_tokens < 64 for r in partials)

    def test_byte_stable_across_parallelism(self, spark, docs):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            sequence_pack_rows,
        )

        a = sorted(
            map(tuple, sequence_pack_rows(docs.repartition(3), seq_len=64).collect())
        )
        b = sorted(
            map(tuple, sequence_pack_rows(docs.repartition(13), seq_len=64).collect())
        )
        assert a == b and len(a) > 0

    def test_write_packed_shards_layout(self, spark, docs, tmp_path):
        """The written layout is shard-partitioned parquet that reads
        back identical to the DataFrame."""
        from deepseek_ocr_customvllm_spark.operators.curation import (
            sequence_pack_rows,
            write_packed_shards,
        )

        packs = sequence_pack_rows(docs, seq_len=64)
        out = str(tmp_path / "packed")
        write_packed_shards(packs, out)
        import os

        part_dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
        assert part_dirs, "expected shard= partition directories"
        back = spark.read.parquet(out)
        a = sorted(
            map(tuple, back.select(*packs.columns).collect())
        )
        b = sorted(map(tuple, packs.collect()))
        assert a == b


class TestSubwordTokenizer:
    """The frozen greedy-merge subword scheme: known segmentations,
    truncation bound, empty docs, and the packing invariants re-proven
    under the subword budget."""

    def test_known_segmentations(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import (
            subword_token_counts,
        )

        # nation -> na|tion? greedy left-to-right: 'n' 'ation' = 2
        # ('ation' matches at pos 2); packing -> p|ac|k|ing
        cases = {
            1: ("nation", 2),          # n + ation
            2: ("ing", 1),             # exact piece
            3: ("xyz", 3),             # no pieces, char fallback
            4: ("", 0),                # empty doc
            5: ("the cat", 4),         # th|e + c|at
        }
        df = spark.createDataFrame(
            [(k, v[0]) for k, v in cases.items()],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.n_subword_tokens
            for r in subword_token_counts(df).collect()
        }
        # independent python greedy over the frozen vocab
        from deepseek_ocr_customvllm_spark.operators.textstats import (
            SUBWORD_VOCAB,
        )

        vocab = sorted(SUBWORD_VOCAB, key=lambda p: (-len(p), p))

        def seg(word):
            pos = n = 0
            word = word[:32]
            while pos < len(word):
                for p in vocab:
                    if word.startswith(p, pos):
                        pos += len(p)
                        break
                else:
                    pos += 1
                n += 1
            return n

        for k, (text, expected) in cases.items():
            want = sum(seg(w) for w in text.split()) if text else 0
            assert got[k] == want, (text, got[k], want)
            assert got[k] == expected, (text, got[k], expected)

    def test_truncation_bounds_recursion(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import (
            SUBWORD_MAX_WORD_CHARS,
            subword_token_counts,
        )

        long_word = "z" * 500  # no vocab piece contains z
        df = spark.createDataFrame(
            [(1, long_word)], "doc_id long, text string"
        )
        [r] = subword_token_counts(df).collect()
        assert r.n_subword_tokens == SUBWORD_MAX_WORD_CHARS

    def test_subword_counts_never_exceed_chars_nor_undershoot(
        self, spark, docs
    ):
        """Structural bounds: ws <= subword (a word is >= 1 piece) and
        subword <= normalized char count (a piece is >= 1 char)."""
        from deepseek_ocr_customvllm_spark.operators.textstats import (
            subword_token_counts, with_norm,
        )
        from pyspark.sql import functions as F

        out = subword_token_counts(docs).join(
            with_norm(docs).select("doc_id", F.length("t").alias("nc")),
            "doc_id",
        )
        bad = out.filter(
            (F.col("n_subword_tokens") < F.col("n_ws_tokens"))
            | (F.col("n_subword_tokens") > F.col("nc"))
        ).count()
        assert bad == 0

    def test_packing_invariants_hold_under_subword_budget(
        self, spark, docs
    ):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            sequence_pack,
        )

        rows = sequence_pack(docs, seq_len=64, tokenizer="subword").collect()
        assert rows
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r)
        for shard, rs in by_shard.items():
            rs.sort(key=lambda r: r.start_tok)
            pos = 0
            for r in rs:
                assert r.start_tok == pos, (shard, r)
                assert r.n_tokens > 0
                end0 = r.start_tok + r.n_tokens - 1
                assert r.pack_first == r.start_tok // 64
                assert r.pack_last == end0 // 64
                pos += r.n_tokens

    def test_subword_packing_is_parallelism_invariant(self, spark, docs):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            sequence_pack,
        )

        a = sorted(map(tuple, sequence_pack(
            docs.repartition(3), tokenizer="subword").collect()))
        b = sorted(map(tuple, sequence_pack(
            docs.repartition(11), tokenizer="subword").collect()))
        assert a == b and len(a) > 0

    def test_unknown_tokenizer_rejected(self, spark, docs):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            sequence_pack,
        )

        with pytest.raises(ValueError):
            sequence_pack(docs, tokenizer="bpe-gpt2")


class TestNbQualityClassifier:
    """GPT-3 Appendix-A NB quality filter — exact log2-space separation
    on a two-vocabulary corpus, and the sign convention at the boundary."""

    def _corpus(self, spark):
        from deepseek_ocr_customvllm_spark.operators import curation

        rows = []
        # 40 curated docs, vocabulary A
        for i in range(40):
            rows.append((i, " ".join(f"alpha{k}" for k in range(10)), "good"))
        # crawl: 5 A-like docs (should classify high DESPITE being
        # negative training examples) and 40 B docs (low)
        for i in range(40, 45):
            rows.append((i, " ".join(f"alpha{k}" for k in range(10)), "crawl"))
        for i in range(45, 85):
            rows.append((i, " ".join(f"beta{k}" for k in range(10)), "crawl"))
        docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        return curation.nb_quality_classifier(
            docs, positive_sources=("good",)
        ).collect()

    def test_separable_corpus_classifies_exactly(self, spark):
        out = self._corpus(spark)
        assert len(out) == 85
        got = {r["doc_id"]: r["quality"] for r in out}
        for i in range(45):
            assert got[i] == "high", i  # vocab A, incl. the crawl A-docs
        for i in range(45, 85):
            assert got[i] == "low", i  # vocab B
        # every scored doc counted its 10 tokens
        assert all(r["n_terms"] == 10 for r in out)

    def test_label_matches_score_sign(self, spark):
        for r in self._corpus(spark):
            assert (r["quality"] == "high") == (r["score"] >= 0)

    def test_empty_docs_yield_no_row(self, spark):
        from deepseek_ocr_customvllm_spark.operators import curation

        docs = spark.createDataFrame(
            [(1, "alpha beta.", "good"), (2, "   ", "crawl"), (3, "", "crawl")],
            ["doc_id", "text", "source"],
        )
        out = curation.nb_quality_classifier(docs, positive_sources=("good",))
        assert {r["doc_id"] for r in out.collect()} == {1}


class TestQualityClassifierEval:
    def test_planted_truth_metrics(self, spark):
        from deepseek_ocr_customvllm_spark.operators import curation

        # word-soup noise + the planted markers, same shape as the
        # registry derivation but built locally
        docs = spark.createDataFrame(
            [(i, " ".join(f"w{(i * 7 + k) % 50}" for k in range(30)))
             for i in range(200)],
            ["doc_id", "text"],
        )
        (r,) = curation.quality_classifier_eval(docs).collect()
        assert r["n_docs"] == 200
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == 200
        # the planted marker vocabulary is fully separable; the seed is
        # noisy (crawl side is half good docs) — recall must be perfect
        # and precision high
        assert r["recall_x10000"] == 10000
        assert r["precision_x10000"] >= 9500

    def test_rate_guards_on_degenerate_inputs(self, spark):
        from deepseek_ocr_customvllm_spark.operators import curation

        # empty-text docs still get the planted markers appended, so
        # they ARE scored; the genuinely degenerate case is an EMPTY
        # corpus — which must report explicit 0s (not NULLs / not an
        # error) in BOTH engines
        docs = spark.createDataFrame(
            [(1, ""), (2, "  ")], ["doc_id", "text"]
        )
        (r,) = curation.quality_classifier_eval(docs).collect()
        assert r["n_docs"] == 2  # markers make every doc scoreable
        empty = docs.filter("doc_id < 0")
        (r,) = curation.quality_classifier_eval(empty).collect()
        assert (r["n_docs"], r["tp"], r["precision_x10000"],
                r["recall_x10000"]) == (0, 0, 0, 0)


class TestLog2Fx:
    """The fixed-point log2 primitive: Python spec == DuckDB CTE chain,
    and both within 2^-8-ish of the true log2 (never overestimating)."""

    def test_python_vs_duckdb_vs_true(self):
        import math
        import random

        import duckdb

        import __spark_entry__ as em
        from deepseek_ocr_customvllm_spark.operators.curation import log2_fx_int

        vals = [1, 2, 3, 7, 1023, 1024, 1025, 1048575, 1048576,
                2097151, 2097152, (1 << 62) - 1]
        rng = random.Random(7)
        vals += [rng.randrange(1, 1 << 62) for _ in range(300)]
        con = duckdb.connect()
        con.execute("CREATE TABLE xs AS SELECT unnest(?::BIGINT[]) AS x", [vals])
        chain = em._log2fx_duck_ctes("xs", {"v": "x"}, keys="x")
        for x, lg in con.execute(f"WITH {chain} SELECT x, lg_v FROM wl9").fetchall():
            assert lg == log2_fx_int(x), x
            true = math.log2(x) * 256
            assert -1e-6 <= true - lg < 2, (x, lg, true)

    def test_rejects_nonpositive(self):
        import pytest as _pytest

        from deepseek_ocr_customvllm_spark.operators.curation import log2_fx_int

        with _pytest.raises(ValueError):
            log2_fx_int(0)


class TestOutputShardPlan:
    """Balanced writer layout: roll-policy byte bounds, contiguous file
    sequences, byte conservation, parallelism invariance."""

    def _corpus(self, spark, n=400, parts=4):
        rows = [(i, (i * 37) % 900 + 20) for i in range(n)]
        return spark.createDataFrame(
            rows, ["doc_id", "n_chars"]
        ).repartition(parts)

    def test_roll_policy_bounds_and_conservation(self, spark):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            output_shard_plan,
        )

        docs = self._corpus(spark)
        target = 4096
        plan = output_shard_plan(docs, target_bytes=target).collect()
        max_doc = max(r[1] for r in docs.collect())
        total = sum(r[1] for r in docs.collect())
        assert sum(r["file_bytes"] for r in plan) == total
        by_writer = {}
        for r in plan:
            by_writer.setdefault(r["writer"], []).append(r)
        for writer, files in by_writer.items():
            seqs = sorted(r["file_seq"] for r in files)
            assert seqs == list(range(len(seqs)))  # contiguous from 0
            last = max(seqs)
            for r in files:
                if r["file_seq"] != last:
                    # every boundary is within one document of nominal
                    assert target - max_doc < r["file_bytes"] < target + max_doc

    def test_parallelism_invariant(self, spark):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            output_shard_plan,
        )

        a = output_shard_plan(self._corpus(spark, parts=1)).collect()
        b = output_shard_plan(self._corpus(spark, parts=16)).collect()
        key = lambda r: (r["writer"], r["file_seq"])
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_single_exchange(self, spark):
        """The writer-keyed window and the final groupBy share one
        Exchange; routing adds no shuffle of its own."""
        from deepseek_ocr_customvllm_spark.operators.curation import (
            output_shard_plan,
        )

        rows = [(i, (i * 37) % 900 + 20) for i in range(50)]
        docs = spark.createDataFrame(rows, ["doc_id", "n_chars"])
        df = output_shard_plan(docs)
        plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert plan.count("Exchange (") == 1


class TestCurationFunnel:
    """Stage semantics of the survival funnel on a constructed corpus."""

    def _funnel(self, spark, rows):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            curation_funnel,
        )

        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        return {
            r["stage"]: (r["n_in"], r["n_kept"])
            for r in curation_funnel(df).collect()
        }

    def test_each_stage_drops_its_own_family(self, spark):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            FUNNEL_GOOD,
            FUNNEL_POISON,
        )

        rows = [
            (1, ""),  # dropped at nonempty
            (2, FUNNEL_GOOD),  # survives everything
            (3, FUNNEL_GOOD),  # exact twin: dropped at exact_dedup
            (4, "zzz qqq www rrr"),  # no stopwords: dropped at lang_en
            (5, FUNNEL_POISON),  # lang-pass, gopher-fail
        ]
        got = self._funnel(spark, rows)
        assert got["nonempty"] == (5, 4)
        assert got["lang_en"] == (4, 3)
        assert got["gopher_keep"] == (3, 2)
        assert got["exact_dedup"] == (2, 1)

    def test_min_doc_id_is_the_canonical(self, spark):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            FUNNEL_GOOD,
            curation_funnel,
        )

        df = spark.createDataFrame(
            [(9, FUNNEL_GOOD), (2, FUNNEL_GOOD), (5, FUNNEL_GOOD)],
            "doc_id bigint, text string",
        )
        got = {
            r["stage"]: r["n_kept"] for r in curation_funnel(df).collect()
        }
        assert got["exact_dedup"] == 1

    def test_funnel_is_monotone_on_real_corpus(self, spark, docs):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            curation_funnel,
            funnel_corpus,
        )

        rows = sorted(
            curation_funnel(funnel_corpus(docs)).collect(),
            key=lambda r: r["stage_idx"],
        )
        for prev, cur in zip(rows, rows[1:]):
            assert cur["n_in"] == prev["n_kept"]
        assert all(r["n_kept"] <= r["n_in"] for r in rows)
        # every stage discriminates on the probe corpus
        assert all(r["n_kept"] < r["n_in"] for r in rows[1:])


class TestSnapshotTermDrift:
    """TV drift between dumps: near-zero for identically distributed
    dumps, ~1e6 ppm for disjoint vocabularies."""

    def test_disjoint_vocab_maxes_out(self, spark):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            snapshot_term_drift,
        )

        # dump 0 (ids 0-9) speaks vocab A; dump 1 (ids 10-19) speaks
        # the same; dump 2 (ids 20-29) speaks disjoint vocab B
        rows = []
        for i in range(30):
            vocab = (
                "alpha beta gamma delta"
                if i < 20
                else "omega sigma theta kappa"
            )
            rows.append((i, vocab))
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            (r["dump_from"], r["dump_to"]): r["tv_ppm"]
            for r in snapshot_term_drift(df, dump_size=10).collect()
        }
        assert got[(0, 1)] == 0  # identical distributions
        assert got[(1, 2)] >= 990_000  # disjoint: TV ~ 1.0 (ppm quantized)

    def test_aggregate_only_downstream_plan(self, spark, docs):
        """Everything after the first groupBy runs on the tiny
        checkpointed (dump, bucket) aggregate — the corpus explode runs
        once, not once per consumer (there are four)."""
        from deepseek_ocr_customvllm_spark.operators.curation import (
            snapshot_term_drift,
        )

        out = snapshot_term_drift(docs)
        plan = out.sparkSession._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "Scan parquet" not in plan  # only checkpoint scans remain
        assert "Scan ExistingRDD" in plan

        lazy = snapshot_term_drift(docs, persist=False)
        lazy_plan = lazy.sparkSession._jvm.PythonSQLUtils.explainString(
            lazy._jdf.queryExecution(), "formatted"
        )
        assert lazy_plan.count("Scan parquet") >= 4  # why persist defaults on


class TestMixturePlan:
    """GPT-3-style mixture planning arithmetic."""

    def test_quota_and_repeat_semantics(self, spark):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            mixture_plan,
        )

        docs = spark.createDataFrame(
            # srcA: 100 tokens, srcB: 10 tokens, srcC excluded from mix
            [(1, " ".join(["w"] * 100), "srcA"),
             (2, " ".join(["w"] * 10), "srcB"),
             (3, "w w w", "srcC")],
            "doc_id bigint, text string, source string",
        )
        weights = spark.createDataFrame(
            [("srcA", 1), ("srcB", 3)], "source string, weight bigint"
        )
        got = {
            r["source"]: r
            for r in mixture_plan(docs, weights, budget_tokens=400).collect()
        }
        assert set(got) == {"srcA", "srcB"}  # srcC excluded
        # srcA: 400*1 div 4 = 100 targets over 100 tokens -> 1.0 epochs
        assert got["srcA"]["target_tokens"] == 100
        assert got["srcA"]["repeat_x1000"] == 1000
        # srcB: 400*3 div 4 = 300 targets over 10 tokens -> 30 epochs
        assert got["srcB"]["target_tokens"] == 300
        assert got["srcB"]["repeat_x1000"] == 30000

    def test_single_scan_broadcast_plan(self, spark, docs):
        from deepseek_ocr_customvllm_spark.operators.curation import (
            mixture_plan,
        )

        weights = docs.select("source").distinct().selectExpr(
            "source", "cast(1 as bigint) as weight"
        )
        out = mixture_plan(docs, weights)
        plan = out.sparkSession._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestEmbeddingDrift:
    """Representation-level drift: identical distributions score ~1e4,
    orthogonal shifts near 0."""

    def test_shifted_dump_detected(self, spark):
        from deepseek_ocr_customvllm_spark.operators.similarity import (
            embedding_drift,
        )

        rows = []
        # dumps 0 and 1: vectors clustered around +e0; dump 2: around +e1
        for i in range(30):
            base = [0.0] * 8
            if i < 20:
                base[0] = 2.0
            else:
                base[1] = 2.0
            base[i % 8] += 0.01 * (i % 5)  # small deterministic noise
            rows.append((i, base, 0))
        df = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        )
        got = {
            (r["dump_from"], r["dump_to"]): (r["dot_sign"], r["cos2_x10000"])
            for r in embedding_drift(df, dump_size=10).collect()
        }
        assert got[(0, 1)][0] == 1 and got[(0, 1)][1] > 9500  # same dist
        assert got[(1, 2)][1] < 2000  # orthogonal shift detected

    def test_single_scan_plan(self, spark):
        from deepseek_ocr_customvllm_spark.operators.similarity import (
            embedding_drift,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        out = embedding_drift(emb)
        plan = out.sparkSession._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "Scan parquet" not in plan  # checkpointed sums only
        assert "Scan ExistingRDD" in plan
