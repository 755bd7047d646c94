"""Unit tests for textstats operators added after round 6 (the earlier
families are covered in test_spark_pipeline.py and the oracle parity
suite)."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

class TestScriptProfile:
    """Codepoint-range script histogram + priority argmax."""

    def test_counts_and_dominant(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import (
            script_profile,
        )

        rows = [
            (1, "hello world"),
            (2, "привет мир"),
            (3, "漢字テスト"),
            (4, "mixed привет"),  # 5 latin vs 6 cyrillic
            (5, "...123..."),  # no script chars at all
            (6, "ab яю"),  # 2 vs 2: tie -> latin by priority
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {r["doc_id"]: r for r in script_profile(df).collect()}
        assert got[1]["dominant_script"] == "latin"
        assert got[1]["n_latin"] == 10
        assert got[2]["dominant_script"] == "cyrillic"
        assert got[3]["dominant_script"] == "cjk"
        assert got[3]["n_cjk"] == 5
        assert got[4]["dominant_script"] == "cyrillic"
        assert got[5]["dominant_script"] == "und"
        assert got[6]["dominant_script"] == "latin"

    def test_planted_corpus_flips_dominance(self, spark, docs):
        from deepseek_ocr_customvllm_spark.operators.textstats import (
            script_profile,
            scripted_corpus,
        )

        got = script_profile(scripted_corpus(docs)).collect()
        doms = {r["doc_id"]: r["dominant_script"] for r in got}
        # %9 docs carry the repeated CJK tail long enough to dominate
        assert all(v == "cjk" for k, v in doms.items() if k % 9 == 0)
        assert any(v == "latin" for v in doms.values())
        # %4 (non-%9) docs register cyrillic chars without dominance
        cyr = {r["doc_id"]: r["n_cyrillic"] for r in got}
        assert all(
            cyr[k] >= 10 for k in cyr if k % 4 == 0 and k % 9 != 0
        )


class TestBpeInduce:
    """Distributed BPE training semantics."""

    def test_hand_computed_merges(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import (
            bpe_induce,
        )

        # corpus: 'abab' x3, 'ab' x2, 'cc' x1
        rows = [(1, "abab abab abab ab ab cc")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        # round 1: pairs (a,b):3*2+2=8, (b,a):3, (c,c):1 -> merge 'ab'
        # round 2: pairs (ab,ab):3, (c,c):1 -> merge 'abab'
        got = {
            r["symbol"]: r["n_tokens"]
            for r in bpe_induce(df, n_merges=2).collect()
        }
        assert got == {"abab": 3, "ab": 2, "c": 2}

    def test_nonoverlapping_apply(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import (
            bpe_induce,
        )

        # 'aaa': pairs (a,a) count 2, merged left-to-right -> ['aa','a']
        df = spark.createDataFrame([(1, "aaa")], "doc_id bigint, text string")
        got = {
            r["symbol"]: r["n_tokens"]
            for r in bpe_induce(df, n_merges=1).collect()
        }
        assert got == {"aa": 1, "a": 1}

    def test_char_mass_is_conserved(self, spark, docs):
        from deepseek_ocr_customvllm_spark.operators.textstats import (
            bpe_induce,
            with_norm,
        )
        from pyspark.sql import functions as F

        before = (
            with_norm(docs)
            .filter(F.col("t") != "")
            .select(
                F.sum(
                    F.length(F.regexp_replace("t", " ", ""))
                ).alias("chars")
            )
            .collect()[0]["chars"]
        )
        rows = bpe_induce(docs, n_merges=4, top_n=10**6).collect()
        after = sum(len(r["symbol"]) * r["n_tokens"] for r in rows)
        assert after == before


def test_bpe_token_count_decreases_monotonically(spark, docs):
    """Each learned merge can only reduce (or at worst preserve) the
    corpus token count — the compression direction that makes BPE
    training meaningful."""
    from deepseek_ocr_customvllm_spark.operators.textstats import bpe_induce

    totals = []
    for k in (0, 2, 4):
        rows = bpe_induce(docs, n_merges=k, top_n=None).collect()
        totals.append(sum(r["n_tokens"] for r in rows))
    assert totals[0] > totals[1] > totals[2]
