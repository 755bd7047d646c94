"""Corpus-scrubbing operators: paragraph dedup, URL canonicalization,
PII redaction — edge cases and plan shape."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepseek_ocr_customvllm_spark.operators import scrub  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


class TestParagraphDedup:
    def test_frequent_paragraph_dropped_everywhere(self, spark):
        rows = [(i, f"banner\n\nbody {i}\n\nfooter") for i in range(8)]
        rows.append((100, "banner\n\nfooter"))  # all-boilerplate doc
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r["doc_id"]: r.asDict()
            for r in scrub.paragraph_dedup(docs, max_df=5).collect()
        }
        assert len(got) == 9  # the all-boilerplate doc SURVIVES as a row
        for i in range(8):
            assert got[i]["clean_text"] == f"body {i}"
            assert got[i]["n_kept"] == 1 and got[i]["n_dropped"] == 2
        assert got[100]["clean_text"] == "" and got[100]["n_kept"] == 0

    def test_order_preserved_and_threshold_respected(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha\n\nbeta\n\ngamma"), (2, "beta\n\ndelta")],
            ["doc_id", "text"],
        )
        # df(beta)=2 <= max_df=2: nothing is dropped, order intact
        got = {
            r["doc_id"]: r["clean_text"]
            for r in scrub.paragraph_dedup(docs, max_df=2).collect()
        }
        assert got == {1: "alpha\n\nbeta\n\ngamma", 2: "beta\n\ndelta"}

    def test_frequent_set_joins_as_broadcast(self, spark):
        """The membership test against the frequent set must be a
        broadcast join — shuffling the full paragraph table for it
        would be the 100 TB bottleneck.  (Round 8: a broadcast LEFT
        join + null-flag, so the kept/total counts and the reassembly
        fuse into one aggregation; previously a broadcast anti-join
        plus a second corpus-wide aggregate.)"""
        docs = spark.createDataFrame(
            [(i, f"banner\n\nbody {i}") for i in range(6)], ["doc_id", "text"]
        )
        plan = scrub.paragraph_dedup(docs, max_df=2)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftOuter" in plan


class TestCanonicalUrls:
    CASES = {
        # adjacent tracking params, tracking first: '?' must survive
        "https://www.a.com/p?utm_a=1&utm_b=2&id=3": "https://a.com/p?id=3",
        # tracking last
        "https://a.com/p?id=3&utm_c=x": "https://a.com/p?id=3",
        # only tracking: query gone entirely
        "https://a.com/p?utm_a=1": "https://a.com/p",
        # fragment + trailing slash; scheme+host lowercase, PATH CASE KEPT
        "HTTPS://WWW.A.COM/Path/?x=1#Frag": "https://a.com/Path?x=1",
        # no query at all
        "http://b.org/q/": "http://b.org/q",
        # fbclid/gclid, empty params
        "https://c.net/?fbclid=zz&&gclid=aa&k=v": "https://c.net?k=v",
        # a param whose NAME merely contains 'utm_' is kept
        "https://d.io/p?myutm_x=1": "https://d.io/p?myutm_x=1",
        # query VALUE case is significant and preserved
        "https://e.com/p?id=AbC": "https://e.com/p?id=AbC",
        # tracking params match case-insensitively
        "https://f.com/p?UTM_SOURCE=x&id=2": "https://f.com/p?id=2",
    }

    def test_cases(self, spark):
        rows = [(i, u) for i, u in enumerate(self.CASES)]
        df = spark.createDataFrame(rows, ["doc_id", "url"])
        got = {
            r["url"]: r["canonical_url"]
            for r in scrub.canonical_urls(df).collect()
        }
        for url, want in self.CASES.items():
            assert got[url] == want, url

    def test_url_duplicates_groups(self, spark):
        df = spark.createDataFrame(
            [
                (1, "https://a.com/p?utm_a=1"),
                (2, "https://www.a.com/p#top"),
                (3, "https://a.com/p/"),
                (4, "https://a.com/other"),
            ],
            ["doc_id", "url"],
        )
        got = scrub.url_duplicates(df).collect()
        assert len(got) == 1
        assert got[0]["canonical_url"] == "https://a.com/p"
        assert got[0]["n_dups"] == 3 and got[0]["keep_doc_id"] == 1


class TestPiiRedact:
    def test_email_and_phone(self, spark):
        df = spark.createDataFrame(
            [
                (1, "write a.b-c_d@mail.example.co or call 555-123-4567 now"),
                (2, "no pii here"),
                (3, "two mails x@y.org z@w.net and 111-222-3333 444-555-6666"),
            ],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r.asDict() for r in scrub.pii_redact(df).collect()}
        assert got[1]["redacted"] == "write <EMAIL> or call <PHONE> now"
        assert got[1]["n_emails"] == 1 and got[1]["n_phones"] == 1
        assert got[2]["redacted"] == "no pii here"
        assert got[2]["n_emails"] == 0 and got[2]["n_phones"] == 0
        assert got[3]["redacted"] == "two mails <EMAIL> <EMAIL> and <PHONE> <PHONE>"
        assert got[3]["n_emails"] == 2 and got[3]["n_phones"] == 2

    def test_mixed_case_email_redacted(self, spark):
        """PII scrubbing must be case-insensitive — a missed uppercase
        email is a silent PII leak (round-3 review finding)."""
        df = spark.createDataFrame(
            [(1, "mail John.Doe@Example.COM today")], ["doc_id", "text"]
        )
        r = scrub.pii_redact(df).collect()[0]
        assert r["redacted"] == "mail <EMAIL> today" and r["n_emails"] == 1

    def test_partial_numbers_not_redacted(self, spark):
        df = spark.createDataFrame(
            [(1, "order 12-345-6789 code 1234-567-8901 ok")], ["doc_id", "text"]
        )
        r = scrub.pii_redact(df).collect()[0]
        # \b boundaries: neither malformed number matches
        assert r["n_phones"] == 0 and "<PHONE>" not in r["redacted"]


class TestGopherQuality:
    def test_signals_and_thresholds(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import gopher_quality

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over lazy dogs tonight"),
                (2, ""),  # empty: zero words, ratios 0
                (3, "- a\n- b\n- c"),  # all bullet lines
                (4, "dup\ndup\ndup\nuniq"),  # 2/4 duplicate lines
                (5, "### ### ### ### word"),  # symbol-heavy
            ],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: r.asDict() for r in gopher_quality(docs).collect()}
        assert got[1]["keep"] is True
        assert got[2]["n_words"] == 0 and got[2]["keep"] is False
        assert got[3]["bullet_line_ratio"] == 1.0 and got[3]["keep"] is False
        assert got[4]["dup_line_ratio"] == 0.5 and got[4]["keep"] is False
        assert got[5]["symbol_word_ratio"] > 0.1 and got[5]["keep"] is False


class TestTfidfTopTerms:
    def test_distinctive_terms_rank_first(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import tfidf_top_terms

        docs = spark.createDataFrame(
            [
                (1, "alpha alpha shared", "s1"),
                (2, "beta shared shared", "s2"),
                (3, "gamma shared", "s3"),
            ],
            ["doc_id", "text", "source"],
        )
        got = {
            (r["source"], r["rank"]): r["term"]
            for r in tfidf_top_terms(docs, k=2).collect()
        }
        # per-source unique terms beat the corpus-wide 'shared'
        assert got[("s1", 1)] == "alpha"
        assert got[("s2", 1)] == "beta"
        assert got[("s3", 1)] == "gamma"
        assert got[("s1", 2)] == got[("s2", 2)] == got[("s3", 2)] == "shared"


class TestChunkDocuments:
    def test_windows_overlap_and_tail(self, spark):
        docs = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(25))), (2, "a b"), (3, "")],
            ["doc_id", "text"],
        )
        got = {
            (r["doc_id"], r["chunk_idx"]): r.asDict()
            for r in scrub.chunk_documents(docs, chunk_tokens=10, overlap=2).collect()
        }
        # 25 tokens, step 8: windows at 0/8/16; the tail keeps 9 tokens
        assert got[(1, 0)]["chunk_text"].startswith("w0 ")
        assert got[(1, 1)]["chunk_text"].startswith("w8 ")  # 2-token overlap
        assert got[(1, 2)]["n_tokens"] == 9
        assert got[(2, 0)]["chunk_text"] == "a b"  # tiny doc: one chunk
        assert not any(d == 3 for d, _ in got)  # empty doc: no chunks

    def test_doc_at_most_overlap_tokens_yields_one_chunk(self, spark):
        """len(tokens) <= overlap is the div-vs-floor trap between Spark
        and the oracle — the clamp must make both emit exactly one chunk."""
        docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        got = scrub.chunk_documents(docs, chunk_tokens=10, overlap=4).collect()
        assert len(got) == 1 and got[0]["n_tokens"] == 3

    def test_validation(self, spark):
        docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            scrub.chunk_documents(docs, chunk_tokens=10, overlap=10)


class TestThirdReviewRegressions:
    def test_embedded_url_in_path_untouched(self, spark):
        """Only the scheme://host prefix is www-stripped/lowercased —
        an embedded URL in the PATH is byte-significant content."""
        df = spark.createDataFrame(
            [(1, "https://www.a.com/redirect/https://www.B.com/X?id=1")],
            ["doc_id", "url"],
        )
        got = scrub.canonical_urls(df).collect()[0]["canonical_url"]
        assert got == "https://a.com/redirect/https://www.B.com/X?id=1"


class TestChunkModel:
    def test_chunking_matches_python_model(self, spark):
        """Random token counts and window params: the Spark array
        expressions must agree with a 10-line Python model (windows every
        step, tail kept, >=1 chunk per non-empty doc)."""
        import random

        rng = random.Random(42)
        cases = []
        for doc_id in range(40):
            n = rng.randint(1, 120)
            cases.append((doc_id, " ".join(f"t{doc_id}x{i}" for i in range(n))))
        docs = spark.createDataFrame(cases, ["doc_id", "text"])

        for chunk_tokens, overlap in [(10, 2), (7, 0), (40, 8), (5, 4)]:
            step = chunk_tokens - overlap
            expected = {}
            for doc_id, text in cases:
                ts = text.split(" ")
                n_chunks = max(-(-(len(ts) - overlap) // step), 1)
                for ci in range(n_chunks):
                    toks = ts[ci * step : ci * step + chunk_tokens]
                    expected[(doc_id, ci)] = (" ".join(toks), len(toks))
            got = {
                (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
                for r in scrub.chunk_documents(
                    docs, chunk_tokens=chunk_tokens, overlap=overlap
                ).collect()
            }
            assert got == expected, (chunk_tokens, overlap)


class TestC4LineFilter:
    """C4 §2.2 rules over an explicit (doc_id, j, line) frame — each
    defect class pinned independently of the lined_corpus derivation."""

    def _lines(self, spark, rows):
        return spark.createDataFrame(rows, ["doc_id", "j", "line"])

    GOOD = "alpha beta gamma delta epsilon zeta."

    def test_line_rules(self, spark):
        lines = self._lines(spark, [
            (1, 0, self.GOOD),
            (1, 1, "no terminal punctuation here at all"),   # dropped
            (1, 2, "too short."),                            # dropped
            (1, 3, "please enable JavaScript to view this."),  # dropped
            (1, 4, 'he said "quoted line of six words?"'),   # kept: ends "
            (1, 5, self.GOOD),
        ])
        out = scrub.c4_line_filter(lines).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["n_lines"], r["n_kept"]) == (6, 3)
        assert r["clean_text"].split("\n") == [
            self.GOOD, 'he said "quoted line of six words?"', self.GOOD,
        ]

    def test_page_poison_kills_kept_lines_too(self, spark):
        # The poison line ITSELF passes every line rule — the page dies
        # anyway, which is exactly C4's page-level contract.
        lines = self._lines(spark, [
            (1, 0, self.GOOD), (1, 1, self.GOOD), (1, 2, self.GOOD),
            (1, 3, "lorem ipsum dolor sit amet consectetur."),
            (2, 0, self.GOOD), (2, 1, self.GOOD), (2, 2, self.GOOD),
            (2, 3, "int main() { return 0; }"),
            (3, 0, self.GOOD), (3, 1, self.GOOD), (3, 2, self.GOOD),
        ])
        kept = {r["doc_id"] for r in scrub.c4_line_filter(lines).collect()}
        assert kept == {3}

    def test_min_kept_floor(self, spark):
        lines = self._lines(
            spark, [(1, j, self.GOOD) for j in range(3)]
            + [(2, j, self.GOOD) for j in range(2)]
        )
        kept = {r["doc_id"] for r in scrub.c4_line_filter(lines).collect()}
        assert kept == {1}

    def test_reassembly_is_in_line_order(self, spark):
        lines = self._lines(spark, [
            (1, 9, "ninth line of the document here."),
            (1, 0, "zeroth line of the document here."),
            (1, 5, "fifth line of the document here."),
        ])
        (r,) = scrub.c4_line_filter(lines).collect()
        assert r["clean_text"].startswith("zeroth")
        assert r["clean_text"].split("\n")[1].startswith("fifth")

    def test_single_exchange(self, spark):
        docs = spark.createDataFrame(
            [(1, "one two three four five six seven eight nine ten")],
            ["doc_id", "text"],
        )
        df = scrub.c4_line_filter(scrub.lined_corpus(docs))
        plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert plan.count("Exchange (") == 1  # the groupBy; explode is narrow

    def test_lined_corpus_matches_python_model(self, spark):
        docs = spark.createDataFrame(
            [(i, " ".join(f"w{i}x{k}" for k in range(i % 30 + 1)))
             for i in range(0, 200, 7)],
            ["doc_id", "text"],
        )
        got = {
            (r["doc_id"], r["j"]): r["line"]
            for r in scrub.lined_corpus(docs).collect()
        }
        expect = {}
        for i in range(0, 200, 7):
            ws = [f"w{i}x{k}" for k in range(i % 30 + 1)]
            for j in range((len(ws) + 7) // 8):
                if i % 97 == 0 and j == 0:
                    line = "lorem ipsum dolor sit amet consectetur adipiscing elit."
                elif i % 89 == 0 and j == 1:
                    line = "function init() { return window.state; }"
                else:
                    k = 3 if (i * 7 + j * 13) % 7 == 0 else 8
                    line = " ".join(ws[j * 8 : j * 8 + k])
                    if (i * 11 + j * 5) % 11 == 0:
                        line = "javascript " + line
                    if (i * 131 + j * 29) % 4 != 0:
                        line += "."
                expect[(i, j)] = line
        assert got == expect


class TestDomainBlocklist:
    def _report(self, spark, hosts, rules):
        df = spark.createDataFrame(
            list(enumerate(hosts)), ["doc_id", "host"]
        )
        return {
            r["host"]: r["blocked_by"]
            for r in scrub.domain_blocklist_report(df, rules).collect()
        }

    def test_rule_blocks_host_and_all_subdomains(self, spark):
        got = self._report(
            spark,
            ["example.com", "a.example.com", "a.b.example.com",
             "examples.com", "com.example.org", "notexample.com"],
            ["example.com"],
        )
        assert got["example.com"] == "example.com"
        assert got["a.example.com"] == "example.com"
        assert got["a.b.example.com"] == "example.com"
        # suffix means LABEL suffix: no substring false positives
        assert got["examples.com"] is None
        assert got["notexample.com"] is None
        assert got["com.example.org"] is None

    def test_most_specific_rule_wins(self, spark):
        got = self._report(
            spark,
            ["x.ads.example.com"],
            ["example.com", "ads.example.com", "com"],
        )
        assert got["x.ads.example.com"] == "ads.example.com"

    def test_subdomain_only_rule_keeps_siblings(self, spark):
        got = self._report(
            spark,
            ["bad.site.org", "good.site.org", "site.org"],
            ["bad.site.org"],
        )
        assert got["bad.site.org"] == "bad.site.org"
        assert got["good.site.org"] is None
        assert got["site.org"] is None

    def test_empty_blocklist_keeps_everything(self, spark):
        got = self._report(spark, ["a.example.com", "b.org"], [])
        assert got == {"a.example.com": None, "b.org": None}

    def test_rule_list_is_broadcast(self, spark):
        df = spark.createDataFrame([(1, "a.example.com")], ["doc_id", "host"])
        out = scrub.domain_blocklist_report(df, ["example.com"])
        plan = out.sparkSession._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "BroadcastHashJoin" in plan


class TestUnicodeNormalize:
    """ftfy-style hygiene pass: NFC composes decomposed text, leaves
    composed text alone, flags CP1252 double-encoding artifacts."""

    def test_planted_tails(self, spark):
        from deepseek_ocr_customvllm_spark.operators.scrub import (
            MOJI_TAIL,
            NFC_TAIL,
            NFD_TAIL,
            accented_corpus,
            unicode_normalize,
        )

        # doc 35: %5 and %7 -> NFD + mojibake; doc 55: %5 and %11;
        # doc 77: %7 and %11; doc 1: plain ascii
        rows = [(1, "plain"), (35, "a"), (55, "b"), (77, "c")]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r["doc_id"]: r
            for r in unicode_normalize(accented_corpus(docs)).collect()
        }
        assert got[1]["nfc_changed"] is False
        assert got[1]["mojibake_suspect"] is False
        assert got[1]["text_nfc"] == "plain"
        # NFD tail composes: 'cafe' + U+0301 -> 'café'
        assert got[35]["nfc_changed"] is True
        assert got[35]["text_nfc"].endswith("café" + MOJI_TAIL)
        assert got[35]["mojibake_suspect"] is True
        # NFC tail alone: byte-stable, not suspect
        assert got[55]["nfc_changed"] is True  # has the %5 NFD tail too
        assert got[77]["nfc_changed"] is False  # NFC + moji tails only
        assert got[77]["mojibake_suspect"] is True
        assert got[77]["text_nfc"] == "c" + NFC_TAIL + MOJI_TAIL

    def test_idempotent_and_null_safe(self, spark):
        from deepseek_ocr_customvllm_spark.operators.scrub import (
            unicode_normalize,
        )

        rows = [(1, "café nfd"), (2, None)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        once = unicode_normalize(docs)
        got = {r["doc_id"]: r for r in once.collect()}
        assert got[1]["text_nfc"] == "café nfd"
        assert got[2]["text_nfc"] is None
        twice = unicode_normalize(
            once.select("doc_id", once["text_nfc"].alias("text"))
        ).collect()
        assert all(r["nfc_changed"] is False for r in twice if r["doc_id"] == 1)
