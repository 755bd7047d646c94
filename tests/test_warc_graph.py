"""WARC source round-trip + host-graph PageRank.

WARC is the shape Common Crawl corpora actually arrive in (ISO 28500);
the round-trip tests pin that encode → shard → parse is byte-lossless,
deterministic at any parallelism, and per-record isolated on malformed
shards.  PageRank tests pin the integer-exact arithmetic against a pure
Python model, rank-mass conservation, parallelism-independence, the
broadcast plan shape, and the bounded-storage contract of the
round-checkpointer.
"""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from deepseek_ocr_customvllm_spark.operators import graph
from deepseek_ocr_customvllm_spark.sources import warc
from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df


@pytest.fixture(scope="module")
def spark():
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _docs_df(spark, n=24):
    rows = [
        Row(
            doc_id=i,
            text=f"tok{i % 5} tok{(i * 3) % 7} body {i}",
            lang="en",
            source=f"src{i % 3}",
            n_chars=20,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


# ---------------------------------------------------------------------------
# WARC
# ---------------------------------------------------------------------------


class TestWarcRoundtrip:
    def test_roundtrip_is_byte_lossless(self, spark):
        pages = synth_pages_df(spark, 40, num_partitions=3)
        orig = {
            r["url"]: (r["warc_ts"], bytes(r["html"]))
            for r in pages.collect()
        }
        parsed = warc.parse_warc(warc.warc_chunks(pages, n_chunks=5))
        got = {
            r["url"]: (r["warc_ts"], bytes(r["html"]))
            for r in parsed.collect()
        }
        assert got == orig

    def test_chunks_deterministic_across_parallelism(self, spark):
        pages = synth_pages_df(spark, 30, num_partitions=2)

        def blobs(df):
            return {
                r["chunk_id"]: bytes(r["data"])
                for r in warc.warc_chunks(df, n_chunks=4).collect()
            }

        assert blobs(pages.repartition(1)) == blobs(pages.repartition(7))

    def test_payload_containing_record_delimiters(self, spark):
        # Length-framing must survive payloads that contain the header
        # terminator AND a fake version line.
        evil = b"<html>\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\n</html>"
        pages = spark.createDataFrame(
            [("https://docs.test/x/1", dt.datetime(2025, 1, 1), evil, "t", "en")],
            schema="url string, warc_ts timestamp, html binary, text string, lang string",
        )
        out = warc.parse_warc(warc.warc_chunks(pages, n_chunks=1)).collect()
        assert len(out) == 1 and bytes(out[0]["html"]) == evil

    def test_malformed_record_keeps_prior_records(self):
        ts = dt.datetime(2025, 1, 1, 0, 0, 0)

        def rec(url, body):
            return (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: 2025-01-01T00:00:00Z\r\n"
                f"Content-Type: text/html\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body + b"\r\n\r\n"

        good = rec("u1", b"aaa") + rec("u2", b"bbbb")
        # Torn tail: header claims more bytes than remain.
        torn = good + rec("u3", b"c" * 10)[:-8]
        out = warc.parse_warc_blob(torn)
        assert [(u, t) for u, t, _ in out] == [("u1", ts), ("u2", ts)]
        assert [bytes(h) for _, _, h in out] == [b"aaa", b"bbbb"]
        # Garbage before/between records: the parser resynchronizes on
        # the next WARC/1.0 marker — one bad span costs itself, not the
        # records after it.
        recovered = warc.parse_warc_blob(b"junk" + good)
        assert [(u, t) for u, t, _ in recovered] == [("u1", ts), ("u2", ts)]
        mid = rec("u1", b"aaa") + b"WARC/1.0\r\nbroken\r\n\r\n" + rec(
            "u2", b"bbbb"
        )
        recovered_mid = warc.parse_warc_blob(mid)
        assert [u for u, _, _ in recovered_mid] == ["u1", "u2"]
        assert warc.parse_warc_blob(b"") == []
        # Negative Content-Length: the terminator check would pass
        # vacuously on the header's own CRLFCRLF — must never emit a
        # phantom empty record; resync then recovers the good records.
        neg = (
            b"WARC/1.0\r\nWARC-Target-URI: u9\r\n"
            b"WARC-Date: 2025-01-01T00:00:00Z\r\n"
            b"Content-Length: -4\r\n\r\n" + good
        )
        assert [u for u, _, _ in warc.parse_warc_blob(neg)] == ["u1", "u2"]

    def test_crlf_in_url_cannot_corrupt_framing(self, spark):
        # ADVICE r6 (medium): an untrusted crawl url carrying raw
        # CR/LF would otherwise truncate the CRLF-delimited header
        # before Content-Length and poison the blob after it.  The
        # encoder percent-escapes exactly the two control bytes; every
        # record in the shard parses, and the poisoned row comes back
        # under its escaped url.
        evil = "https://docs.test/x/1?a=1\r\n\r\nWARC-Injected: yes"
        rows = [
            (evil, dt.datetime(2025, 1, 1), b"<html>evil</html>"),
            # sorts AFTER the evil url in-blob: the row the old abort
            # behavior silently dropped
            ("https://zzz.test/ok", dt.datetime(2025, 1, 1), b"<html>ok</html>"),
        ]
        pages = spark.createDataFrame(
            rows, schema="url string, warc_ts timestamp, html binary"
        )
        out = warc.parse_warc(warc.warc_chunks(pages, n_chunks=1)).collect()
        got = {r["url"]: bytes(r["html"]) for r in out}
        assert got == {
            "https://docs.test/x/1?a=1%0D%0A%0D%0AWARC-Injected: yes":
                b"<html>evil</html>",
            "https://zzz.test/ok": b"<html>ok</html>",
        }
        # a url with legitimate %XX escapes is NOT double-escaped
        pct = "https://docs.test/p?q=a%20b%0D"
        pages2 = spark.createDataFrame(
            [(pct, dt.datetime(2025, 1, 1), b"x")],
            schema="url string, warc_ts timestamp, html binary",
        )
        out2 = warc.parse_warc(warc.warc_chunks(pages2, n_chunks=1)).collect()
        assert out2[0]["url"] == pct

    def test_string_html_column_frames_by_bytes(self, spark):
        # A STRING html column with non-ASCII chars: Content-Length must
        # be the UTF-8 byte count, not the char count, or the parse
        # slices short and drops everything after.
        text = "café © 2025 中文"
        pages = spark.createDataFrame(
            [("https://docs.test/s/1", dt.datetime(2025, 1, 1), text)],
            schema="url string, warc_ts timestamp, html string",
        )
        out = warc.parse_warc(warc.warc_chunks(pages, n_chunks=1)).collect()
        assert len(out) == 1 and bytes(out[0]["html"]) == text.encode("utf-8")

    def test_extraction_through_warc_equals_direct(self, spark):
        """The capstone contract: running the fused extractor on pages
        recovered from WARC shards is row-identical to running it on the
        pages table directly — shard/parse adds nothing and loses
        nothing the extractor can see."""
        from deepseek_ocr_customvllm_spark.operators.extract import extract_pages

        pages = synth_pages_df(spark, 30, num_partitions=3)
        cols = ["url", "content_type", "status", "n_pages", "n_blocks", "n_chars"]

        def rows(df):
            return sorted(
                tuple(r[c] for c in cols)
                for r in extract_pages(df, num_partitions=4).select(*cols).collect()
            )

        direct = rows(pages)
        via_warc = rows(warc.parse_warc(warc.warc_chunks(pages, n_chunks=5)))
        assert via_warc == direct and len(direct) == 30

    def test_duplicate_url_recrawls_are_deterministic(self, spark):
        # Two records with the SAME url but different payloads (a
        # re-crawl): blob bytes must not depend on shuffle arrival
        # order — the sort tie-breaks on the record bytes.
        rows = [
            ("https://docs.test/x/1", dt.datetime(2025, 1, 1), b"<old>", "t", "en"),
            ("https://docs.test/x/1", dt.datetime(2025, 1, 2), b"<new>", "t", "en"),
        ]
        schema = "url string, warc_ts timestamp, html binary, text string, lang string"

        def blob(order):
            df = spark.createDataFrame([rows[i] for i in order], schema)
            (r,) = warc.warc_chunks(df.repartition(2), n_chunks=1).collect()
            return bytes(r["data"])

        a, b = blob([0, 1]), blob([1, 0])
        assert a == b
        parsed = warc.parse_warc_blob(a)
        assert sorted(bytes(h) for _, _, h in parsed) == [b"<new>", b"<old>"]

    def test_in_blob_order_is_sorted_by_url(self, spark):
        pages = synth_pages_df(spark, 20, num_partitions=3)
        blob_urls = []
        for r in warc.warc_chunks(pages, n_chunks=1).collect():
            blob_urls = [u for u, _, _ in warc.parse_warc_blob(bytes(r["data"]))]
        assert blob_urls == sorted(blob_urls) and len(blob_urls) == 20


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _python_pagerank(doc_ids, n_hosts, iters):
    """Driver-side model of graph.host_pagerank's exact arithmetic."""
    edges = [(d % n_hosts, (d * 31 + 7) % n_hosts) for d in doc_ids] + [
        (d % n_hosts, d % 7) for d in doc_ids
    ]
    hosts = sorted({s for s, _ in edges} | {t for _, t in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(hosts)
    rank = {h: graph.SCALE // n for h in hosts}
    base = (15 * graph.SCALE) // (100 * n)
    for _ in range(iters):
        s = {h: 0 for h in hosts}
        for a, b in edges:
            s[b] += rank[a] // outdeg[a]
        rank = {h: base + (85 * s[h]) // 100 for h in hosts}
    return {f"h{h}": rank[h] for h in hosts}


class TestHostPagerank:
    def test_matches_pure_python_model(self, spark):
        docs = _docs_df(spark, 30)
        got = {
            r["host"]: r["rank"]
            for r in graph.host_pagerank(docs, n_hosts=11, iters=3).collect()
        }
        assert got == _python_pagerank(range(30), 11, 3)

    def test_rank_mass_is_conserved_up_to_truncation(self, spark):
        docs = _docs_df(spark, 40)
        ranks = [r["rank"] for r in graph.host_pagerank(docs).collect()]
        # Truncating division only loses mass; teleport term restores
        # most of it.  Dangling hub hosts (no out-edges) may also leak.
        assert 0 < sum(ranks) <= graph.SCALE
        assert all(r > 0 for r in ranks)

    def test_hub_hosts_outrank_the_rest(self, spark):
        # Half of all links point at hosts 0-6: PageRank must see it.
        got = {
            r["host"]: r["rank"]
            for r in graph.host_pagerank(_docs_df(spark, 40)).collect()
        }
        hubs = [v for k, v in got.items() if int(k[1:]) < 7]
        rest = [v for k, v in got.items() if int(k[1:]) >= 7]
        # On a small corpus one affine target can edge out the weakest
        # hub, so the claim is aggregate: hubs dominate on average and
        # the single top-ranked host is a hub.
        assert max(got.values()) in hubs
        assert sum(hubs) / len(hubs) > 2 * (sum(rest) / len(rest))

    def test_deterministic_across_parallelism(self, spark):
        docs = _docs_df(spark, 30)

        def run(df):
            return sorted(
                (r["host"], r["rank"]) for r in graph.host_pagerank(df).collect()
            )

        assert run(docs.repartition(1)) == run(docs.repartition(6))

    def test_rank_join_is_broadcast(self, spark):
        df = graph.host_pagerank(_docs_df(spark, 20), iters=1, checkpoint=False)
        plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_empty_corpus_returns_empty_frame(self, spark):
        empty = _docs_df(spark, 1).filter(F.col("doc_id") < 0)
        out = graph.host_pagerank(empty)
        assert out.collect() == []
        assert [f.name for f in out.schema.fields] == ["host", "rank"]

    def test_checkpointer_rejects_unrotated_second_round(self, spark):
        from deepseek_ocr_customvllm_spark.plans.iterate import RoundCheckpointer

        df = _docs_df(spark, 4)
        ck = RoundCheckpointer(df)
        a = ck.ckpt(df.select("doc_id"), free_previous=False)
        with pytest.raises(RuntimeError, match="rotate"):
            ck.ckpt(df.select("doc_id"), free_previous=False)
        assert a.count() == 4  # the first round itself is fine
        ck.free()  # releases live AND the un-rotated pending round
        assert ck._live == [] and ck._pending == []

    def test_checkpoint_storage_is_bounded_in_iters(self, spark):
        sc = spark.sparkContext

        def n_persistent():
            return len(sc._jsc.getPersistentRDDs().keySet().toArray())

        docs = _docs_df(spark, 20)
        before = n_persistent()
        graph.host_pagerank(docs, iters=2).collect()
        delta2 = n_persistent() - before
        before = n_persistent()
        graph.host_pagerank(docs, iters=8).collect()
        delta8 = n_persistent() - before
        # Each call may leave its FINAL round's blocks live (they back
        # the returned frame), but storage must not grow with iters:
        # intermediate rounds and the pinned w/hosts frames are freed.
        assert delta8 <= delta2


class TestWarcStreamingExtraction:
    """WARC shards landing as files → streaming extraction under the
    content-keyed exactly-once ledger (binaryFile source)."""

    @staticmethod
    def _write_shards(tmp_path, chunks_df, suffix=""):
        (tmp_path / "landing").mkdir(exist_ok=True)
        for r in chunks_df.collect():
            p = tmp_path / "landing" / f"shard{suffix}-{r['chunk_id']}.warc"
            p.write_bytes(bytes(r["data"]))

    def test_drain_replay_and_new_shard(self, spark, tmp_path):
        import shutil

        from deepseek_ocr_customvllm_spark.plans.state import ParquetStateStore
        from deepseek_ocr_customvllm_spark.streaming.extract_stream import (
            run_warc_stream_with_state,
        )

        args = (
            str(tmp_path / "landing"),
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
            str(tmp_path / "state"),
        )
        pages = synth_pages_df(spark, 30, num_partitions=2)
        self._write_shards(tmp_path, warc.warc_chunks(pages, n_chunks=3))
        assert run_warc_stream_with_state(spark, *args) == 30
        store = ParquetStateStore(spark, args[3])
        state = store.read().collect()
        assert len(state) == 30
        assert all(r["attempt"] == 1 for r in state)  # exactly once

        # checkpoint loss: full source replay, content keys skip all
        shutil.rmtree(str(tmp_path / "ckpt"))
        assert run_warc_stream_with_state(spark, *args) == 30  # NOT 60
        assert all(r["attempt"] == 1 for r in store.read().collect())

        # a NEW shard (different bytes) extracts; old shards still skip
        extra = synth_pages_df(spark, 40, num_partitions=1).join(
            pages.select("url"), "url", "left_anti"
        )
        self._write_shards(tmp_path, warc.warc_chunks(extra, n_chunks=1), "-new")
        assert run_warc_stream_with_state(spark, *args) == 40
        state = store.read().collect()
        assert len(state) == 40
        assert all(r["attempt"] == 1 for r in state)


class TestOutlinkExtraction:
    """WAT-path link extraction: JVM regex over the binary html column."""

    def _pages(self, spark, rows):
        return spark.createDataFrame(
            [(u, dt.datetime(2025, 1, 1), h, None, "en") for u, h in rows],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )

    def test_extracts_hrefs_both_quote_styles(self, spark):
        html = (
            b"<html><body>"
            b'<a href="/about">About</a>'
            b"<a href='/contact'>Contact Us</a>"
            b'<a class="x" href="/blog">Blog</a>'
            b"</body></html>"
        )
        out = graph.page_outlinks(
            self._pages(spark, [("https://ex-1.test/doc/1", html)])
        ).collect()
        got = {(r["href"], r["anchor"]) for r in out}
        assert got == {
            ("/about", "About"),
            ("/contact", "Contact Us"),
            ("/blog", "Blog"),
        }
        assert all(r["host"] == "ex-1.test" for r in out)

    def test_non_html_and_torn_pages_skipped(self, spark):
        rows = [
            ("https://a.test/1", b"%PDF-1.4 fake"),
            ("https://a.test/2", b""),
            ("https://a.test/3", b"<html><body><p>torn <div><span"),
        ]
        assert graph.page_outlinks(self._pages(spark, rows)).count() == 0

    def test_summary_counts_distinct_hosts_and_pages(self, spark):
        html = b'<html><body><a href="/t">x</a><a href="/t">y</a></body></html>'
        rows = [
            ("https://h1.test/1", html),
            ("https://h1.test/2", html),
            ("https://h2.test/1", html),
        ]
        got = graph.outlink_summary(self._pages(spark, rows)).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["href"], r["n_links"], r["n_hosts"], r["n_pages"]) == (
            "/t",
            6,
            2,
            3,
        )
        assert r["sample_anchor"] == "x"

    def test_map_only_extraction_plan(self, spark):
        """page_outlinks must be shuffle-free (pure map work at 10^12)."""
        pages = synth_pages_df(spark, 12)
        plan = pages.sparkSession._jvm.PythonSQLUtils.explainString(
            graph.page_outlinks(pages)._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan


class TestClusterSizeReport:
    def test_histogram_counts(self, spark):
        from deepseek_ocr_customvllm_spark.operators.dedup import (
            cluster_size_report,
        )

        comp = spark.createDataFrame(
            # cluster 1: 3 docs, clusters 2+3: 2 docs each
            [(10, 1), (11, 1), (12, 1), (20, 2), (21, 2), (30, 3), (31, 3)],
            "doc_id bigint, component_id bigint",
        )
        got = {
            r["cluster_size"]: (r["n_clusters"], r["n_docs"])
            for r in cluster_size_report(comp).collect()
        }
        assert got == {3: (1, 3), 2: (2, 4)}


class TestOutlinkPagerank:
    """PageRank over REAL extracted links (the WAT → webgraph path)."""

    def _pages(self, spark, rows):
        return spark.createDataFrame(
            [(u, dt.datetime(2025, 1, 1), h, None, "en") for u, h in rows],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )

    def _corpus(self, spark):
        # a.test and b.test both point at hub.test (absolute links);
        # b.test also links relatively (self-host edge); hub links to a.
        mk = lambda links: (
            "<html><body>" + "".join(links) + "</body></html>"
        ).encode()
        rows = [
            ("https://a.test/1", mk(['<a href="https://hub.test/x">hub</a>'])),
            ("https://b.test/1", mk([
                '<a href="https://hub.test/y">hub</a>',
                '<a href="/local">self</a>',
            ])),
            ("https://hub.test/1", mk(['<a href="https://a.test/z">a</a>'])),
        ]
        return self._pages(spark, rows)

    def test_absolute_and_relative_edges(self, spark):
        got = sorted(
            (r["src"], r["dst"])
            for r in graph.outlink_host_edges(self._corpus(spark)).collect()
        )
        assert got == [
            ("a.test", "hub.test"),
            ("b.test", "b.test"),
            ("b.test", "hub.test"),
            ("hub.test", "a.test"),
        ]

    def test_matches_python_model(self, spark):
        from deepseek_ocr_customvllm_spark.operators.graph import SCALE

        edges = [
            ("a.test", "hub.test"),
            ("b.test", "b.test"),
            ("b.test", "hub.test"),
            ("hub.test", "a.test"),
        ]
        hosts = sorted({h for e in edges for h in e})
        n = len(hosts)
        outdeg = {}
        for s, _ in edges:
            outdeg[s] = outdeg.get(s, 0) + 1
        ranks = {h: SCALE // n for h in hosts}
        for _ in range(3):
            contrib = {h: 0 for h in hosts}
            for s, d in edges:
                contrib[d] += ranks[s] // outdeg[s]
            ranks = {
                h: (15 * SCALE) // (100 * n) + (85 * contrib[h]) // 100
                for h in hosts
            }
        got = {
            r["host"]: r["rank"]
            for r in graph.outlink_pagerank(self._corpus(spark)).collect()
        }
        assert got == ranks
        # the hub (two in-links) outranks everyone
        assert max(got, key=got.get) == "hub.test"


class TestWetExport:
    """WET conversion-record export of the EXTRACTED text."""

    def test_roundtrip_recovers_extraction_bytes(self, spark):
        from deepseek_ocr_customvllm_spark.operators.extract import (
            extract_pages,
        )

        pages = synth_pages_df(spark, 30, num_partitions=3)
        extracted = extract_pages(pages, num_partitions=4).select(
            "url", "warc_ts", "markdown"
        )
        want = {
            r["url"]: r["markdown"].encode("utf-8")
            for r in extracted.collect()
        }
        parsed = warc.parse_warc(warc.wet_chunks(extracted, n_chunks=4))
        got = {r["url"]: bytes(r["html"]) for r in parsed.collect()}
        assert got == want and len(got) == 30

    def test_conversion_headers(self, spark):
        extracted = spark.createDataFrame(
            [("https://docs.test/1", dt.datetime(2025, 1, 1), "extracted text")],
            "url string, warc_ts timestamp, markdown string",
        )
        (r,) = warc.wet_chunks(extracted, n_chunks=1).collect()
        blob = bytes(r["data"])
        assert b"WARC-Type: conversion\r\n" in blob
        assert b"Content-Type: text/plain\r\n" in blob
        assert b"extracted text\r\n\r\n" in blob

    def test_raw_warc_headers_unchanged(self, spark):
        pages = synth_pages_df(spark, 3, num_partitions=1)
        (r,) = warc.warc_chunks(pages, n_chunks=1).collect()
        blob = bytes(r["data"])
        assert b"WARC-Type: response\r\n" in blob
        assert b"Content-Type: text/html\r\n" in blob


class TestOutlinkRegexParity:
    """The outlink regexes must mean the same thing in Java (Spark) and
    Python `re` (the VALUES-oracle twin) — property-tested over random
    link soup, not just the fixture corpus."""

    def test_random_anchor_soup_matches_python_twin(self, spark):
        import random
        import re

        from deepseek_ocr_customvllm_spark.operators.graph import (
            A_TAG_RE,
            ANCHOR_RE,
            HREF_RE,
        )

        rng = random.Random(42)
        words = "data spark link page index about contact ref x-y z_9".split()
        hrefs = ["/a", "/b?q=1", "https://ext.test/p", "", "/trail/", "#frag"]
        rows = []
        for i in range(40):
            parts = ["<html><body>"]
            for _ in range(rng.randint(0, 6)):
                quote = rng.choice(['"', "'"])
                href = rng.choice(hrefs)
                anchor = " ".join(
                    rng.sample(words, rng.randint(0, 3))
                )
                extra = rng.choice(["", ' class="x"', " rel=nofollow"])
                parts.append(
                    f"<a{extra} href={quote}{href}{quote}>{anchor}</a>"
                    if rng.random() < 0.8
                    else f"<a {rng.choice(words)}>{anchor}</a>"
                )
                parts.append(rng.choice(["<p>filler</p>", "text", "<div>"]))
            parts.append("</body></html>")
            rows.append((f"https://h{i % 5}.test/{i}", "".join(parts).encode()))

        df = spark.createDataFrame(
            [(u, dt.datetime(2025, 1, 1), h, None, "en") for u, h in rows],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        got = sorted(
            (r["url"], r["href"], r["anchor"])
            for r in graph.page_outlinks(df).collect()
        )
        want = []
        for u, h in rows:
            html = h.decode()
            if not html.startswith("<html"):
                continue
            for tag in re.findall(A_TAG_RE, html):
                href_m = re.search(HREF_RE, tag)
                anchor_m = re.search(ANCHOR_RE, tag)
                want.append(
                    (
                        u,
                        href_m.group(1) if href_m else "",
                        anchor_m.group(1) if anchor_m else "",
                    )
                )
        assert got == sorted(want) and len(want) > 50
