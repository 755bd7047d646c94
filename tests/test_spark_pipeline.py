"""Spark-layer tests: extraction operator, state store, resume,
determinism-at-any-parallelism, streaming variant, spark-submit job CLI.

Mirrors SURVEY.md §5.2 items 3-5.
"""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_customvllm_spark.job import run_extraction_job
from deepseek_ocr_customvllm_spark.operators.extract import (
    extract_pages,
    lineage_from_extracted,
)
from deepseek_ocr_customvllm_spark.plans.state import (
    ParquetStateStore,
    merge_sql,
    open_state_store,
)
from deepseek_ocr_customvllm_spark.sources.pages import (
    pages_from_documents,
    synth_pages_df,
)

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


N = 120
MAXB = 64 * 1024


def _hash_output(df):
    """Order-insensitive content hash of the deterministic columns."""
    return (
        df.select("url", "status", "markdown", "markdown_raw", "n_blocks")
        .withColumn(
            "h", F.md5(F.concat_ws("\x00", "url", "status", "markdown", "markdown_raw"))
        )
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")).alias("s"))
        .collect()[0]["s"]
    )


class TestExtractOperator:
    def test_extraction_matches_pure_python(self, spark):
        """The Spark operator must agree byte-for-byte with the direct
        extractor call for every row (Arrow round-trip is lossless)."""
        from deepseek_ocr_customvllm_spark.extractor import extract_document
        from deepseek_ocr_customvllm_spark.sources.pagegen import synth_page

        pages = synth_pages_df(spark, N)
        out = {
            r["url"]: r
            for r in extract_pages(pages, num_partitions=4, max_bytes=MAXB)
            .select("url", "status", "markdown", "markdown_raw", "n_blocks")
            .collect()
        }
        assert len(out) == N
        for i in range(N):
            row = synth_page(i)
            expected = extract_document(row["url"], row["html"], max_bytes=MAXB)
            got = out[row["url"]]
            assert got["status"] == expected.status, row["url"]
            assert got["markdown"] == expected.markdown, row["url"]
            assert got["markdown_raw"] == expected.markdown_raw, row["url"]
            assert got["n_blocks"] == expected.n_blocks, row["url"]

    def test_determinism_across_parallelism(self, spark):
        """Same corpus at different partition counts -> identical output
        (no partition-dependent state leaks into results)."""
        pages = synth_pages_df(spark, N)
        h2 = _hash_output(extract_pages(pages, num_partitions=2, max_bytes=MAXB))
        h7 = _hash_output(extract_pages(pages, num_partitions=7, max_bytes=MAXB))
        assert h2 == h7

    def test_blocks_struct_round_trip(self, spark):
        pages = synth_pages_df(spark, 30)
        ex = extract_pages(pages, num_partitions=2, max_bytes=MAXB)
        blocks = ex.select(F.explode("blocks").alias("p")).select(
            "p.page_number", F.explode("p.blocks").alias("b")
        )
        types = {r["b"]["type"] for r in blocks.collect()}
        assert "heading" in types and "paragraph" in types

    def test_lineage_aggregation(self, spark):
        pages = synth_pages_df(spark, 50)
        ex = extract_pages(pages, num_partitions=3, max_bytes=MAXB)
        lin = lineage_from_extracted(ex, "jobx").collect()
        assert sum(r["n_docs"] for r in lin) == 50
        assert all(r["job_id"] == "jobx" for r in lin)


class TestStateStore:
    def test_merge_insert_update(self, spark, tmpdir):
        store = ParquetStateStore(spark, tmpdir)
        b1 = spark.createDataFrame(
            [("u1", "SUCCESS"), ("u2", "FAILED")], ["url", "status"]
        ).withColumn("updated_at", F.current_timestamp())
        store.merge(b1)
        state = {r["url"]: r for r in store.read().collect()}
        assert state["u1"]["status"] == "SUCCESS" and state["u1"]["attempt"] == 1

        b2 = spark.createDataFrame([("u2", "SUCCESS")], ["url", "status"]).withColumn(
            "updated_at", F.current_timestamp()
        )
        store.merge(b2)
        state = {r["url"]: r for r in store.read().collect()}
        assert state["u2"]["status"] == "SUCCESS"
        assert state["u2"]["attempt"] == 2
        assert state["u1"]["attempt"] == 1  # untouched rows carried over

    def test_pending_excludes_terminal(self, spark, tmpdir):
        store = ParquetStateStore(spark, tmpdir)
        batch = spark.createDataFrame(
            [("u1", "SUCCESS"), ("u2", "FAILED"), ("u3", "REJECTED")],
            ["url", "status"],
        ).withColumn("updated_at", F.current_timestamp())
        store.merge(batch)
        pages = spark.createDataFrame(
            [("u1",), ("u2",), ("u3",), ("u4",)], ["url"]
        )
        pending = {r["url"] for r in store.pending(pages).collect()}
        assert pending == {"u2", "u4"}  # FAILED retried, terminal skipped

    def test_time_travel_and_expiry(self, spark, tmpdir):
        store = ParquetStateStore(spark, tmpdir)
        for k in range(4):
            b = spark.createDataFrame([(f"u{k}", "SUCCESS")], ["url", "status"]).withColumn(
                "updated_at", F.current_timestamp()
            )
            store.merge(b)
        assert store.read(version=1).count() == 1
        assert store.read().count() == 4
        # merges are incremental: old versions still own live buckets, so
        # expiry must NOT remove them
        removed = store.expire_versions(keep_last=2)
        assert store.read().count() == 4
        # a merge touching every url repoints all buckets at the new
        # version; the old ones become expirable
        allb = spark.createDataFrame(
            [(f"u{k}", "SUCCESS") for k in range(4)], ["url", "status"]
        ).withColumn("updated_at", F.current_timestamp())
        store.merge(allb)
        removed = store.expire_versions(keep_last=1)
        assert removed >= 3
        assert store.read().count() == 4

    def test_incremental_merge_rewrites_only_changed_buckets(self, spark, tmpdir):
        store = ParquetStateStore(spark, tmpdir, n_buckets=8)
        b1 = spark.createDataFrame(
            [(f"u{k}", "SUCCESS") for k in range(100)], ["url", "status"]
        ).withColumn("updated_at", F.current_timestamp())
        v1 = store.merge(b1)
        v1_files = {
            os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
            for dp, _, fs in os.walk(store._path(v1))
            for f in fs
        }
        b2 = spark.createDataFrame([("u0", "FAILED")], ["url", "status"]).withColumn(
            "updated_at", F.current_timestamp()
        )
        v2 = store.merge(b2)
        # the new version holds only the single touched bucket
        v2_buckets = [
            d for d in os.listdir(store._path(v2)) if d.startswith("bucket=")
        ]
        assert len(v2_buckets) == 1
        # v1's data files were not rewritten
        for path, mtime in v1_files.items():
            assert os.path.getmtime(path) == mtime
        # and the assembled state is the correct union
        state = {r["url"]: r["status"] for r in store.read().collect()}
        assert len(state) == 100 and state["u0"] == "FAILED"
        assert state["u1"] == "SUCCESS"

    def test_empty_ledgered_batch_advances_ledger(self, spark, tmpdir):
        """merge() with stream_id/batch_id but ZERO rows must still
        record the applied entry (a fully-dropped streaming batch that
        never advances the ledger replays forever) — and must not
        disturb existing data."""
        store = ParquetStateStore(spark, tmpdir, n_buckets=8)
        b1 = spark.createDataFrame(
            [("u1", "SUCCESS")], ["url", "status"]
        ).withColumn("updated_at", F.current_timestamp())
        store.merge(b1, stream_id="s", batch_id=0)
        assert store.last_applied("s") == 0
        empty = spark.createDataFrame(
            [], "url string, status string, updated_at timestamp"
        )
        v = store.merge(empty, stream_id="s", batch_id=1)
        assert store.last_applied("s") == 1
        assert v == store.current_version()
        # data untouched; replay of the empty batch is now suppressed
        assert {r["url"] for r in store.read().collect()} == {"u1"}
        store.merge(empty, stream_id="s", batch_id=1)
        assert store.last_applied("s") == 1

    def test_crash_before_manifest_commit_is_invisible(self, spark, tmpdir):
        store = ParquetStateStore(spark, tmpdir)
        b1 = spark.createDataFrame([("u1", "SUCCESS")], ["url", "status"]).withColumn(
            "updated_at", F.current_timestamp()
        )
        v1 = store.merge(b1)
        # simulate a writer that crashed after the data write, before the
        # manifest rename: a dangling v_2 directory with no manifest
        dangling = spark.createDataFrame(
            [("uX", "SUCCESS")], ["url", "status"]
        ).withColumn("updated_at", F.current_timestamp()).withColumn(
            "attempt", F.lit(1)
        ).select("url", "status", "attempt", "updated_at").withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(store.n_buckets)).cast("int")
        )
        dangling.write.mode("overwrite").partitionBy("bucket").parquet(
            store._path(v1 + 1)
        )
        assert store.current_version() == v1  # dangling dir invisible
        assert {r["url"] for r in store.read().collect()} == {"u1"}
        # the next real merge takes over the dangling version number cleanly
        b2 = spark.createDataFrame([("u2", "SUCCESS")], ["url", "status"]).withColumn(
            "updated_at", F.current_timestamp()
        )
        v2 = store.merge(b2)
        assert v2 == v1 + 1
        assert {r["url"] for r in store.read().collect()} == {"u1", "u2"}

    def test_iceberg_merge_sql_shape(self):
        sql = merge_sql("cat.db.extraction_state", "batch")
        assert "MERGE INTO cat.db.extraction_state" in sql
        assert "WHEN MATCHED" in sql and "WHEN NOT MATCHED" in sql

    def test_iceberg_extracted_ddl_tracks_schema(self):
        from deepseek_ocr_customvllm_spark.operators.extract import EXTRACTED_SCHEMA
        from deepseek_ocr_customvllm_spark.plans.state import extracted_table_ddl

        ddl = extracted_table_ddl("cat.db.extracted", n_buckets=512)
        assert "USING iceberg" in ddl
        assert "PARTITIONED BY (days(warc_ts), bucket(512, url))" in ddl
        for f in EXTRACTED_SCHEMA.fields:  # stays in sync with the one schema
            assert f"{f.name} {f.dataType.simpleString()}" in ddl

    def test_open_state_store_dispatch(self, spark, tmpdir):
        assert isinstance(open_state_store(spark, tmpdir), ParquetStateStore)


class TestJob:
    def test_end_to_end_and_resume(self, spark, tmpdir):
        pages = synth_pages_df(spark, 80)
        m1 = run_extraction_job(
            spark, pages, tmpdir, num_partitions=4, max_bytes=MAXB
        )
        assert m1["rows_extracted"] == 80
        m2 = run_extraction_job(
            spark, pages, tmpdir, num_partitions=4, max_bytes=MAXB
        )
        assert m2["rows_extracted"] == 0  # exactly-once per url

    def test_partial_then_resume_completes_remainder(self, spark, tmpdir):
        pages = synth_pages_df(spark, 60)
        first_half = pages.limit(30)
        run_extraction_job(spark, first_half, tmpdir, num_partitions=2, max_bytes=MAXB)
        m2 = run_extraction_job(spark, pages, tmpdir, num_partitions=2, max_bytes=MAXB)
        assert m2["rows_extracted"] == 30
        total = spark.read.parquet(os.path.join(tmpdir, "extracted")).select(
            "url"
        ).distinct().count()
        assert total == 60


class TestStreaming:
    def test_stream_drains_landing_dir(self, spark, tmpdir):
        from deepseek_ocr_customvllm_spark.streaming import run_stream_once

        landing = os.path.join(tmpdir, "landing")
        synth_pages_df(spark, 40, num_partitions=4).write.parquet(landing)
        n = run_stream_once(
            spark,
            landing,
            os.path.join(tmpdir, "out"),
            os.path.join(tmpdir, "ckpt"),
        )
        assert n == 40


class TestPagesFromDocuments:
    def test_wrap_and_extract(self, spark):
        docs = spark.read.parquet(os.path.join(SF0001, "documents.parquet"))
        pages = pages_from_documents(docs)
        ex = extract_pages(pages.limit(50), num_partitions=2)
        rows = ex.select("status", "n_blocks").collect()
        assert all(r["status"] == "SUCCESS" for r in rows)
        assert all(r["n_blocks"] >= 2 for r in rows)  # h1 + paragraph survive


class TestStreamingMetrics:
    def test_watermarked_window_agg(self, spark, tmpdir):
        from deepseek_ocr_customvllm_spark.streaming.extract_stream import (
            run_metrics_once,
        )

        pages = synth_pages_df(spark, 40, num_partitions=2)
        ex_dir = os.path.join(tmpdir, "extracted")
        extract_pages(pages, num_partitions=2, max_bytes=64 * 1024).write.parquet(
            ex_dir
        )
        result = run_metrics_once(spark, ex_dir)
        rows = result.collect()
        assert sum(r["n_docs"] for r in rows) == 40
        assert all(r["window"]["start"] is not None for r in rows)


class TestPurge:
    def test_purge_removes_and_allows_reingest(self, spark, tmpdir):
        from deepseek_ocr_customvllm_spark.job import purge_urls

        pages = synth_pages_df(spark, 40)
        run_extraction_job(spark, pages, tmpdir, num_partitions=2, max_bytes=MAXB)
        victims = pages.select("url").limit(5)
        removed = purge_urls(spark, tmpdir, victims)
        assert removed == 5
        left = spark.read.parquet(os.path.join(tmpdir, "extracted"))
        assert left.count() == 35
        # purged urls are re-processed on the next run (state row gone)
        m = run_extraction_job(spark, pages, tmpdir, num_partitions=2, max_bytes=MAXB)
        assert m["rows_extracted"] == 5


class TestTableSimilarity:
    def test_identical(self):
        from deepseek_ocr_customvllm_spark.extractor.evaluate import table_similarity

        rows = [["a", "1"], ["b", "2"]]
        assert table_similarity(rows, rows) == 1.0

    def test_one_cell_changed(self):
        from deepseek_ocr_customvllm_spark.extractor.evaluate import table_similarity

        a = [["a", "1"], ["b", "2"]]
        b = [["a", "1"], ["b", "999"]]
        # one of four cells wrong -> row sub-cost 0.5 over 2 rows
        assert table_similarity(a, b) == 0.75

    def test_missing_row(self):
        from deepseek_ocr_customvllm_spark.extractor.evaluate import table_similarity

        a = [["a"], ["b"], ["c"]]
        assert table_similarity(a, a[:2]) == pytest.approx(2 / 3)

    def test_empty(self):
        from deepseek_ocr_customvllm_spark.extractor.evaluate import (
            mean_table_similarity,
            table_similarity,
        )

        assert table_similarity([], []) == 1.0
        assert mean_table_similarity([]) == 0.0


class TestStatefulDedupStream:
    def test_first_seen_across_batches(self, spark, tmpdir):
        """Two landing files with overlapping urls: the stateful stream
        must emit each url exactly once across micro-batches."""
        from pyspark.sql import functions as F
        from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
            first_seen_stream,
        )
        from deepseek_ocr_customvllm_spark.sources.pages import PAGES_SPARK_SCHEMA

        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        batch1 = synth_pages_df(spark, 30, num_partitions=1)
        batch2 = synth_pages_df(spark, 50, num_partitions=1)  # 0..29 repeat
        batch1.write.parquet(os.path.join(landing, "b1"))
        batch2.write.parquet(os.path.join(landing, "b2"))

        stream = (
            spark.readStream.schema(PAGES_SPARK_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing + "/*")
        )
        out_dir = os.path.join(tmpdir, "out")
        q = (
            first_seen_stream(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        res = spark.read.parquet(out_dir)
        assert res.count() == 50  # no url twice despite the overlap
        assert res.select("url").distinct().count() == 50

    def test_state_survives_query_restart(self, spark, tmpdir):
        """The (binary md5 digest) seen-set must round-trip through Spark's
        state store across a full query restart: urls deduped in run 1 are
        NOT re-emitted by run 2 started from the same checkpoint."""
        from deepseek_ocr_customvllm_spark.sources.pages import PAGES_SPARK_SCHEMA
        from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
            first_seen_stream,
        )

        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        out_dir = os.path.join(tmpdir, "out")
        ckpt = os.path.join(tmpdir, "ckpt")

        def run_once():
            stream = (
                spark.readStream.schema(PAGES_SPARK_SCHEMA)
                .option("maxFilesPerTrigger", 1)
                .parquet(landing + "/*")
            )
            q = (
                first_seen_stream(stream)
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        synth_pages_df(spark, 30, num_partitions=1).write.parquet(
            os.path.join(landing, "b1")
        )
        run_once()  # run 1 sees urls 0..29, then the query STOPS
        synth_pages_df(spark, 50, num_partitions=1).write.parquet(
            os.path.join(landing, "b2")
        )  # 0..29 repeat, 30..49 new
        run_once()  # fresh query, same checkpoint

        res = spark.read.parquet(out_dir)
        assert res.count() == 50
        assert res.select("url").distinct().count() == 50


class TestBoundedDedupStream:
    """The snapshot-bounded variant (VERDICT r02 'What's wrong #3'):
    stream state holds only the recent window; older digests move to the
    per-shard parquet seen-store, and suppression must survive both the
    flush boundary and a full query restart."""

    def _run_once(self, spark, landing, out_dir, ckpt, store):
        from deepseek_ocr_customvllm_spark.sources.pages import PAGES_SPARK_SCHEMA
        from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
            bounded_first_seen_stream,
        )

        stream = (
            spark.readStream.schema(PAGES_SPARK_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing + "/*")
        )
        q = (
            bounded_first_seen_stream(stream, store, max_window=0)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def test_no_reemission_across_snapshot_boundary_and_restart(
        self, spark, tmpdir
    ):
        import glob
        import hashlib

        landing = os.path.join(tmpdir, "landing")
        out_dir = os.path.join(tmpdir, "out")
        ckpt = os.path.join(tmpdir, "ckpt")
        store = os.path.join(tmpdir, "seen_store")
        os.makedirs(landing)

        # run 1: urls 0..29 (two batches via maxFilesPerTrigger=1, so the
        # second batch already flushes batch-1 digests to the snapshot)
        synth_pages_df(spark, 30, num_partitions=1).write.parquet(
            os.path.join(landing, "b1")
        )
        synth_pages_df(spark, 40, num_partitions=1).write.parquet(
            os.path.join(landing, "b2")  # 0..29 repeat, 30..39 new
        )
        self._run_once(spark, landing, out_dir, ckpt, store)
        assert spark.read.parquet(out_dir).select("url").distinct().count() == 40

        # with max_window=0 every committed batch was flushed: the
        # seen-store must now hold digests (state no longer does)
        snap_files = glob.glob(os.path.join(store, "shard_*.parquet"))
        assert snap_files, "snapshot flush never happened"
        snap_digests = set()
        for f in snap_files:
            import pyarrow.parquet as pq

            snap_digests |= {
                bytes(v.as_py())
                for v in pq.read_table(f, columns=["digest"]).column("digest")
            }
        sample_url = synth_pages_df(spark, 1, num_partitions=1).collect()[0]["url"]
        assert hashlib.md5(sample_url.encode()).digest() in snap_digests

        # run 2 (restart from checkpoint): all 40 repeat + 10 new — the
        # repeats are only findable via the SNAPSHOT now
        synth_pages_df(spark, 50, num_partitions=1).write.parquet(
            os.path.join(landing, "b3")
        )
        self._run_once(spark, landing, out_dir, ckpt, store)
        res = spark.read.parquet(out_dir)
        assert res.count() == 50  # exactly once, across flush + restart
        assert res.select("url").distinct().count() == 50


class TestExactlyOnceReader:
    def test_read_extracted_collapses_duplicate_runs(self, spark, tmpdir):
        """Crash-between-write-and-merge simulation: same urls appended
        under two job ids; read_extracted returns one row per url."""
        from deepseek_ocr_customvllm_spark.job import read_extracted

        pages = synth_pages_df(spark, 25)
        # resume=False forces re-extraction of the same urls (run 2
        # models a rerun after a crash that lost the state merge)
        run_extraction_job(spark, pages, tmpdir, num_partitions=2, max_bytes=MAXB)
        run_extraction_job(
            spark, pages, tmpdir, num_partitions=2, max_bytes=MAXB, resume=False
        )
        raw = spark.read.parquet(os.path.join(tmpdir, "extracted"))
        assert raw.count() == 50  # duplicates on disk
        deduped = read_extracted(spark, tmpdir)
        assert deduped.count() == 25
        assert deduped.select("url").distinct().count() == 25


class TestMultimodalPlumbing:
    def test_frame_sampling_shape(self, spark):
        """Binary payload -> N frames per row with typed metadata."""
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            FRAME_SIZE,
            N_FRAMES,
            frame_samples,
        )

        pages = synth_pages_df(spark, 20).selectExpr(
            "xxhash64(url) as media_id", "html as payload"
        )
        frames = frame_samples(pages)
        rows = frames.collect()
        assert len(rows) == 20 * N_FRAMES
        by_media = {}
        for r in rows:
            by_media.setdefault(r["media_id"], []).append(r)
        for media_rows in by_media.values():
            assert sorted(r["frame_index"] for r in media_rows) == list(range(N_FRAMES))
            for r in media_rows:
                assert len(r["frame_bytes"]) <= FRAME_SIZE
                assert r["meta"]["media_type"] == "binary/fake"
                assert r["meta"]["duration_ms"] >= 0

    def test_decode_stub_raises(self):
        import pytest as _pytest

        from deepseek_ocr_customvllm_spark.operators.multimodal import decode_stub

        with _pytest.raises(NotImplementedError):
            decode_stub(b"\x89PNG", "image/png")

    def test_out_of_profile_codecs_gate(self):
        """PNG and JPEG both decode stdlib-real since round 7; the
        capability gate now guards only out-of-profile streams
        (progressive JPEG here) — NotImplementedError, isolated to an
        'unsupported' row upstream."""
        import struct as _s

        import pytest as _pytest

        from deepseek_ocr_customvllm_spark.operators import multimodal as mm

        progressive = (
            b"\xff\xd8"
            + b"\xff\xc2"
            + _s.pack(">HBHHB", 11, 8, 8, 8, 1)
            + bytes((1, 0x11, 0))
        )
        with _pytest.raises(NotImplementedError):
            mm.decode_image(progressive)
        assert (
            mm.image_feature_row(1, progressive)["media_type"]
            == "unsupported"
        )

    def test_png_decodes_stdlib_even_if_pil_present(self):
        """PNG must take the stdlib decoder unconditionally — one
        implementation of the oracle math in every environment."""
        from deepseek_ocr_customvllm_spark.operators import multimodal as mm

        img = mm.decode_image(mm.synth_png(9, width=4, height=3))
        assert img["media_type"] == "image/png"


class TestSimhashBanding:
    """The banding knob (dedup.simhash_near_pairs): pigeonhole recall,
    candidate budget, and validation."""

    def test_band_counts_agree_within_guarantee(self, spark):
        """Any n_bands >= hamming_max+1 guarantees full recall for that
        hamming radius, so 4x15 and 6x10 banding must find the IDENTICAL
        hamming<=3 pair set."""
        import __spark_entry__ as em
        from deepseek_ocr_customvllm_spark.operators import dedup

        aug = em._augmented_docs(
            spark.read.parquet(os.path.join(SF0001, "documents.parquet"))
        )
        sig = dedup.simhash_signatures(aug).cache()
        p4 = {tuple(r) for r in dedup.simhash_near_pairs(sig, n_bands=4).collect()}
        p6 = {tuple(r) for r in dedup.simhash_near_pairs(sig, n_bands=6).collect()}
        assert p4 == p6 and p4

    def test_x2_with_precomputed_s1_is_identical(self, spark):
        """simhash_near_pairs_x2(s1_pairs=...) (the recall report's
        run-the-unsalted-tier-once path) must return exactly the same
        pairs as the self-contained form."""
        import __spark_entry__ as em
        from deepseek_ocr_customvllm_spark.operators import dedup

        aug = em._augmented_docs(
            spark.read.parquet(os.path.join(SF0001, "documents.parquet"))
        )
        full = {
            tuple(r) for r in dedup.simhash_near_pairs_x2(aug).collect()
        }
        s1 = dedup.simhash_near_pairs(
            dedup.simhash_signatures(aug)
        ).localCheckpoint()
        reused = {
            tuple(r)
            for r in dedup.simhash_near_pairs_x2(aug, s1_pairs=s1).collect()
        }
        assert full == reused and full

    def test_candidate_budget_at_default_bands(self, spark):
        """Default 4x15 banding must keep the candidate set (pre-verify
        pairs = hamming_max lifted to 60) within a linear budget of the
        corpus size at sf0.01 — the guard the banding knob exists for."""
        import __spark_entry__ as em
        from deepseek_ocr_customvllm_spark.operators import dedup

        aug = em._augmented_docs(
            spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        )
        n_docs = aug.count()
        sig = dedup.simhash_signatures(aug).cache()
        candidates = dedup.simhash_near_pairs(sig, hamming_max=60).count()
        assert candidates <= 100 * n_docs, (
            f"{candidates} candidates for {n_docs} docs — widen bands"
        )
        # wider bands (lower guarantee) must strictly tighten the budget
        candidates3 = dedup.simhash_near_pairs(sig, hamming_max=60, n_bands=3).count()
        assert candidates3 <= candidates

    @pytest.mark.parametrize("blocker", ["minhash", "simhash", "m0"])
    def test_candidate_budget_at_sf01(self, spark, blocker):
        """Candidate budget for all three pair generators at sf0.1 (not
        just sf0.01): banding-parameter drift must fail CI before it
        shows up as a bench regression.  Thresholds in NOTES.md."""
        import __spark_entry__ as em
        from pyspark.sql import functions as SF
        from deepseek_ocr_customvllm_spark.operators import dedup

        aug = em._augmented_docs(
            spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        )
        n_docs = aug.count()
        if blocker == "simhash":
            sig = dedup.simhash_signatures(aug)
            candidates = dedup.simhash_near_pairs(sig, hamming_max=60).count()
        else:
            sig = dedup.minhash_signatures(dedup.shingles(aug, distinct=False))
            if blocker == "minhash":
                candidates = dedup.lsh_candidate_pairs(sig).count()
            else:  # m0 single-hash blocker
                a, b = sig.select("doc_id", "m0").alias("a"), sig.select(
                    "doc_id", "m0"
                ).alias("b")
                candidates = (
                    a.join(
                        b,
                        (SF.col("a.m0") == SF.col("b.m0"))
                        & (SF.col("a.doc_id") < SF.col("b.doc_id")),
                    )
                    .distinct()
                    .count()
                )
        assert candidates <= 100 * n_docs, (
            f"{blocker}: {candidates} candidates for {n_docs} docs — "
            "banding parameters drifted"
        )

    def test_hot_bucket_cap_and_validation(self, spark):
        import __spark_entry__ as em
        import pytest as _pytest
        from deepseek_ocr_customvllm_spark.operators import dedup

        aug = em._augmented_docs(
            spark.read.parquet(os.path.join(SF0001, "documents.parquet"))
        )
        sig = dedup.simhash_signatures(aug).cache()
        full = dedup.simhash_near_pairs(sig, hamming_max=60).count()
        capped = dedup.simhash_near_pairs(sig, hamming_max=60, max_bucket=2).count()
        assert capped <= full
        with _pytest.raises(ValueError):
            dedup.simhash_near_pairs(sig, n_bands=7)


class TestStateStoreModel:
    """Model-based check of the incremental bucket-manifest store: a random
    interleaving of merges, deletes, and expiries must always agree with a
    plain dict model — the property that matters for exactly-once resume."""

    def test_random_operation_sequences_match_dict_model(self, spark, tmpdir):
        import random

        rng = random.Random(20260816)
        store = ParquetStateStore(spark, tmpdir, n_buckets=8)
        model = {}  # url -> (status, attempt)
        urls = [f"u{k}" for k in range(40)]

        def ts(k):
            return F.to_timestamp(F.lit(f"2025-01-01 00:00:{k:02d}"))

        for step in range(12):
            op = rng.choice(["merge", "merge", "merge", "delete", "expire"])
            if op == "merge":
                batch_urls = rng.sample(urls, rng.randint(1, 12))
                status = rng.choice(["SUCCESS", "FAILED", "REJECTED"])
                b = spark.createDataFrame(
                    [(u, status) for u in batch_urls], ["url", "status"]
                ).withColumn("updated_at", ts(step))
                store.merge(b)
                for u in batch_urls:
                    prev = model.get(u)
                    model[u] = (status, (prev[1] if prev else 0) + 1)
            elif op == "delete":
                doomed = rng.sample(urls, rng.randint(1, 6))
                store.delete_urls(
                    spark.createDataFrame([(u,) for u in doomed], ["url"])
                )
                for u in doomed:
                    model.pop(u, None)
            else:
                store.expire_versions(keep_last=2)

            got = {
                r["url"]: (r["status"], r["attempt"])
                for r in store.read().collect()
            }
            assert got == model, f"diverged at step {step} after {op}"

        # resume semantics against the final state
        pages = spark.createDataFrame([(u,) for u in urls], ["url"])
        pending = {r["url"] for r in store.pending(pages).collect()}
        expected = {
            u for u in urls
            if model.get(u, ("", 0))[0] not in ("SUCCESS", "REJECTED")
        }
        assert pending == expected


class TestImageDecode:
    """Real stdlib decoders for uncompressed raster formats."""

    def test_bmp_round_trip(self):
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _decode_bmp,
            synth_bmp,
        )

        img = _decode_bmp(synth_bmp(42, width=10, height=6))
        assert (img["width"], img["height"]) == (10, 6)
        # bottom-up storage comes back top-down: decoded row 0 is the LAST
        # stored row, i.e. the synth pattern at y = height-1
        v = (42 * 2654435761 + 5 * 97 + 0 * 31) & 0xFFFFFFFF
        assert img["rows"][0][0] == (v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF)

    def test_ppm_binary_and_ascii_agree(self):
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _decode_ppm,
            synth_ppm,
        )

        p6 = synth_ppm(7, width=5, height=4)
        img6 = _decode_ppm(p6)
        # build the P3 twin from the decoded pixels
        body = "\n".join(
            " ".join(f"{r} {g} {b}" for r, g, b in row) for row in img6["rows"]
        )
        p3 = f"P3\n5 4\n255\n{body}\n".encode()
        img3 = _decode_ppm(p3)
        assert img3["rows"] == img6["rows"]

    def test_top_down_bmp(self):
        import struct as _s

        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _decode_bmp,
            synth_bmp,
        )

        bottom_up = synth_bmp(3, width=4, height=3)
        # flip the height sign -> top-down; rows must come back reversed
        top_down = bytearray(bottom_up)
        top_down[22:26] = _s.pack("<i", -3)
        a = _decode_bmp(bottom_up)["rows"]
        b = _decode_bmp(bytes(top_down))["rows"]
        assert a == b[::-1]

    def test_unsupported_and_truncated_isolate(self):
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            image_feature_row,
            synth_bmp,
        )

        assert image_feature_row(1, b"\x89PNG\r\n\x1a\nxxx")["media_type"] == "unsupported"
        assert image_feature_row(2, b"\xff\xd8\xffxxx")["media_type"] == "unsupported"
        assert image_feature_row(3, b"")["media_type"] == "unsupported"
        assert image_feature_row(4, synth_bmp(4)[:40])["media_type"] == "unsupported"
        assert image_feature_row(5, None)["media_type"] == "unsupported"

    def test_png_round_trip_all_color_types_and_filters(self):
        """synth_png applies the real filter transforms (type cycling
        per row) and _decode_png must invert every one of them exactly:
        decoded pixels == the generator recurrence, for gray/RGB/RGBA
        and heights that cover all five filters."""
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _decode_png,
            synth_png,
        )

        for ctype in (0, 2, 6):
            for seed in (0, 1, 7, 1234):
                w, h = 13 + seed % 5, 9 + seed % 4  # odd sizes, h >= 5
                img = _decode_png(synth_png(seed, w, h, color_type=ctype))
                assert (img["width"], img["height"]) == (w, h)
                assert img["media_type"] == "image/png"
                for y in range(h):
                    for x in range(w):
                        v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
                        px = (
                            (v >> 16) & 0xFF,
                            (v >> 8) & 0xFF,
                            v & 0xFF,
                        )
                        if ctype == 0:
                            exp = (px[0], px[0], px[0])
                        else:  # RGB and RGBA both surface the rgb triple
                            exp = px
                        assert img["rows"][y][x] == exp, (ctype, seed, x, y)

    def test_png_malformed_and_out_of_profile(self):
        import struct as _s

        import pytest as _pytest

        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _PNG_SIG,
            _decode_png,
            _png_chunk,
            image_feature_row,
            synth_png,
        )

        good = synth_png(5, width=6, height=4)
        # corrupt one IDAT byte: CRC check must catch it
        bad = bytearray(good)
        bad[len(bad) // 2] ^= 0xFF
        with _pytest.raises(ValueError):
            _decode_png(bytes(bad))
        # truncated chunk
        with _pytest.raises(ValueError):
            _decode_png(good[:-6])
        # out-of-profile variants gate with NotImplementedError and
        # isolate as 'unsupported' rows upstream
        for depth, ctype, interlace in ((16, 2, 0), (8, 3, 0), (8, 2, 1)):
            ihdr = _s.pack(">IIBBBBB", 2, 1, depth, ctype, 0, 0, interlace)
            p = (
                _PNG_SIG
                + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", b"x")
                + _png_chunk(b"IEND", b"")
            )
            with _pytest.raises(NotImplementedError):
                _decode_png(p)
            assert image_feature_row(1, p)["media_type"] == "unsupported"

    def test_gif_round_trip_exact(self):
        """GIF is lossless: encode (independent real-LZW compressor) →
        decode must reproduce the source indices' palette colors
        EXACTLY, across interlace/local-palette variants and a
        high-entropy image that forces LZW table growth."""
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _decode_gif,
            _gif_lzw_compress,
            _gif_lzw_decode,
            synth_gif,
        )

        def expected(seed, w, h, n_colors):
            bits = max(1, (n_colors - 1).bit_length())
            pal_n = 1 << bits
            pal = bytes(
                (seed * 29 + i * 53 + c * 11) % 256
                for i in range(pal_n)
                for c in range(3)
            )
            return [
                [
                    tuple(
                        pal[3 * ((seed * 2654435761 + y * 97 + x * 31) % n_colors) + c]
                        for c in range(3)
                    )
                    for x in range(w)
                ]
                for y in range(h)
            ]

        cases = [
            (1, 18, 11, 8, False, False),
            (2, 25, 13, 5, True, False),
            (3, 9, 7, 16, False, True),
            (4, 40, 31, 4, True, True),
            (5, 8, 8, 2, False, False),
        ]
        for seed, w, h, nc, il, lp in cases:
            img = _decode_gif(
                synth_gif(seed, w, h, n_colors=nc, interlace=il,
                          local_palette=lp)
            )
            assert (img["width"], img["height"]) == (w, h)
            assert img["media_type"] == "image/gif"
            assert img["rows"] == expected(seed, w, h, nc), (seed, il, lp)
        # raw LZW layer: a high-entropy index stream long enough to
        # grow the table through several code-size bumps and a reset
        idx = [(i * 2654435761 >> 7) % 64 for i in range(20000)]
        assert _gif_lzw_decode(_gif_lzw_compress(idx, 6), 6, len(idx)) == idx

    def test_tiff_round_trip_matrix(self):
        """TIFF is lossless in every supported layout: the full
        gray/RGB x none/LZW/PackBits x byte-order x predictor x
        multi-strip matrix must reproduce the generator pixels exactly
        (the TIFF LZW is pdf_extract's MSB-first EarlyChange decoder
        against an independent compressor — a real inversion check)."""
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _decode_tiff,
            synth_tiff,
        )

        def expected(seed, w, h, gray):
            rows = []
            for y in range(h):
                row = []
                for x in range(w):
                    v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
                    px = ((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)
                    row.append((px[0],) * 3 if gray else px)
                rows.append(row)
            return rows

        n = 0
        for gray in (False, True):
            for comp in (1, 5, 32773):
                for be in (False, True):
                    for pred in (1, 2) if comp != 1 else (1,):
                        for rps in (None, 4):
                            t = synth_tiff(
                                7, 17, 9, gray=gray, compression=comp,
                                big_endian=be, predictor=pred,
                                rows_per_strip=rps,
                            )
                            img = _decode_tiff(t)
                            assert img["media_type"] == "image/tiff"
                            assert img["rows"] == expected(7, 17, 9, gray)
                            n += 1
        assert n == 40

    def test_tiff_lzw_crosses_code_widths(self):
        """The independent TIFF-LZW compressor against pdf_extract's
        decoder on a 60k high-entropy stream: forces growth through
        every code width and a 4096-table clear/reset."""
        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _lzw_decode,
        )
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _tiff_lzw_compress,
        )

        data = bytes((i * 2654435761 >> 9) & 0xFF for i in range(60000))
        assert _lzw_decode(_tiff_lzw_compress(data)) == data

    def test_tiff_lzw_randomized_inversion(self):
        """Randomized round-trip fuzz (fixed seed): includes the
        end-on-width-boundary shapes that exposed the encoder's EOD
        width bug (review r7 — the decoder widens on its final flush
        insertion; the encoder must mirror it before emitting EOD)."""
        import random

        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _lzw_decode,
        )
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _tiff_lzw_compress,
        )

        rng = random.Random(42)
        for _ in range(400):
            n = rng.choice([0, 1, 5, 768, 1817, rng.randint(1, 3000)])
            data = bytes(rng.randrange(256) for _ in range(n))
            assert _lzw_decode(_tiff_lzw_compress(data)) == data

    def test_tiff_lzw_bomb_bounded(self):
        """An LZW strip inflating far past the declared raster must
        fail as ValueError at the caller bound, never allocate
        attacker-sized buffers (review r7: a 941-byte strip inflated
        unbounded before the size check)."""
        import pytest as _pytest

        from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
            _lzw_decode,
        )
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _decode_tiff,
            _tiff_lzw_compress,
            image_feature_row,
            synth_tiff,
        )

        with _pytest.raises(ValueError, match="caller bound"):
            _lzw_decode(_tiff_lzw_compress(b"\x00" * 300000), max_out=768)
        # whole-file shape: take a valid LZW TIFF and splice in a strip
        # that inflates past the raster
        import struct as _s

        t = bytearray(synth_tiff(3, 8, 4, gray=True, compression=5))
        bomb = _tiff_lzw_compress(b"\x00" * 200000)
        n_tags = _s.unpack_from("<H", t, 8)[0]
        off_at = cnt_at = None
        for i in range(n_tags):
            pos = 10 + 12 * i
            tag = _s.unpack_from("<H", t, pos)[0]
            if tag == 273:
                off_at = pos + 8
            elif tag == 279:
                cnt_at = pos + 8
        _s.pack_into("<I", t, off_at, len(t))
        _s.pack_into("<I", t, cnt_at, len(bomb))
        t += bomb
        with _pytest.raises(ValueError):
            _decode_tiff(bytes(t))
        assert image_feature_row(1, bytes(t))["media_type"] == "unsupported"

    def test_tiff_surplus_strips_and_zero_count_tag_reject(self):
        import struct as _s

        import pytest as _pytest

        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _decode_tiff,
            synth_tiff,
        )

        good = synth_tiff(3, 8, 4, gray=True)
        # zero-count width tag must be a ValueError, not IndexError
        b = bytearray(good)
        n_tags = _s.unpack_from("<H", b, 8)[0]
        for i in range(n_tags):
            pos = 10 + 12 * i
            if _s.unpack_from("<H", b, pos)[0] == 256:
                _s.pack_into("<I", b, pos + 4, 0)  # count = 0
        with _pytest.raises(ValueError):
            _decode_tiff(bytes(b))
        # strip count disagreeing with the image height must reject
        # (surplus strips previously sliced with a negative bound)
        b2 = bytearray(good)
        for i in range(n_tags):
            pos = 10 + 12 * i
            if _s.unpack_from("<H", b2, pos)[0] == 278:
                _s.pack_into("<H", b2, pos + 8, 1)  # rows_per_strip=1
        with _pytest.raises(ValueError, match="strip count"):
            _decode_tiff(bytes(b2))

    def test_tiff_malformed_and_gates(self):
        import pytest as _pytest

        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _decode_tiff,
            image_feature_row,
            synth_tiff,
        )

        good = synth_tiff(3)
        for bad in (good[:6], good[:40], b"II*\x00" + b"\xff" * 8):
            with _pytest.raises(ValueError):
                _decode_tiff(bad)
            assert image_feature_row(1, bad)["media_type"] == "unsupported"
        # out-of-profile: 16-bit samples gate (patch BitsPerSample)
        import struct as _s

        b = bytearray(synth_tiff(3, gray=True))
        n_tags = _s.unpack_from("<H", b, 8)[0]
        for i in range(n_tags):
            pos = 10 + 12 * i
            if _s.unpack_from("<H", b, pos)[0] == 258:
                _s.pack_into("<H", b, pos + 8, 16)
        with _pytest.raises(NotImplementedError):
            _decode_tiff(bytes(b))
        assert image_feature_row(2, bytes(b))["media_type"] == "unsupported"
        row = image_feature_row(3, good)
        assert row["media_type"] == "image/tiff" and row["thumb_hash"]

    def test_gif_malformed_isolates(self):
        import pytest as _pytest

        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _decode_gif,
            image_feature_row,
            synth_gif,
        )

        good = synth_gif(6)
        img_sep = good.index(b"\x21\xf9") + 8  # block after the GCE
        assert good[img_sep] == 0x2C
        for bad in (
            good[:-8],  # torn data sub-blocks
            good[:12],  # torn header
            b"GIF89a" + b"\x00" * 7 + b"\x3b",  # trailer, no image
            good[:img_sep] + b"\x7f" + good[img_sep + 1 :],  # bad block id
        ):
            with _pytest.raises(ValueError):
                _decode_gif(bad)
            assert image_feature_row(1, bad)["media_type"] == "unsupported"
        row = image_feature_row(2, good)
        assert row["media_type"] == "image/gif" and row["sum_r"] > 0

    def test_png_decompression_bomb_bounded(self):
        """A bomb PNG (tiny declared dims, megabytes of inflatable
        IDAT) must fail as ValueError after at most raster+1 inflated
        bytes — never materialize the full stream (MemoryError would
        escape the per-row isolation net)."""
        import struct as _s
        import zlib as _z

        import pytest as _pytest

        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _PNG_SIG,
            _decode_png,
            _png_chunk,
            image_feature_row,
        )

        ihdr = _s.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)  # 2x1 RGB: 7 raw bytes
        bomb_idat = _z.compress(b"\x00" * (64 << 20), 9)  # 64 MB -> ~64 KB
        p = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", bomb_idat)
            + _png_chunk(b"IEND", b"")
        )
        with _pytest.raises(ValueError, match="raster size"):
            _decode_png(p)
        assert image_feature_row(1, p)["media_type"] == "unsupported"

    def test_png_feature_rows_through_spark(self, spark):
        """The synthetic media corpus now carries real PNGs and JPEGs:
        the Spark image_features output must contain decoded image/png
        and image/jpeg rows whose channel sums equal the pure-Python
        twin, plus 'unsupported' rows for the junk and the 16-bit PNG
        plant."""
        import __spark_entry__ as em
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            image_feature_row,
            synth_media_payload,
        )

        out = {
            r["media_id"]: r.asDict()
            for r in em._q_image_features(spark, SF0001).collect()
        }
        kinds = {r["media_type"] for r in out.values()}
        assert "image/png" in kinds and "unsupported" in kinds
        assert "image/jpeg" in kinds and "image/gif" in kinds
        for mid, row in out.items():
            exp = image_feature_row(mid, synth_media_payload(mid))
            assert row == exp, mid

    def test_mp3_header_metadata(self):
        """Real MPEG-1 Layer III frame-header walk: exact frame-count
        duration, ID3v2 skip, honest None energy; torn/foreign streams
        isolate."""
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            _MP3_RATES,
            _MP3_SAMPLES_PER_FRAME,
            audio_feature_row,
            parse_mp3_headers,
            synth_mp3,
        )

        for seed, frames, id3 in ((4, 5, True), (7, 3, False), (9, 6, True)):
            a = parse_mp3_headers(synth_mp3(seed, n_frames=frames, with_id3=id3))
            rate = _MP3_RATES[seed % 3]
            assert a["media_type"] == "audio/mpeg"
            assert a["sample_rate"] == rate
            assert a["channels"] == (1 if seed % 2 else 2)
            assert a["duration_ms"] == (
                frames * _MP3_SAMPLES_PER_FRAME * 1000
            ) // rate
            assert a["energy"] is None and a["n_samples"] is None
        # ID3v2.4 FOOTER flag (0x10): the tag occupies 10+size+10
        # bytes; the parser must skip the footer or the sync scan
        # starts on it (review r7)
        body = synth_mp3(4, n_frames=3, with_id3=False)
        tag = b"ft"
        footer_tagged = (
            b"ID3\x04\x00\x10"
            + bytes((0, 0, 0, len(tag)))
            + tag
            + b"3DI\x04\x00\x10"
            + bytes((0, 0, 0, len(tag)))
            + body
        )
        a = parse_mp3_headers(footer_tagged)
        assert a["duration_ms"] == parse_mp3_headers(body)["duration_ms"]
        # torn final frame: fully parsed frames are kept
        full = synth_mp3(4, n_frames=5, with_id3=False)
        torn = parse_mp3_headers(full[:-40])
        assert torn["duration_ms"] < parse_mp3_headers(full)["duration_ms"]
        # junk / malformed isolate as unsupported rows
        assert (
            audio_feature_row(1, b"ID3\x04\x00compressed-mp3-not-decodable")[
                "media_type"
            ]
            == "unsupported"
        )
        assert audio_feature_row(2, b"\xff\xe0junk")["media_type"] == "unsupported"
        # MPEG-2 version bits gate (NotImplementedError -> unsupported)
        mpeg2 = bytes((0xFF, 0xF3, 0x90, 0x00)) + b"\x00" * 200
        assert audio_feature_row(3, mpeg2)["media_type"] == "unsupported"
        # the corpus plants parse through the feature row
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            synth_audio_payload,
        )

        kinds = set()
        for doc_id in range(0, 500):
            kinds.add(
                audio_feature_row(doc_id, synth_audio_payload(doc_id))[
                    "media_type"
                ]
            )
        assert kinds == {"audio/wav", "audio/mpeg", "unsupported"}

    def test_mp4_container_probe(self, spark):
        """Real ISO-BMFF box walk: mvhd duration, trak count, first
        visual track resolution; junk isolates; the Spark operator
        matches the pure-Python row."""
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            parse_mp4_boxes,
            synth_mp4,
            video_feature_row,
            video_features,
        )

        v = parse_mp4_boxes(synth_mp4(4, n_tracks=2))
        assert v["media_type"] == "video/mp4"
        assert v["duration_ms"] == 2000 + (4 % 7) * 500
        assert v["n_tracks"] == 2
        assert v["width"] == 320 + (4 % 5) * 16
        assert v["height"] == 240 + (4 % 3) * 16
        # audio-only container: no visual track -> width/height None
        a = parse_mp4_boxes(synth_mp4(5, n_tracks=1, with_video_track=False))
        assert a["width"] is None and a["n_tracks"] == 1
        # unknown-duration sentinel (0xFFFFFFFF, fragmented/live files):
        # duration surfaces None, never a bogus > int32 number that
        # would fail the Arrow batch (review r7)
        import struct as _s

        g = bytearray(synth_mp4(4, n_tracks=1))
        mvhd_at = bytes(g).index(b"mvhd") + 4
        _s.pack_into(">I", g, mvhd_at + 16, 0xFFFFFFFF)
        u = parse_mp4_boxes(bytes(g))
        assert u["duration_ms"] is None and u["n_tracks"] == 1
        media_u = spark.createDataFrame(
            [(99, bytes(g))], schema="media_id long, payload binary"
        )
        assert video_features(media_u).collect()[0]["duration_ms"] is None
        # a short (lying) mvhd box must fail loudly, not read sibling
        # bytes as timing (review r7)
        g2 = bytearray(synth_mp4(4, n_tracks=1))
        m_at = bytes(g2).index(b"mvhd") - 4
        _s.pack_into(">I", g2, m_at, 12)  # shrink mvhd to a 4-byte body
        assert (
            video_feature_row(5, bytes(g2))["media_type"] == "unsupported"
        )
        # junk / torn isolate
        assert video_feature_row(1, b"notamp4")["media_type"] == "unsupported"
        assert (
            video_feature_row(2, synth_mp4(4)[:20])["media_type"]
            == "unsupported"
        )
        assert video_feature_row(3, None)["media_type"] == "unsupported"
        # distributed == pure-Python, mixed corpus
        rows = [
            (i, synth_mp4(i) if i % 3 else b"junk" + bytes(8))
            for i in range(24)
        ]
        media = spark.createDataFrame(
            rows, schema="media_id long, payload binary"
        )
        got = {
            r["media_id"]: r.asDict() for r in video_features(media).collect()
        }
        for i, payload in rows:
            assert got[i] == video_feature_row(i, payload), i

    def test_thumbnail_deterministic_and_sized(self):
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            decode_image,
            grayscale_thumb,
            synth_bmp,
        )

        img = decode_image(synth_bmp(11))
        t1, t2 = grayscale_thumb(img), grayscale_thumb(img)
        assert t1 == t2 and len(t1) == 64

    def test_spark_operator_matches_pure_python(self, spark):
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            image_feature_row,
            image_features,
            synth_bmp,
            synth_ppm,
        )

        payloads = [
            (0, synth_bmp(0)),
            (1, synth_ppm(1)),
            (2, b"\x89PNG\r\n\x1a\nzz"),
        ]
        media = spark.createDataFrame(payloads, ["media_id", "payload"])
        got = {r["media_id"]: r.asDict() for r in image_features(media).collect()}
        for mid, payload in payloads:
            assert got[mid] == image_feature_row(mid, payload)


class TestAudioDecode:
    def test_wav_round_trip(self):
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            decode_wav,
            synth_wav,
        )

        a = decode_wav(synth_wav(9, n_samples=800, rate=8000))
        assert a["media_type"] == "audio/wav"
        assert a["sample_rate"] == 8000 and a["channels"] == 1
        assert a["n_samples"] == 800
        assert a["duration_ms"] == 100  # 800 frames at 8 kHz
        assert a["energy"] > 0

    def test_wav_isolation(self):
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            audio_feature_row,
            synth_wav,
        )

        assert audio_feature_row(1, b"ID3\x04mp3")["media_type"] == "unsupported"
        assert audio_feature_row(2, b"")["media_type"] == "unsupported"
        assert audio_feature_row(3, synth_wav(3)[:30])["media_type"] == "unsupported"

    def test_spark_audio_operator_matches_pure_python(self, spark):
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            audio_feature_row,
            audio_features,
            synth_wav,
        )

        payloads = [(0, synth_wav(0)), (1, b"ID3\x04x")]
        media = spark.createDataFrame(payloads, ["media_id", "payload"])
        got = {r["media_id"]: r.asDict() for r in audio_features(media).collect()}
        for mid, payload in payloads:
            assert got[mid] == audio_feature_row(mid, payload)


def _n_persistent(spark):
    return spark.sparkContext._jsc.getPersistentRDDs().size()


class TestMinhashHotBucketCap:
    """VERDICT r02 'What's wrong #2': the MinHash band join (and the m0
    blocker) need the same hot-bucket cap simhash already has — a
    boilerplate-degenerate corpus makes k docs share a band key and the
    self-join emits k^2/2 rows inside one bucket."""

    @pytest.fixture(scope="class")
    def degenerate_docs(self, spark):
        # 30 exact copies (share ALL 4 bands) + 5 distinct docs
        rows = [(i, "the same boilerplate text repeated for every page here")
                for i in range(30)]
        rows += [(100 + i, f"unique document number {i} with its own words "
                           f"alpha{i} beta{i} gamma{i}") for i in range(5)]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_cap_cuts_degenerate_candidates(self, spark, degenerate_docs):
        from deepseek_ocr_customvllm_spark.operators import dedup

        sig = dedup.minhash_signatures(
            dedup.shingles(degenerate_docs, distinct=False)
        ).cache()
        full = dedup.lsh_candidate_pairs(sig).count()
        assert full >= 30 * 29 // 2  # the quadratic blow-up is real
        capped = dedup.lsh_candidate_pairs(sig, max_bucket=5).count()
        # the 30-copy bucket (>5 members) is dropped entirely; only
        # non-degenerate buckets may still pair
        assert capped < 30 * 29 // 2
        sig.unpersist()

    def test_cap_default_none_is_identity(self, spark, degenerate_docs):
        from deepseek_ocr_customvllm_spark.operators import dedup

        sig = dedup.minhash_signatures(
            dedup.shingles(degenerate_docs, distinct=False)
        ).cache()
        assert (
            dedup.lsh_candidate_pairs(sig).count()
            == dedup.lsh_candidate_pairs(sig, max_bucket=None).count()
        )
        sig.unpersist()

    def test_m0_blocker_cap(self, spark, degenerate_docs):
        from deepseek_ocr_customvllm_spark.operators import dedup

        full = dedup.ngram_jaccard_pairs(degenerate_docs).count()
        capped = dedup.ngram_jaccard_pairs(degenerate_docs, max_bucket=5).count()
        assert capped < full  # the 30-copy m0 bucket is gone

    def test_persist_true_releases_the_cache(self, spark, degenerate_docs):
        """persist=True must not leak executor storage UNBOUNDEDLY:
        round 8 switched the materialization from localCheckpoint to
        the SQL cache (lazy, partitioning-preserving, shared by both
        self-join sides), which pins exactly two enumerable tables
        (shingles + signatures).  The contract is now: bounded, exposed
        on ``_graft_caches``, and fully releasable via
        ``release_caches`` once the result is materialized."""
        from deepseek_ocr_customvllm_spark.operators import dedup

        before = _n_persistent(spark)
        out = dedup.minhash_lsh_duplicates(degenerate_docs, persist=True)
        assert out.count() > 0
        assert len(out._graft_caches) == 2
        assert _n_persistent(spark) <= before + 2
        dedup.release_caches(out)
        assert _n_persistent(spark) <= before
        out2 = dedup.ngram_jaccard_pairs(degenerate_docs, persist=True)
        out2.count()
        assert _n_persistent(spark) <= before + 1


class TestDuplicateComponents:
    def test_checkpoint_blocks_do_not_accumulate(self, spark):
        """A 12-round propagation must end with O(1) persistent RDDs, not
        one per round (VERDICT r02 ADVICE: each round's localCheckpoint
        blocks previously accumulated for up to max_iter rounds)."""
        from deepseek_ocr_customvllm_spark.operators.dedup import (
            duplicate_components,
        )

        before = _n_persistent(spark)
        pairs = spark.createDataFrame(
            [(k + 1, k) for k in range(1, 14)], ["id_a", "id_b"]
        )
        duplicate_components(pairs).count()
        # only the final labels checkpoint (the returned data) may remain
        assert _n_persistent(spark) <= before + 1

    def test_max_iter_exceeded_raises(self, spark):
        from deepseek_ocr_customvllm_spark.operators.dedup import (
            duplicate_components,
        )

        pairs = spark.createDataFrame(
            [(k + 1, k) for k in range(1, 14)], ["id_a", "id_b"]
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            duplicate_components(pairs, max_iter=3)

    def test_chain_triangle_and_pair(self, spark):
        """A 5-node chain (needs several propagation rounds), a triangle,
        and an isolated pair must each collapse to min-id components."""
        from deepseek_ocr_customvllm_spark.operators.dedup import (
            duplicate_components,
        )

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5),      # chain
             (10, 11), (11, 12), (10, 12),        # triangle
             (20, 21)],                           # pair
            ["id_a", "id_b"],
        )
        got = {
            r["doc_id"]: r["component_id"]
            for r in duplicate_components(pairs).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                       10: 10, 11: 10, 12: 10,
                       20: 20, 21: 20}

    def test_long_path_converges(self, spark):
        from deepseek_ocr_customvllm_spark.operators.dedup import (
            duplicate_components,
        )

        # path of 12 nodes ordered so the min label must travel the whole
        # diameter (worst case for propagation-round count)
        pairs = spark.createDataFrame(
            [(k + 1, k) for k in range(1, 12)], ["id_a", "id_b"]
        )
        got = {
            r["doc_id"]: r["component_id"]
            for r in duplicate_components(pairs).collect()
        }
        assert set(got.values()) == {1} and len(got) == 12


def _union_find_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonicalize to min member per component
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    return {x: root for root, xs in comp.items() for x in xs}


class TestComponentsModel:
    def test_random_graphs_match_union_find(self, spark):
        """Random edge sets: the distributed min-label propagation must
        agree with a plain union-find model."""
        import random

        rng = random.Random(816)
        for trial in range(3):
            n = rng.randint(5, 30)
            edges = [
                (rng.randint(0, n), rng.randint(0, n))
                for _ in range(rng.randint(1, 25))
            ]
            edges = [(a, b) for a, b in edges if a != b]
            if not edges:
                continue
            from deepseek_ocr_customvllm_spark.operators.dedup import (
                duplicate_components,
            )

            pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
            got = {
                r["doc_id"]: r["component_id"]
                for r in duplicate_components(pairs).collect()
            }
            assert got == _union_find_components(edges), f"trial {trial}: {edges}"


class TestStreamingCorpusOps:
    def test_corpus_filter_runs_on_a_stream(self, spark, tmpdir):
        """The corpus keep/drop pass is stateless, so it must compose with
        Structured Streaming unchanged (same operator object, readStream
        source) and agree with the batch result."""
        from deepseek_ocr_customvllm_spark.operators.textstats import corpus_filter

        landing = os.path.join(tmpdir, "landing")
        docs = spark.read.parquet(os.path.join(SF0001, "documents.parquet"))
        docs.write.parquet(landing)
        batch = {r["doc_id"]: r["reason"] for r in corpus_filter(docs).collect()}

        stream = spark.readStream.schema(docs.schema).parquet(landing)
        out_dir = os.path.join(tmpdir, "out")
        q = (
            corpus_filter(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        streamed = {
            r["doc_id"]: r["reason"] for r in spark.read.parquet(out_dir).collect()
        }
        assert streamed == batch


class TestScalarUdfTier:
    """SURVEY §2.9: the standalone scalar pandas_udf wrappers must agree
    byte-for-byte with the pure functions the fused stage calls."""

    def test_udfs_match_direct_calls(self, spark):
        from deepseek_ocr_customvllm_spark.extractor.blocks import parse_blocks
        from deepseek_ocr_customvllm_spark.extractor.markdown import clean_page
        from deepseek_ocr_customvllm_spark.extractor.tags import (
            resolve_tags_document,
        )
        from deepseek_ocr_customvllm_spark.operators.extract import _superset_block
        from deepseek_ocr_customvllm_spark.operators.udfs import (
            blocks_from_text,
            clean_markdown,
            clean_page_udf,
        )

        texts = [
            "# H\npara text here",
            "<|ref|>image<|/ref|><|det|>[[1, 2, 3, 4]]<|/det|> body \\eqqcolon x",
            "| a | 1 |\n| total | 1 |",
            "",
            "<｜end▁of▁sentence｜>",
        ]
        rows = [(i, t, f"doc{i:08x}0000") for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, ["i", "text", "doc_id"])
        got = {
            r["i"]: r
            for r in df.select(
                "i",
                clean_markdown(F.col("text"), F.col("doc_id")).alias("clean"),
                clean_page_udf(F.col("text")).alias("page"),
                blocks_from_text(F.col("text"), F.col("doc_id")).alias("blocks"),
            ).collect()
        }
        for i, t in enumerate(texts):
            did = f"doc{i:08x}0000"
            assert got[i]["clean"] == resolve_tags_document(t, did)
            assert got[i]["page"] == clean_page(t, 0)[0]
            expected_blocks = [
                _superset_block(b)
                for b in parse_blocks(resolve_tags_document(t, did))
            ]
            got_blocks = [r.asDict(recursive=True) for r in (got[i]["blocks"] or [])]
            assert got_blocks == expected_blocks


class TestPurgeAll:
    def test_purging_every_url_leaves_a_readable_table(self, spark, tmpdir):
        from deepseek_ocr_customvllm_spark.job import purge_urls, read_extracted

        pages = synth_pages_df(spark, 20)
        run_extraction_job(spark, pages, tmpdir, num_partitions=2, max_bytes=MAXB)
        all_urls = pages.select("url")
        removed = purge_urls(spark, tmpdir, all_urls)
        assert removed == 20
        # the emptied table must still read (explicit schema, no inference)
        assert read_extracted(spark, tmpdir).count() == 0
        # and re-ingestion works from scratch
        m = run_extraction_job(spark, pages, tmpdir, num_partitions=2, max_bytes=MAXB)
        assert m["rows_extracted"] == 20


class TestStreamingStateMerge:
    """foreachBatch MERGE with the per-batch idempotence ledger: the
    streaming face of the batch job's exactly-once contract."""

    def test_stream_merges_state_and_resume_skips(self, spark, tmpdir):
        from deepseek_ocr_customvllm_spark.plans.state import ParquetStateStore
        from deepseek_ocr_customvllm_spark.streaming.extract_stream import (
            run_stream_with_state,
        )

        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        synth_pages_df(spark, 25, num_partitions=1).write.parquet(
            os.path.join(landing, "b1")
        )
        n = run_stream_with_state(
            spark,
            landing + "/*",
            os.path.join(tmpdir, "out"),
            os.path.join(tmpdir, "ckpt"),
            os.path.join(tmpdir, "state"),
        )
        assert n == 25
        store = ParquetStateStore(spark, os.path.join(tmpdir, "state"))
        state = store.read().collect()
        assert len(state) == 25
        assert all(r["attempt"] == 1 for r in state)  # exactly once
        # a SECOND drain with no new files must not touch the state
        v_before = store.current_version()
        run_stream_with_state(
            spark,
            landing + "/*",
            os.path.join(tmpdir, "out"),
            os.path.join(tmpdir, "ckpt"),
            os.path.join(tmpdir, "state"),
        )
        assert store.current_version() == v_before

    def test_replayed_batch_id_is_skipped(self, spark, tmpdir):
        """Simulated foreachBatch replay (restart between sink side
        effects and checkpoint commit): the same batch_id MERGEd twice
        must leave attempt == 1; the NEXT batch_id increments."""
        import datetime

        from deepseek_ocr_customvllm_spark.plans.state import ParquetStateStore

        store = ParquetStateStore(spark, os.path.join(tmpdir, "state"), n_buckets=8)
        rows = [("u1", "SUCCESS", datetime.datetime(2026, 1, 1))]
        batch = spark.createDataFrame(rows, ["url", "status", "updated_at"])
        store.merge(batch, stream_id="s", batch_id=0)
        store.merge(batch, stream_id="s", batch_id=0)  # replay
        assert [r["attempt"] for r in store.read().collect()] == [1]
        assert store.last_applied("s") == 0
        store.merge(batch, stream_id="s", batch_id=1)  # genuinely new batch
        assert [r["attempt"] for r in store.read().collect()] == [2]
        # ledger survives an unrelated (batch-API) merge in between
        store.merge(
            spark.createDataFrame(
                [("u2", "SUCCESS", datetime.datetime(2026, 1, 2))],
                ["url", "status", "updated_at"],
            )
        )
        assert store.last_applied("s") == 1
        store.merge(batch, stream_id="s", batch_id=1)  # stale replay again
        assert sorted(r["attempt"] for r in store.read().collect()) == [1, 2]


class TestSecondReviewRegressions:
    """Round-3 second-review findings, pinned."""

    def test_checkpoint_loss_replay_does_not_duplicate_output(self, spark, tmpdir):
        """Losing the stream checkpoint (but not the state/out dirs)
        replays every batch from id 0 — the ledger must suppress BOTH
        the data append and the merge, leaving out_dir row counts and
        attempts unchanged."""
        import shutil as _sh

        from deepseek_ocr_customvllm_spark.plans.state import ParquetStateStore
        from deepseek_ocr_customvllm_spark.streaming.extract_stream import (
            run_stream_with_state,
        )

        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        synth_pages_df(spark, 20, num_partitions=1).write.parquet(
            os.path.join(landing, "b1")
        )
        args = (
            landing + "/*",
            os.path.join(tmpdir, "out"),
            os.path.join(tmpdir, "ckpt"),
            os.path.join(tmpdir, "state"),
        )
        assert run_stream_with_state(spark, *args) == 20
        _sh.rmtree(os.path.join(tmpdir, "ckpt"))  # lose the checkpoint
        assert run_stream_with_state(spark, *args) == 20  # NOT 40
        store = ParquetStateStore(spark, os.path.join(tmpdir, "state"))
        assert all(r["attempt"] == 1 for r in store.read().collect())

    def test_checkpoint_loss_with_new_file_does_not_remap(self, spark, tmpdir):
        """Checkpoint loss AND a new landing file: replay batch ids no
        longer match the original run's.  The content-keyed ledger must
        skip the already-extracted file whatever id it gets, extract
        ONLY the new file, and leave the original output partition
        intact (a batch-id key would clobber it with the wrong data)."""
        import shutil as _sh

        from deepseek_ocr_customvllm_spark.plans.state import ParquetStateStore
        from deepseek_ocr_customvllm_spark.streaming.extract_stream import (
            run_stream_with_state,
        )

        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        synth_pages_df(spark, 10, num_partitions=1).write.parquet(
            os.path.join(landing, "b1")
        )
        args = (
            landing + "/*",
            os.path.join(tmpdir, "out"),
            os.path.join(tmpdir, "ckpt"),
            os.path.join(tmpdir, "state"),
        )
        assert run_stream_with_state(spark, *args) == 10
        _sh.rmtree(os.path.join(tmpdir, "ckpt"))
        synth_pages_df(spark, 25, num_partitions=1).filter(
            "url like '%1_'"  # urls 10-19: disjoint from the first file
        ).write.parquet(os.path.join(landing, "b2"))
        n = run_stream_with_state(spark, *args)
        assert n == 20  # 10 original + 10 new, nothing twice
        store = ParquetStateStore(spark, os.path.join(tmpdir, "state"))
        assert all(r["attempt"] == 1 for r in store.read().collect())
        assert store.read().count() == 20

    def test_corrected_content_same_urls_reextracts(self, spark, tmpdir):
        """ADVICE r6: a landing file republishing the SAME urls and
        warc_ts with DIFFERENT html is a correction, not a replay — the
        content key includes the html bytes, so it must re-extract
        (attempt == 2), while a byte-identical republish still skips."""
        from deepseek_ocr_customvllm_spark.plans.state import ParquetStateStore
        from deepseek_ocr_customvllm_spark.streaming.extract_stream import (
            run_stream_with_state,
        )

        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        pages = synth_pages_df(spark, 10, num_partitions=1)
        pages.write.parquet(os.path.join(landing, "b1"))
        args = (
            landing + "/*",
            os.path.join(tmpdir, "out"),
            os.path.join(tmpdir, "ckpt"),
            os.path.join(tmpdir, "state"),
        )
        assert run_stream_with_state(spark, *args) == 10
        # corrected republish: same urls/warc_ts, different html bytes
        pages.withColumn(
            "html",
            F.concat(F.col("html"), F.lit(b"<!-- corrected -->")),
        ).write.parquet(os.path.join(landing, "b2"))
        run_stream_with_state(spark, *args)
        store = ParquetStateStore(spark, os.path.join(tmpdir, "state"))
        state = store.read().collect()
        assert len(state) == 10
        assert all(r["attempt"] == 2 for r in state)
        # byte-identical republish of the correction: a true replay,
        # must skip (attempts unchanged)
        pages.withColumn(
            "html",
            F.concat(F.col("html"), F.lit(b"<!-- corrected -->")),
        ).write.parquet(os.path.join(landing, "b3"))
        run_stream_with_state(spark, *args)
        assert all(
            r["attempt"] == 2
            for r in ParquetStateStore(
                spark, os.path.join(tmpdir, "state")
            ).read().collect()
        )

    def test_empty_landing_returns_zero(self, spark, tmpdir):
        from deepseek_ocr_customvllm_spark.streaming.extract_stream import (
            run_stream_with_state,
        )

        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        assert (
            run_stream_with_state(
                spark,
                landing,
                os.path.join(tmpdir, "out"),
                os.path.join(tmpdir, "ckpt"),
                os.path.join(tmpdir, "state"),
            )
            == 0
        )

    def test_merge_rejects_half_a_ledger_key(self, spark, tmpdir):
        import datetime

        store = ParquetStateStore(spark, os.path.join(tmpdir, "state"))
        batch = spark.createDataFrame(
            [("u", "SUCCESS", datetime.datetime(2026, 1, 1))],
            ["url", "status", "updated_at"],
        )
        with pytest.raises(ValueError, match="together"):
            store.merge(batch, stream_id="s")
        with pytest.raises(ValueError, match="together"):
            store.merge(batch, batch_id=3)

    def test_kmeans_handles_sparse_nonzero_vec_ids(self, spark):
        from deepseek_ocr_customvllm_spark.operators.similarity import (
            kmeans_clusters,
        )

        emb = (
            spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
            .filter(F.col("vec_id") % 3 == 1)  # sparse, never 0
            .withColumn("vec_id", F.col("vec_id") + 1000)
        )
        out = kmeans_clusters(emb, k=4, n_iter=1).collect()
        assert len(out) == emb.count()
        assert {r["cluster"] for r in out} <= set(range(4))

    def test_kmeans_requires_k_vectors(self, spark):
        from deepseek_ocr_customvllm_spark.operators.similarity import (
            kmeans_clusters,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).limit(3)
        with pytest.raises(ValueError, match="k-means needs"):
            kmeans_clusters(emb, k=8)

    def test_single_shared_shingle_is_one_hit(self, spark):
        """One 3-gram shared with MANY eval docs is ONE overlap, not
        many: the doc must fall below min_hits=2."""
        from deepseek_ocr_customvllm_spark.operators.dedup import (
            contaminated_docs,
        )

        train = spark.createDataFrame(
            [(1, "unique words here then magic token phrase closing out")],
            ["doc_id", "text"],
        )
        eval_docs = spark.createDataFrame(
            [(100 + i, f"magic token phrase variant {i} padding words")
             for i in range(4)],
            ["doc_id", "text"],
        )
        assert contaminated_docs(train, eval_docs, min_hits=2).count() == 0
        got = contaminated_docs(train, eval_docs, min_hits=1).collect()
        assert len(got) == 1
        assert got[0]["n_hits"] == 1 and got[0]["n_eval_docs"] == 4


class TestKmeansModel:
    def test_distributed_matches_sequential_lloyds(self, spark):
        """The distributed rounds must agree exactly with a sequential
        pure-Python Lloyd's on the SAME quantized vectors (third opinion
        next to the unrolled-CTE oracle: this one checks the distributed
        assignment/update machinery, not the SQL)."""
        from deepseek_ocr_customvllm_spark.operators.similarity import (
            _tz_div,
            kmeans_clusters,
            quantized,
        )

        k, n_iter = 4, 2
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).filter(F.col("vec_id") < 120)
        q = {
            r["vec_id"]: list(r["qe"])
            for r in quantized(emb).select("vec_id", "qe").collect()
        }

        def assign(centroids):
            out = {}
            for vid, v in q.items():
                key = min(
                    sum((a - b) * (a - b) for a, b in zip(v, c)) * k + j
                    for j, c in enumerate(centroids)
                )
                out[vid] = (key % k, key // k)
            return out

        centroids = [list(q[i]) for i in sorted(q)[:k]]
        for _ in range(n_iter):
            a = assign(centroids)
            sums: dict = {}
            for vid, (c, _d) in a.items():
                s, n = sums.setdefault(c, ([0] * len(q[vid]), 0))
                for d, v in enumerate(q[vid]):
                    s[d] += v
                sums[c] = (s, n + 1)
            for c, (s, n) in sums.items():
                centroids[c] = [_tz_div(x, n) for x in s]
        expected = assign(centroids)

        got = {
            r["vec_id"]: (r["cluster"], r["dist"])
            for r in kmeans_clusters(emb, k=k, n_iter=n_iter).collect()
        }
        assert got == expected


class TestEncryptedPdfThroughSparkPath:
    """Encrypted PDFs ride the full distributed path: the fused
    mapInPandas extraction stage must transparently decrypt
    empty-password files (byte-identical rows vs the plaintext twin) and
    quarantine password-protected ones as FAILED — per-row isolation,
    never a task death."""

    def test_extract_pages_decrypts_and_quarantines(self, spark):
        import datetime

        from tests.test_pdf_crypt import _Cipher, _build_doc

        from deepseek_ocr_customvllm_spark.operators.extract import (
            extract_pages,
        )

        plain = _build_doc()
        ts = datetime.datetime(2024, 1, 1)
        rows = [
            ("https://ex.org/plain.pdf", ts, plain),
            ("https://ex.org/rc4.pdf", ts, _build_doc(_Cipher("rc4-128"))),
            ("https://ex.org/aes.pdf", ts, _build_doc(_Cipher("aes-128"))),
            ("https://ex.org/locked.pdf", ts,
             _build_doc(_Cipher("aes-128", user_pw=b"secret"))),
        ]
        df = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary"
        )
        out = {
            r["url"]: r
            for r in extract_pages(df, num_partitions=2).collect()
        }
        ref = out["https://ex.org/plain.pdf"]
        assert ref["status"] == "SUCCESS" and ref["n_pages"] == 2
        for u in ("https://ex.org/rc4.pdf", "https://ex.org/aes.pdf"):
            assert out[u]["status"] == "SUCCESS"
            assert out[u]["markdown_raw"] == ref["markdown_raw"]
            assert out[u]["markdown"] == ref["markdown"]
        locked = out["https://ex.org/locked.pdf"]
        assert locked["status"] == "FAILED"
        assert "encrypted" in (locked["error"] or "")


class TestDedupSpansApply:
    def test_keeper_keeps_others_lose_covered_tokens(self, spark):
        from deepseek_ocr_customvllm_spark.operators.dedup import (
            dedup_spans_apply,
        )

        shared = " ".join(f"w{i}" for i in range(20))
        rows = [
            (1, f"alpha {shared} omega"),
            (2, f"intro {shared} outro tail"),
            (3, "totally unrelated text"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in dedup_spans_apply(df).collect()}
        # doc 1 (min doc_id) keeps everything
        assert out[1]["text"] == f"alpha {shared} omega"
        assert out[1]["n_dropped"] == 0
        # doc 2 loses exactly the 20 covered tokens, keeps its frame
        assert out[2]["text"] == "intro outro tail"
        assert out[2]["n_dropped"] == 20
        assert out[2]["n_kept"] == 3
        # untouched doc passes through normalized
        assert out[3]["text"] == "totally unrelated text"
        assert out[3]["n_dropped"] == 0


class TestLengthReportStrategies:
    """Round-5: the histogram path must compute the IDENTICAL report as
    the window path — same exact ranks — including ties, singleton
    languages, and n where (n+1) div 2 == (9n) div 10."""

    def _compare(self, spark, rows):
        from deepseek_ocr_customvllm_spark.operators.textstats import (
            corpus_length_report,
        )

        df = spark.createDataFrame(
            rows, "doc_id long, lang string, n_chars long"
        )
        key = lambda r: r["lang"]
        a = sorted(
            corpus_length_report(df, mode="window").collect(), key=key
        )
        b = sorted(
            corpus_length_report(df, mode="histogram").collect(), key=key
        )
        assert [r.asDict() for r in a] == [r.asDict() for r in b]
        return a

    def test_equal_on_real_table(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import (
            corpus_length_report,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        key = lambda r: r["lang"]
        a = sorted(corpus_length_report(docs, mode="window").collect(), key=key)
        b = sorted(
            corpus_length_report(docs, mode="histogram").collect(), key=key
        )
        assert [r.asDict() for r in a] == [r.asDict() for r in b]

    def test_equal_on_adversarial_shapes(self, spark):
        rows = []
        # heavy ties: 30 docs all length 7
        rows += [(i, "aa", 7) for i in range(30)]
        # singleton language
        rows += [(100, "bb", 42)]
        # two docs (median rank 1, p90 rank 1)
        rows += [(200, "cc", 5), (201, "cc", 9)]
        # spread with duplicates at the rank boundaries
        rows += [(300 + i, "dd", v) for i, v in enumerate(
            [1, 1, 2, 2, 2, 3, 9, 9, 10, 10]
        )]
        got = {r["lang"]: r for r in self._compare(spark, rows)}
        assert got["aa"]["median_chars"] == 7 and got["aa"]["p90_chars"] == 7
        assert got["bb"]["median_chars"] == 42
        assert got["cc"]["median_chars"] == 5  # rank (2+1) div 2 = 1
        assert got["dd"]["median_chars"] == 2  # rank 5 of 10
        assert got["dd"]["p90_chars"] == 10  # rank 9 of 10

    def test_equal_randomized(self, spark):
        import random

        rng = random.Random(5)
        for trial in range(5):
            rows = [
                (i, f"l{rng.randrange(4)}", rng.randrange(1, 30))
                for i in range(rng.randrange(1, 120))
            ]
            self._compare(spark, rows)


class TestClusteredAnnRecall:
    """Round-5: the clustered corpus is the regime the approximate ANN
    tiers are built for — recall must clear the deployment bar there
    (IVF >= 0.8), while the random corpus stays the honest worst case."""

    def test_clustered_recall_clears_bar(self, spark):
        from deepseek_ocr_customvllm_spark.operators import similarity

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cl = similarity.clustered_embeddings(emb)
        rep = {
            r["method"]: r for r in similarity.ann_recall_report(cl).collect()
        }
        assert float(rep["ivf"]["recall"]) >= 0.8
        assert float(rep["lsh"]["recall"]) >= 0.5
        # and the derived corpus kept every vector
        assert cl.count() == emb.count()

    def test_clustered_embeddings_deterministic_and_typed(self, spark):
        from deepseek_ocr_customvllm_spark.operators import similarity

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        a = similarity.clustered_embeddings(emb).orderBy("vec_id").limit(5).collect()
        b = similarity.clustered_embeddings(emb).orderBy("vec_id").limit(5).collect()
        assert [r["embedding"] for r in a] == [r["embedding"] for r in b]
        # quantization round-trips exactly (values are k/1000 doubles)
        from pyspark.sql import functions as F
        q = similarity.quantized(similarity.clustered_embeddings(emb))
        bad = q.filter(
            F.expr(
                "exists(zip_with(embedding, qe, (x, y) ->"
                " abs(x * 1000 - y) > 1e-6), b -> b)"
            )
        ).count()
        assert bad == 0


class TestDedupRecallReport:
    """Round-5: pair recall of the approximate dedup tiers vs the
    exhaustive shingle-join Jaccard truth (the dedup acceptance metric,
    twin of the ANN recall report)."""

    def test_recall_bars_on_planted_corpus(self, spark):
        import __spark_entry__ as em

        rows = {
            r["method"]: r
            for r in em.queries()["dedup_recall_report"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        mh, sh = rows["minhash_lsh"], rows["simhash"]
        x2 = rows["simhash_x2"]
        assert mh["n_truth"] == sh["n_truth"] == x2["n_truth"] > 0
        # the banded production tier must find every planted pair here
        assert float(mh["recall"]) == 1.0
        # the bit-signature tier trades recall for cost — measured, and
        # bounded below so a silent collapse would fail the suite
        assert 0.5 <= float(sh["recall"]) <= 1.0
        # the two-signature tier dominates the single one (a union can
        # only add hits) and stays bounded below
        assert float(x2["recall"]) >= float(sh["recall"])
        assert x2["n_hits"] >= sh["n_hits"]
        assert 0.8 <= float(x2["recall"]) <= 1.0
        # in-sample precision: every found pair is a true pair
        assert mh["n_hits"] == mh["n_found"]

    def test_subset_keeps_planted_pairs(self, spark):
        """sub_mod must divide the planted-duplicate id offsets, or the
        ground truth loses its guaranteed hits."""
        assert 1000000 % 4 == 0 and 2000000 % 4 == 0

    def test_zero_truth_corpus_yields_zero_recall_not_null(self, spark):
        """A corpus with no ground-truth pairs must report recall 0.0
        (greatest(n_truth, 1) guard), never NULL / division-by-zero —
        the engines diverge without the guard."""
        from deepseek_ocr_customvllm_spark.operators import dedup

        docs = spark.createDataFrame(
            [(i, " ".join(f"w{i}x{j}" for j in range(40)))
             for i in range(8)],
            "doc_id bigint, text string",
        )
        for r in dedup.dedup_recall_report(docs).collect():
            assert r["n_truth"] == 0
            assert r["recall"] is not None and float(r["recall"]) == 0.0


class TestSemDeDup:
    """Round-5: SemDeDup pruning (Abbas et al. 2023) against its
    planted ground truth — every twin pair drops exactly one member,
    the keeper is the farther-from-centroid one, and a corpus without
    planted twins drops nothing (no false positives at the frozen
    threshold)."""

    def test_planted_twins_drop_exactly_one_member_each(self, spark):
        from deepseek_ocr_customvllm_spark.operators import similarity

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        corpus = similarity.semdedup_corpus(
            similarity.clustered_embeddings(emb)
        )
        dropped = {
            r["vec_id"]: r
            for r in similarity.semdedup_prune(corpus).collect()
        }
        bases = [
            r["vec_id"]
            for r in emb.filter(
                F.col("vec_id") % similarity.TWIN_MOD == similarity.TWIN_RES
            ).collect()
        ]
        assert len(dropped) == len(bases) > 0
        # distances under the frozen codebook, for the keeper check
        q = similarity.quantized(corpus).select("vec_id", "qe")
        dists = {
            r["vec_id"]: r["dist"]
            for r in similarity._assign_clusters(
                q, similarity.lattice_centroids(), similarity.SYNTH_CLUSTERS
            ).collect()
        }
        for b in bases:
            t = b + similarity.TWIN_OFFSET
            assert (b in dropped) != (t in dropped)  # exactly one
            lose = b if b in dropped else t
            keep = t if b in dropped else b
            # keeper rule: the kept member beats the dropped one on
            # (dist, -vec_id) — farthest from centroid survives
            assert (dists[keep], -keep) > (dists[lose], -lose)
            assert dropped[lose]["n_dup_partners"] == 1

    def test_no_false_positives_without_twins(self, spark):
        from deepseek_ocr_customvllm_spark.operators import similarity

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        assert (
            similarity.semdedup_prune(
                similarity.clustered_embeddings(emb)
            ).count()
            == 0
        )


class TestIncrementalDedup:
    """Round-5: snapshot-vs-corpus dedup against planted truth — every
    planted duplicate in the new snapshot drops against the old corpus
    (verified exhaustively at sf0.001), exact duplicates verify at
    Jaccard 1.0, and no fresh (reversed-text) row is ever dropped."""

    def test_planted_drops_and_fresh_survival(self, spark):
        import __spark_entry__ as em

        rows = {
            r["doc_id"]: r
            for r in em.queries()["dedup_incremental"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        near = {
            r["doc_id"] + 1_000_000
            for r in docs.filter(F.col("doc_id") % 37 == 0).collect()
        }
        exact = {
            r["doc_id"] + 2_000_000
            for r in docs.filter(F.col("doc_id") % 41 == 0).collect()
        }
        # the targeted diagnostic first: set-equality below subsumes it
        # but would mask WHICH failure happened
        assert not any(d >= 3_000_000 for d in rows), "fresh doc dropped"
        assert set(rows) == near | exact  # all planted drop, nothing else
        for d in exact:
            assert rows[d]["max_jaccard"] == 1.0
            assert rows[d]["first_old_id"] <= d - 2_000_000
        for d in near:
            assert 0.5 <= rows[d]["max_jaccard"] < 1.0

    def test_cap_applies_to_old_side_only(self, spark):
        """The hot-bucket cap must drop only OLD-side buckets: a new doc
        duplicating a k-member boilerplate family in the old corpus is
        not matched once k exceeds the cap (every band bucket of that
        family has k members), while a new doc duplicating a UNIQUE old
        doc still matches under the same cap — and with the cap off,
        both match."""
        from deepseek_ocr_customvllm_spark.operators import dedup

        boiler = "the same boilerplate page body repeated verbatim " * 4
        uniq = "a one of a kind page about something quite specific " * 4
        rows = [(i, boiler) for i in range(10)]  # old: 10-member family
        rows.append((20, uniq))  # old: unique doc
        rows.append((1_000_000, boiler))  # new: dup of the family
        rows.append((1_000_001, uniq))  # new: dup of the unique doc
        df = spark.createDataFrame(rows, "doc_id long, text string")

        capped = {
            r["doc_id"]: r
            for r in dedup.incremental_dedup(df, max_bucket=5).collect()
        }
        assert 1_000_001 in capped  # unique-doc buckets (size 1) survive
        assert 1_000_000 not in capped  # family buckets (size 10) capped

        uncapped = {
            r["doc_id"]: r for r in dedup.incremental_dedup(df).collect()
        }
        assert set(uncapped) == {1_000_000, 1_000_001}
        assert uncapped[1_000_000]["n_old_matches"] == 10
        assert uncapped[1_000_000]["max_jaccard"] == 1.0


class TestVerticalAndType3ThroughSparkPath:
    """Round-5 extraction features ride the full distributed path: a
    WMode-1 (Identity-V) column and a Type3 /FontMatrix page must
    extract through the fused mapInPandas stage exactly as they do
    through the direct API — per-row, no task death."""

    def test_extract_pages_vertical_and_type3(self, spark):
        import datetime

        from deepseek_ocr_customvllm_spark.operators.extract import (
            extract_pages,
        )

        from tests.test_pdf_structure import _obj, _stream_obj

        _stream = _stream_obj  # correct /Length computed by the helper
        cmap = _stream(
            8,
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"2 beginbfchar <0001> <0041> <0002> <0042> endbfchar\n",
        )
        vertical = (
            b"%PDF-1.5\n"
            + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
            + _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
                      b" /MediaBox [0 0 612 792] >>")
            + _obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R"
                      b" /Resources << /Font << /F1 9 0 R >> >> >>")
            + _stream(5, b"BT /F1 12 Tf 1 0 0 1 300 700 Tm"
                         b" <0001> Tj <0002> Tj ET")
            + _obj(9, b"<< /Type /Font /Subtype /Type0 /BaseFont /X"
                      b" /Encoding /Identity-V /ToUnicode 8 0 R >>")
            + cmap
            + b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
        )
        type3 = (
            b"%PDF-1.4\n"
            + _obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
            + _obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1"
                      b" /MediaBox [0 0 612 792] >>")
            + _obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R"
                      b" /Resources << /Font << /F1 9 0 R >> >> >>")
            + _stream(5, b"BT /F1 10 Tf 1 0 0 1 100 700 Tm (A) Tj (B) Tj"
                         b" 1 0 0 1 200 700 Tm (M) Tj ET")
            + _obj(9, b"<< /Type /Font /Subtype /Type3"
                      b" /FontMatrix [0.048 0 0 0.048 0 0]"
                      b" /FirstChar 65 /LastChar 67 /Widths [500 500 500]"
                      b" /CharProcs << >> >>")
            + b"trailer\n<< /Size 10 /Root 1 0 R >>\n%%EOF\n"
        )
        ts = datetime.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                ("https://ex.org/vertical.pdf", ts, vertical),
                ("https://ex.org/type3.pdf", ts, type3),
            ],
            "url string, warc_ts timestamp, html binary",
        )
        out = {
            r["url"]: r
            for r in extract_pages(df, num_partitions=2).collect()
        }
        v = out["https://ex.org/vertical.pdf"]
        assert v["status"] == "SUCCESS"
        assert "A\nB" in v["markdown_raw"]  # column reads top-down
        t = out["https://ex.org/type3.pdf"]
        assert t["status"] == "SUCCESS"
        assert "A M B" in t["markdown_raw"]  # FontMatrix-scaled x order


class TestDedupJobDefaults:
    """The production entry point (dedup_job) must run with the SCALE
    knobs on by default — the hot-bucket cap active, unlike the
    oracle-compared registry path which pins exact recall (NOTES.md
    "scale-knob defaults" rule, round 6)."""

    def test_default_cap_is_on_and_active(self, spark):
        from deepseek_ocr_customvllm_spark import dedup_job
        from deepseek_ocr_customvllm_spark.operators import dedup

        assert dedup_job.DEFAULT_MAX_BUCKET is not None

        # a degenerate corpus: one boilerplate bucket larger than a
        # small cap; under the cap that bucket produces no candidates
        rows = [(i, "the same boilerplate text repeated for every page "
                    "here") for i in range(30)]
        rows += [(100 + i, f"unique document number {i} with its own "
                           f"words alpha{i} beta{i} gamma{i}")
                 for i in range(5)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        capped = dedup_job.run_dedup_job(docs, max_bucket=5)
        uncapped = dedup_job.run_dedup_job(docs, max_bucket=None)
        # uncapped: the 30-clone cluster collapses to 1 canonical doc;
        # capped: its bucket is dropped, the clones all survive — the
        # cap is demonstrably wired through the job path
        assert uncapped.count() == 1 + 5
        assert capped.count() == 30 + 5

    def test_keep_best_policy_wired_through_job(self, spark):
        """--keep best must survive the higher-quality cluster member
        (agreeing with dedup.dedup_keep_best), while the default keeps
        min doc_id."""
        from deepseek_ocr_customvllm_spark import dedup_job

        stop = "the and of a to in"
        base = " ".join(f"tok{j}" for j in range(38))
        docs = spark.createDataFrame(
            [
                (1, base + " xx yy"),
                (2, base + " xx yy " + " ".join([stop] * 12)),
                (3, "completely unrelated fresh document body here now"),
            ],
            ["doc_id", "text"],
        )
        kept_min = {
            r.doc_id for r in dedup_job.run_dedup_job(docs).collect()
        }
        kept_best = {
            r.doc_id
            for r in dedup_job.run_dedup_job(docs, keep="best").collect()
        }
        assert kept_min == {1, 3}
        assert kept_best == {2, 3}
        with pytest.raises(ValueError, match="keep"):
            dedup_job.run_dedup_job(docs, keep="newest")

    def test_job_default_keeps_registry_semantics_on_clean_corpus(
        self, spark
    ):
        """On a corpus without degenerate buckets the production
        default (cap=100) and the exact-recall path agree exactly."""
        from deepseek_ocr_customvllm_spark import dedup_job

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        a = sorted(r.doc_id for r in dedup_job.run_dedup_job(docs).collect())
        b = sorted(
            r.doc_id
            for r in dedup_job.run_dedup_job(docs, max_bucket=None).collect()
        )
        assert a == b and len(a) > 0


class TestIncrementalDedupStream:
    """Streaming incremental near-dup dedup (round 6): micro-batches
    band against the accumulated store under the exactly-once ledger —
    no duplicate admissions across restarts, near-dups of previously
    admitted docs drop, fresh docs survive."""

    @staticmethod
    def _doc(i, words, mutate_at=None):
        toks = [f"w{i % 3}x{j}" if j == mutate_at else f"base{j}"
                for j in range(words)]
        return (i, " ".join(toks))

    def _mk_docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_two_batches_then_checkpoint_loss_replay(self, spark, tmpdir):
        import shutil as _sh

        from deepseek_ocr_customvllm_spark.plans.state import (
            ParquetStateStore,
        )
        from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
            run_incremental_dedup_stream,
        )

        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        base = " ".join(f"base{j}" for j in range(40))
        near = " ".join(
            (f"mut{j}" if j == 0 else f"base{j}") for j in range(40)
        )
        fresh1 = " ".join(f"uno{j}" for j in range(40))
        fresh2 = " ".join(f"dos{j}" for j in range(40))
        # batch 1: 10=base, 11=near-dup of 10 (in-batch), 12=fresh
        self._mk_docs(
            spark, [(10, base), (11, near), (12, fresh1)]
        ).coalesce(1).write.parquet(os.path.join(landing, "b1"))
        args = (
            landing + "/*",
            os.path.join(tmpdir, "out"),
            os.path.join(tmpdir, "ckpt"),
            os.path.join(tmpdir, "store"),
            os.path.join(tmpdir, "state"),
        )
        n = run_incremental_dedup_stream(spark, *args)
        assert n == 2  # 11 dropped against 10 (lower id wins)
        admitted1 = {
            r.doc_id
            for r in spark.read.parquet(os.path.join(tmpdir, "out")).collect()
        }
        assert admitted1 == {10, 12}

        # batch 2: 20=exact dup of base, 21=near-dup of base, 22=fresh
        self._mk_docs(
            spark, [(20, base), (21, near), (22, fresh2)]
        ).coalesce(1).write.parquet(os.path.join(landing, "b2"))
        n = run_incremental_dedup_stream(spark, *args)
        out = spark.read.parquet(os.path.join(tmpdir, "out"))
        admitted = {r.doc_id for r in out.collect()}
        assert admitted == {10, 12, 22}, admitted  # 20/21 drop vs store
        assert out.count() == 3

        # ledger: every admitted doc exactly once
        store = ParquetStateStore(spark, os.path.join(tmpdir, "state"))
        state = {r["url"]: r["attempt"] for r in store.read().collect()}
        assert state == {"10": 1, "12": 1, "22": 1}

        # checkpoint loss: full replay from batch 0 must change NOTHING
        _sh.rmtree(os.path.join(tmpdir, "ckpt"))
        run_incremental_dedup_stream(spark, *args)
        out2 = spark.read.parquet(os.path.join(tmpdir, "out"))
        assert {r.doc_id for r in out2.collect()} == {10, 12, 22}
        assert out2.count() == 3  # no duplicate admissions
        state2 = {
            r["url"]: r["attempt"]
            for r in ParquetStateStore(
                spark, os.path.join(tmpdir, "state")
            ).read().collect()
        }
        assert state2 == state  # attempts unchanged: ledger suppressed

        # bounded durable state: the store holds rows only for ADMITTED
        # docs (dropped docs contribute nothing)
        bands = spark.read.parquet(os.path.join(tmpdir, "store", "bands"))
        assert {r.doc_id for r in bands.select("doc_id").distinct().collect()} == {
            10, 12, 22,
        }

    def test_empty_landing_returns_zero(self, spark, tmpdir):
        from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
            run_incremental_dedup_stream,
        )

        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        assert (
            run_incremental_dedup_stream(
                spark,
                landing,
                os.path.join(tmpdir, "out"),
                os.path.join(tmpdir, "ckpt"),
                os.path.join(tmpdir, "store"),
                os.path.join(tmpdir, "state"),
            )
            == 0
        )

    def test_checkpoint_loss_with_new_file_remaps_batch_ids(
        self, spark, tmpdir
    ):
        """The failure mode a batch-id-keyed ledger cannot survive:
        checkpoint loss AND a new landing file, so the replay assigns
        batch ids that no longer match the original run's.  The
        content-keyed ledger must skip the two already-admitted files
        (whatever ids they get now), process ONLY the new file, dedup
        it against the accumulated store, and leave every previously
        admitted output partition untouched."""
        import shutil as _sh

        from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
            run_incremental_dedup_stream,
        )

        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        base = " ".join(f"base{j}" for j in range(40))
        near = " ".join(
            (f"mut{j}" if j == 0 else f"base{j}") for j in range(40)
        )
        fresh1 = " ".join(f"uno{j}" for j in range(40))
        fresh2 = " ".join(f"dos{j}" for j in range(40))
        self._mk_docs(spark, [(10, base)]).coalesce(1).write.parquet(
            os.path.join(landing, "b1")
        )
        args = (
            landing + "/*",
            os.path.join(tmpdir, "out"),
            os.path.join(tmpdir, "ckpt"),
            os.path.join(tmpdir, "store"),
            os.path.join(tmpdir, "state"),
        )
        run_incremental_dedup_stream(spark, *args)
        self._mk_docs(spark, [(20, fresh1)]).coalesce(1).write.parquet(
            os.path.join(landing, "b2")
        )
        run_incremental_dedup_stream(spark, *args)
        out = os.path.join(tmpdir, "out")
        assert {r.doc_id for r in spark.read.parquet(out).collect()} == {
            10, 20,
        }

        # checkpoint loss + a THIRD file (30 = near-dup of committed
        # base, 31 = genuinely fresh) lands before the replay: batch
        # numbering restarts and no longer matches the original run
        _sh.rmtree(os.path.join(tmpdir, "ckpt"))
        self._mk_docs(
            spark, [(30, near), (31, fresh2)]
        ).coalesce(1).write.parquet(os.path.join(landing, "b3"))
        n = run_incremental_dedup_stream(spark, *args)
        admitted = {r.doc_id for r in spark.read.parquet(out).collect()}
        # 30 dropped against the store's base doc; 31 admitted; the two
        # replayed files admitted nothing twice and clobbered nothing
        assert admitted == {10, 20, 31}, admitted
        assert n == 3

    def test_fully_dropped_batch_advances_ledger(self, spark, tmpdir):
        """A micro-batch whose every doc drops against the store must
        still commit its content key: otherwise each restart replays it
        in full, forever."""
        import shutil as _sh

        from deepseek_ocr_customvllm_spark.plans.state import (
            ParquetStateStore,
        )
        from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
            INCR_STREAM_ID,
            run_incremental_dedup_stream,
        )

        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        base = " ".join(f"base{j}" for j in range(40))
        self._mk_docs(spark, [(10, base)]).coalesce(1).write.parquet(
            os.path.join(landing, "b1")
        )
        args = (
            landing + "/*",
            os.path.join(tmpdir, "out"),
            os.path.join(tmpdir, "ckpt"),
            os.path.join(tmpdir, "store"),
            os.path.join(tmpdir, "state"),
        )
        run_incremental_dedup_stream(spark, *args)
        # an exact duplicate file: everything drops, nothing admitted
        self._mk_docs(spark, [(40, base)]).coalesce(1).write.parquet(
            os.path.join(landing, "b2")
        )
        assert run_incremental_dedup_stream(spark, *args) == 1
        store = ParquetStateStore(spark, os.path.join(tmpdir, "state"))
        keys = [
            k
            for k in store.applied_map()
            if k.startswith(INCR_STREAM_ID + ":")
        ]
        assert len(keys) == 2, keys  # BOTH batches committed
        # checkpoint loss: the fully-dropped batch must not re-execute
        # into a different conclusion (and nothing admits twice)
        _sh.rmtree(os.path.join(tmpdir, "ckpt"))
        assert run_incremental_dedup_stream(spark, *args) == 1
        state = {
            r["url"]: r["attempt"] for r in store.read().collect()
        }
        assert state == {"10": 1}


class TestIncrementalStoreCompaction:
    """Round-7 store maintenance: compact_incremental_store folds the
    per-batch band/shingle partitions into one compacted partition —
    the periodic operation that bounds the sink's old-side path list
    (deep-history smoke, BASELINE.md r7) — without changing a single
    dedup decision, surviving replays, crashes, and re-compaction."""

    @staticmethod
    def _mk_docs(spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _texts(self):
        base = " ".join(f"base{j}" for j in range(40))
        near = " ".join(
            (f"mut{j}" if j == 0 else f"base{j}") for j in range(40)
        )
        fresh1 = " ".join(f"uno{j}" for j in range(40))
        fresh2 = " ".join(f"dos{j}" for j in range(40))
        return base, near, fresh1, fresh2

    def test_compaction_preserves_semantics_and_folds_dirs(
        self, spark, tmpdir
    ):
        from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
            compact_incremental_store,
            run_incremental_dedup_stream,
        )

        base, near, fresh1, fresh2 = self._texts()
        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        store_dir = os.path.join(tmpdir, "store")
        state_dir = os.path.join(tmpdir, "state")
        args = (
            landing + "/*",
            os.path.join(tmpdir, "out"),
            os.path.join(tmpdir, "ckpt"),
            store_dir,
            state_dir,
        )
        self._mk_docs(
            spark, [(10, base), (11, near), (12, fresh1)]
        ).coalesce(1).write.parquet(os.path.join(landing, "b1"))
        assert run_incremental_dedup_stream(spark, *args) == 2

        stats = compact_incremental_store(spark, store_dir, state_dir)
        assert stats["compacted"] and stats["partition"] == "compacted-0001"
        assert stats["pending_keys"] == 1
        # DEFERRED sweep: the folded batch dir survives this cycle (an
        # in-flight reader may still be scanning it); the compacted
        # partition is live alongside it
        for sub in ("bands", "shingles"):
            entries = sorted(os.listdir(os.path.join(store_dir, sub)))
            assert len(entries) == 2 and "batch=compacted-0001" in entries, (
                sub, entries,
            )
        cpart = os.path.join(store_dir, "bands", "batch=compacted-0001")
        assert {
            r.doc_id
            for r in spark.read.parquet(cpart).select("doc_id").collect()
        } == {10, 12}

        # a new batch dedups against the COMPACTED store identically:
        # exact + near dups of the folded base drop, fresh admits
        self._mk_docs(
            spark, [(20, base), (21, near), (22, fresh2)]
        ).coalesce(1).write.parquet(os.path.join(landing, "b2"))
        run_incremental_dedup_stream(spark, *args)
        out = spark.read.parquet(os.path.join(tmpdir, "out"))
        assert {r.doc_id for r in out.collect()} == {10, 12, 22}

        # second compaction: sweeps cycle-1's supersession (the folded
        # b1 dir), folds the new batch into compacted-0002, defers
        # sweeping compacted-0001 and the b2 dir to the next cycle
        stats2 = compact_incremental_store(spark, store_dir, state_dir)
        assert stats2["compacted"] and stats2["partition"] == "compacted-0002"
        assert stats2["swept_dirs"] == 2  # b1's dir in bands + shingles
        for sub in ("bands", "shingles"):
            entries = sorted(os.listdir(os.path.join(store_dir, sub)))
            assert "batch=compacted-0002" in entries
            assert "batch=compacted-0001" in entries  # deferred
            assert len(entries) == 3, (sub, entries)  # + b2's batch dir
        cpart2 = os.path.join(store_dir, "bands", "batch=compacted-0002")
        assert {
            r.doc_id
            for r in spark.read.parquet(cpart2).select("doc_id").collect()
        } == {10, 12, 22}

        # third call: nothing pending — pure cleanup of cycle-2's
        # supersessions, leaving exactly the live partition per table
        stats3 = compact_incremental_store(spark, store_dir, state_dir)
        assert not stats3["compacted"] and stats3["pending_keys"] == 0
        assert stats3["swept_dirs"] == 4  # compacted-0001 + b2 dir, x2
        for sub in ("bands", "shingles"):
            entries = sorted(os.listdir(os.path.join(store_dir, sub)))
            assert entries == ["batch=compacted-0002"], (sub, entries)

    def test_checkpoint_loss_replay_after_compaction(self, spark, tmpdir):
        import shutil as _sh

        from deepseek_ocr_customvllm_spark.plans.state import (
            ParquetStateStore,
        )
        from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
            compact_incremental_store,
            run_incremental_dedup_stream,
        )

        base, near, fresh1, fresh2 = self._texts()
        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        store_dir = os.path.join(tmpdir, "store")
        state_dir = os.path.join(tmpdir, "state")
        args = (
            landing + "/*",
            os.path.join(tmpdir, "out"),
            os.path.join(tmpdir, "ckpt"),
            store_dir,
            state_dir,
        )
        self._mk_docs(spark, [(10, base), (12, fresh1)]).coalesce(
            1
        ).write.parquet(os.path.join(landing, "b1"))
        run_incremental_dedup_stream(spark, *args)
        compact_incremental_store(spark, store_dir, state_dir)
        # checkpoint loss + a new file: the replayed batch skips by
        # content (its data now resolves to the compacted partition),
        # the new file dedups against the compacted store
        _sh.rmtree(os.path.join(tmpdir, "ckpt"))
        self._mk_docs(
            spark, [(30, near), (31, fresh2)]
        ).coalesce(1).write.parquet(os.path.join(landing, "b2"))
        assert run_incremental_dedup_stream(spark, *args) == 3
        out = spark.read.parquet(os.path.join(tmpdir, "out"))
        assert {r.doc_id for r in out.collect()} == {10, 12, 31}
        state = {
            r["url"]: r["attempt"]
            for r in ParquetStateStore(spark, state_dir).read().collect()
        }
        assert state == {"10": 1, "12": 1, "31": 1}

    def test_maintenance_cli_compacts(self, spark, tmpdir):
        """The maintenance_job CLI drives compaction end-to-end and
        prints the stats JSON line."""
        import contextlib
        import io
        import json as _json

        from deepseek_ocr_customvllm_spark import maintenance_job
        from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
            run_incremental_dedup_stream,
        )

        base, _, _, _ = self._texts()
        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        self._mk_docs(spark, [(10, base)]).coalesce(1).write.parquet(
            os.path.join(landing, "b1")
        )
        run_incremental_dedup_stream(
            spark,
            landing + "/*",
            os.path.join(tmpdir, "out"),
            os.path.join(tmpdir, "ckpt"),
            os.path.join(tmpdir, "store"),
            os.path.join(tmpdir, "state"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            maintenance_job.main(
                [
                    "--store", os.path.join(tmpdir, "store"),
                    "--state", os.path.join(tmpdir, "state"),
                    "--master", "local[4]",
                ]
            )
        out = _json.loads(buf.getvalue().strip())
        assert out["compacted"] and out["partition"] == "compacted-0001"
        assert out["job"] == "compact_incremental_store"

    def test_crash_before_manifest_commit_is_invisible(self, spark, tmpdir):
        """Orphan compacted dirs from a crash BEFORE the manifest swap
        must be ignored by the sink and overwritten by the next
        compaction."""
        import shutil as _sh

        from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
            compact_incremental_store,
            run_incremental_dedup_stream,
        )

        base, near, fresh1, fresh2 = self._texts()
        landing = os.path.join(tmpdir, "landing")
        os.makedirs(landing)
        store_dir = os.path.join(tmpdir, "store")
        state_dir = os.path.join(tmpdir, "state")
        args = (
            landing + "/*",
            os.path.join(tmpdir, "out"),
            os.path.join(tmpdir, "ckpt"),
            store_dir,
            state_dir,
        )
        self._mk_docs(spark, [(10, base)]).coalesce(1).write.parquet(
            os.path.join(landing, "b1")
        )
        run_incremental_dedup_stream(spark, *args)
        # simulate the crash window: compacted data dirs written with
        # GARBAGE content, but no manifest — unreferenced, must not be
        # read by anything
        for sub in ("bands", "shingles"):
            d = os.path.join(store_dir, sub)
            real = [e for e in os.listdir(d) if e.startswith("batch=")][0]
            orphan = os.path.join(d, "batch=compacted-0001")
            _sh.copytree(os.path.join(d, real), orphan)
        # the sink ignores the orphan (no manifest): a near-dup batch
        # still drops against the ledger-resolved partitions only
        self._mk_docs(spark, [(20, near), (21, fresh1)]).coalesce(
            1
        ).write.parquet(os.path.join(landing, "b2"))
        assert run_incremental_dedup_stream(spark, *args) == 2
        # the retried compaction overwrites the orphan and commits
        stats = compact_incremental_store(spark, store_dir, state_dir)
        assert stats["compacted"] and stats["partition"] == "compacted-0001"
        bands = spark.read.parquet(os.path.join(store_dir, "bands"))
        assert {
            r.doc_id for r in bands.select("doc_id").distinct().collect()
        } == {10, 21}


class TestDedupRetentionAndTelemetry:
    """Round-6 retention + telemetry family: quality-priority keeper,
    per-domain dup rate, cross-snapshot re-crawl curve."""

    def test_keep_best_keeps_higher_quality_not_lower_id(self, spark):
        from deepseek_ocr_customvllm_spark.operators import dedup, textstats

        # 1 and 2 are near-duplicates; 2 (the LATER crawl) has richer
        # text -> higher quality score, so the min-id policy and the
        # keep-best policy disagree on purpose
        stop = "the and of a to in"
        base = " ".join(f"tok{j}" for j in range(38))
        docs = spark.createDataFrame(
            [
                (1, base + " xx yy"),
                (2, base + " xx yy " + " ".join([stop] * 12)),
                (3, "completely unrelated fresh document body here now"),
            ],
            ["doc_id", "text"],
        )
        quality = textstats.quality_scores(docs).select(
            "doc_id", "quality_score"
        )
        qmap = {r.doc_id: r.quality_score for r in quality.collect()}
        assert qmap[2] > qmap[1]  # the later copy really is better
        kept = {r.doc_id for r in dedup.dedup_keep_best(docs, quality).collect()}
        assert kept == {2, 3}, kept  # min-id would have kept 1

    def test_keep_best_tie_breaks_to_min_id(self, spark):
        from deepseek_ocr_customvllm_spark.operators import dedup, textstats

        base = " ".join(f"tok{j}" for j in range(40))
        docs = spark.createDataFrame(
            [(7, base), (8, base)], ["doc_id", "text"]  # exact copies
        )
        quality = textstats.quality_scores(docs).select(
            "doc_id", "quality_score"
        )
        kept = {r.doc_id for r in dedup.dedup_keep_best(docs, quality).collect()}
        assert kept == {7}

    def test_keep_best_partial_quality_cannot_exempt_or_lose_docs(
        self, spark
    ):
        """A cluster member MISSING from the quality frame must still be
        droppable (sentinel rank below every scored member), and an
        unscored doc outside any cluster must survive with a NULL score
        — a partial quality frame neither exempts nor loses docs."""
        from deepseek_ocr_customvllm_spark.operators import dedup

        base = " ".join(f"tok{j}" for j in range(40))
        docs = spark.createDataFrame(
            [(4, base), (5, base),
             (6, "lonely unscored unique document body words here")],
            ["doc_id", "text"],
        )
        quality = spark.createDataFrame(
            [(4, 0.5)], ["doc_id", "quality_score"]  # 5 and 6 unscored
        )
        kept = {
            r.doc_id: r.quality_score
            for r in dedup.dedup_keep_best(docs, quality).collect()
        }
        assert set(kept) == {4, 6}, kept  # 5 dropped despite no score
        assert kept[4] == 0.5 and kept[6] is None

    def test_domain_dup_report_isolates_template_farm(self, spark):
        from deepseek_ocr_customvllm_spark.operators import dedup

        tmpl = " ".join(f"boiler{j}" for j in range(40))
        rows = [(i, tmpl + f" page{i}", "farm.test") for i in range(4)]
        rows += [
            (10, " ".join(f"alpha{j}" for j in range(40)), "clean.test"),
            (11, " ".join(f"beta{j}" for j in range(40)), "clean.test"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text", "domain"])
        got = {r.domain: r for r in dedup.domain_dup_report(docs).collect()}
        assert got["farm.test"].n_dup == 3  # all but the canonical
        assert got["farm.test"].dup_frac == 0.75
        assert got["clean.test"].n_dup == 0
        assert got["clean.test"].dup_frac == 0.0

    def test_snapshot_report_counts_only_cross_dump_recrawls(self, spark):
        from deepseek_ocr_customvllm_spark.operators import dedup

        a, b, c = "alpha doc body", "beta doc body", "gamma doc body"
        docs = spark.createDataFrame(
            [
                (0, a), (1, b), (2, b),   # dump 0: 2 is a SAME-dump dup
                (100, a),                 # dump 1: re-crawl of dump 0
                (101, c),                 # dump 1: fresh
                (200, a), (201, b),       # dump 2: both re-crawls
            ],
            ["doc_id", "text"],
        )
        got = {
            r.dump: r
            for r in dedup.snapshot_dedup_report(docs, dump_size=100).collect()
        }
        assert got[0].n_redundant == 0  # same-dump dup is NOT a re-crawl
        assert got[1].n_redundant == 1 and got[1].n_docs == 2
        assert got[2].n_redundant == 2
        assert got[2].redundant_frac == 1.0


class TestDedupAuditOperators:
    """Round-6 audit family: eval-side contamination accounting,
    LSH bucket-skew telemetry, and doc-level shingle novelty."""

    def test_contamination_flags_verbatim_eval_leak(self, spark):
        from deepseek_ocr_customvllm_spark.operators import dedup

        leaked = "the quick brown fox jumps over the lazy dog tonight"
        train = spark.createDataFrame(
            [(1, leaked), (2, "completely different training words "
                              "about spark shuffles and partitions")],
            ["doc_id", "text"],
        )
        eval_docs = spark.createDataFrame(
            [(10, leaked),  # verbatim leak: overlap 1.0
             (11, "pristine held out sentence with novel vocabulary "
                  "zeta eta theta iota kappa"),
             (12, "tiny")],  # under 3 words: no shingles at all
            ["doc_id", "text"],
        )
        got = {
            r.eval_id: r
            for r in dedup.eval_contamination_report(train, eval_docs)
            .collect()
        }
        assert set(got) == {10, 11, 12}  # clean AND short rows included
        assert got[10].overlap_frac == 1.0 and got[10].is_dirty
        assert got[11].n_hit == 0 and got[11].overlap_frac == 0.0
        assert got[12].n_shingles == 0 and not got[12].is_dirty
        assert got[12].overlap_frac == 0.0
        assert not got[11].is_dirty

    def test_contamination_dirty_boundary_is_exact(self, spark):
        """Exactly 10% overlap (n_hit*10000 == dirty_bp*n_shingles)
        must flag dirty — the integer compare has no float fuzz."""
        from deepseek_ocr_customvllm_spark.operators import dedup

        # eval doc with exactly 10 distinct shingles (12 distinct words
        # in fixed order), train containing exactly its first 3-gram
        words = [f"w{i}" for i in range(12)]
        eval_docs = spark.createDataFrame(
            [(1, " ".join(words))], ["doc_id", "text"]
        )
        train = spark.createDataFrame(
            [(2, " ".join(words[:3]))], ["doc_id", "text"]
        )
        row = dedup.eval_contamination_report(
            train, eval_docs, dirty_bp=1000
        ).collect()[0]
        assert (row.n_shingles, row.n_hit) == (10, 1)
        assert row.is_dirty  # 1*10000 >= 1000*10, boundary inclusive
        assert not dedup.eval_contamination_report(
            train, eval_docs, dirty_bp=1001
        ).collect()[0].is_dirty

    def test_bucket_audit_counts_clone_cluster_arithmetically(self, spark):
        from deepseek_ocr_customvllm_spark.operators import dedup

        k = 12
        clones = [(i, "identical boilerplate page body shared by every "
                      "clone in the cluster") for i in range(k)]
        uniques = [(100 + i, f"unique document {i} alpha{i} beta{i} "
                             f"gamma{i} delta{i}") for i in range(4)]
        docs = spark.createDataFrame(clones + uniques, ["doc_id", "text"])
        rows = dedup.lsh_bucket_audit(docs, cap=5).collect()
        assert {r.band for r in rows} == set(range(dedup.N_BANDS))
        for r in rows:
            # the clone cluster shares ALL bands: one k-member bucket
            assert r.max_bucket == k
            assert r.n_docs == k + 4
            # pair volume is computed arithmetically: C(k,2) plus
            # whatever the uniques contribute (0 unless they collide)
            assert r.n_pairs_uncapped >= k * (k - 1) // 2
            # cap=5 < k: the clone bucket is over-cap in every band
            assert r.n_buckets_over_cap >= 1
            assert r.n_docs_over_cap >= k
            assert r.n_pairs_capped <= r.n_pairs_uncapped - k * (k - 1) // 2

    def test_bucket_audit_never_materializes_pairs(self, spark):
        """The audit's plan must contain no self-join — candidate
        volume is arithmetic over bucket counts (safe to run where the
        join it predicts is not)."""
        from deepseek_ocr_customvllm_spark.operators import dedup

        docs = spark.read.parquet(SF0001 + "/documents.parquet").select(
            "doc_id", "text"
        )
        plan = dedup.lsh_bucket_audit(docs)._jdf.queryExecution().toString()
        assert "Join" not in plan

    def test_novelty_copy_scores_zero_original_scores_one(self, spark):
        from deepseek_ocr_customvllm_spark.operators import dedup

        original = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [
                (1, original),
                (2, original),  # exact copy, higher id: novelty 0
                (3, "totally fresh words omega psi chi phi upsilon tau"),
                (4, "xy zz"),  # < 3 words: no shingles, absent
            ],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r for r in dedup.doc_novelty(docs).collect()}
        assert set(got) == {1, 2, 3}
        assert got[1].novelty_frac == 1.0
        assert got[2].n_novel == 0 and got[2].novelty_frac == 0.0
        assert got[3].novelty_frac == 1.0
        assert got[1].n_shingles == got[2].n_shingles == 6

    def test_simhash_salt_charset_validated(self, spark):
        """Caller-supplied salt is interpolated into SQL — the same
        safe-charset rule as curation._md5_bigint applies."""
        from deepseek_ocr_customvllm_spark.operators import dedup

        docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        with pytest.raises(ValueError, match="salt"):
            dedup.simhash_signatures(docs, salt="bad'quote")
        # the frozen x2 salt itself passes
        dedup.simhash_signatures(docs, salt=dedup.SIMHASH_X2_SALT)


class TestInvertedIndex:
    """Posting-list builder: exact df/cf over all rows, k-smallest
    posting head, bounded in-aggregation cap, one shared Exchange."""

    def test_posting_head_and_exact_stats(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import inverted_index

        rows = [(i, "common special") if i < 4 else (i, "common common") for i in range(30)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r["term"]: r for r in inverted_index(docs, k=5).collect()}
        assert set(got) == {"common", "special"}
        c = got["common"]
        # df exact over ALL docs even though the posting is capped
        assert (c["df"], c["cf"]) == (30, 4 + 26 * 2)
        assert c["posting"] == "0,1,2,3,4"  # the 5 SMALLEST doc_ids
        s = got["special"]
        assert (s["df"], s["cf"], s["posting"]) == (4, 4, "0,1,2,3")

    def test_window_and_groupby_share_one_exchange(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import inverted_index

        docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
        df = inverted_index(docs)
        plan = df.sparkSession._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # Exchange 1: the (doc_id, term) tf aggregation; Exchange 2:
        # the term key shared by the window AND the final groupBy.
        assert plan.count("Exchange (") == 2


class TestBm25TopK:
    """BM25 ranked retrieval: integer-exact Okapi/Lucene scoring, rare
    terms outrank common ones, deterministic across parallelism."""

    def test_rare_term_outranks_common(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import bm25_topk

        # 20 docs contain 'spark'; only doc 0 contains 'dup'.  Same
        # lengths, one query-term occurrence each — idf alone decides.
        rows = [(0, "dup filler filler filler")] + [
            (i, "spark filler filler filler") for i in range(1, 21)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = bm25_topk(docs, query_terms=("dup", "spark"), k=5).collect()
        assert got[0]["doc_id"] == 0  # the rare-term doc leads
        assert got[0]["score_fx"] > got[1]["score_fx"]
        # remaining ranks tie on score -> doc_id ascending
        assert [r["doc_id"] for r in got[1:]] == [1, 2, 3, 4]
        assert all(r["n_hit_terms"] == 1 for r in got)

    def test_shorter_doc_ranks_higher_at_equal_tf(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import bm25_topk

        rows = [
            (1, "dup short"),
            (2, "dup " + "filler " * 30),
            (3, "other words only"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = bm25_topk(docs, query_terms=("dup",), k=10).collect()
        assert [r["doc_id"] for r in got] == [1, 2]  # non-hits excluded
        assert got[0]["score_fx"] > got[1]["score_fx"]  # length norm

    def test_parallelism_invariant(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import bm25_topk

        rows = [
            (i, ("dup " if i % 7 == 0 else "") + "spark word " * (i % 5 + 1))
            for i in range(50)
        ]
        a = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(1)
        b = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(13)
        ra = [tuple(r) for r in bm25_topk(a, k=50).collect()]
        rb = [tuple(r) for r in bm25_topk(b, k=50).collect()]
        assert ra == rb

    def test_empty_and_no_hit_corpus(self, spark):
        from deepseek_ocr_customvllm_spark.operators.textstats import bm25_topk

        empty = spark.createDataFrame([], "doc_id bigint, text string")
        assert bm25_topk(empty).collect() == []
        miss = spark.createDataFrame([(1, "nothing relevant")], ["doc_id", "text"])
        assert bm25_topk(miss, query_terms=("absent",)).collect() == []


class TestTableProfile:
    """Generic ingestion profiler: typed min/max, exact distincts, null
    accounting, one aggregation statement."""

    def test_nulls_types_and_cardinality(self, spark):
        from deepseek_ocr_customvllm_spark.operators.profile import table_profile

        rows = [(1, "a", 10), (2, None, 9), (3, "a", None), (4, "b", 100)]
        df = spark.createDataFrame(rows, "id bigint, s string, v bigint")
        got = {r["col_name"]: r for r in table_profile(df, ["s", "v"]).collect()}
        s, v = got["s"], got["v"]
        assert (s["n_rows"], s["n_nonnull"], s["n_distinct"]) == (4, 3, 2)
        assert (s["min_val"], s["max_val"]) == ("a", "b")
        # typed min/max: 9 < 10 < 100 numerically, not lexicographically
        assert (v["min_val"], v["max_val"]) == ("9", "100")
        assert (v["n_nonnull"], v["n_distinct"]) == (3, 3)

    def test_requires_columns(self, spark):
        import pytest as _pytest
        from deepseek_ocr_customvllm_spark.operators.profile import table_profile

        df = spark.createDataFrame([(1,)], ["id"])
        with _pytest.raises(ValueError):
            table_profile(df, [])
