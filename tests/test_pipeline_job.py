"""End-to-end per-dump pipeline job: extraction → funnel gates →
packed shards + WET export + telemetry, all from composed
oracle-verified operators."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def test_pipeline_end_to_end(spark, tmp_path_factory):
    from deepseek_ocr_customvllm_spark.pipeline_job import run_pipeline
    from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df
    from deepseek_ocr_customvllm_spark.sources.warc import parse_warc_blob

    out = str(tmp_path_factory.mktemp("dump"))
    pages = synth_pages_df(spark, 300, num_partitions=4)
    m = run_pipeline(spark, pages, out, seq_len=256, n_shards=4)

    # funnel telemetry is internally consistent and the apply path
    # kept exactly the final stage's count
    stages = sorted(m["funnel"], key=lambda r: r["stage_idx"])
    for prev, cur in zip(stages, stages[1:]):
        assert cur["n_in"] == prev["n_kept"]
    assert m["n_kept"] == stages[-1]["n_kept"] > 0

    # every materialized pack is exactly seq_len tokens
    packs = spark.read.parquet(f"{out}/packed")
    assert packs.count() == m["n_packs"] > 0
    bad = packs.where(F.size(F.split("text", " ")) != 256).count()
    assert bad == 0

    # WET chunks parse back to exactly the kept documents' markdown
    wet_rows = spark.read.parquet(f"{out}/wet").collect()
    parsed = {}
    for r in wet_rows:
        for url, _, payload in parse_warc_blob(bytes(r["data"])):
            parsed[url] = bytes(payload)
    assert len(parsed) == m["n_kept"]

    # re-run is deterministic: same telemetry, byte-stable shards
    m2 = run_pipeline(spark, pages, out, seq_len=256, n_shards=4)
    assert m2["n_kept"] == m["n_kept"] and m2["n_packs"] == m["n_packs"]
    assert m2["funnel"] == m["funnel"]


def test_funnel_apply_matches_report(spark):
    from deepseek_ocr_customvllm_spark.operators.curation import (
        curation_funnel,
        funnel_apply,
        funnel_corpus,
    )

    docs = funnel_corpus(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    report = {
        r["stage"]: r["n_kept"] for r in curation_funnel(docs).collect()
    }
    assert funnel_apply(docs).count() == report["exact_dedup"]
    # lang-gate-off keeps everything at stage 2 but still gates 3-4
    off = {
        r["stage"]: (r["n_in"], r["n_kept"])
        for r in curation_funnel(docs, lang_gate=False).collect()
    }
    assert off["lang_en"][0] == off["lang_en"][1]
    assert funnel_apply(docs, lang_gate=False).count() == off["exact_dedup"][1]


def _near_dup_doc_corpus(spark):
    """documents rows plus a planted near-dup re-crawl for every
    doc_id % 3 == 0: same body text, new doc_id (+1000000) and thus a
    new url AND a different extracted markdown heading through
    `pages_from_documents` ("# Document <id>") — near-identical but not
    exact, so the funnel's md5 gate keeps both and only the MinHash
    stage can collapse the cluster.  The heading-only diff keeps
    Jaccard high enough that LSH banding detects every planted pair
    (appending a token tail instead pushes short docs under the
    detection floor — verified empirically)."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "source", "lang")
    near = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "text",
        "source",
        "lang",
    )
    return docs.unionByName(near)


class TestPipelineNearDedup:
    def test_planted_clusters_collapse_to_one_kept_member(
        self, spark, tmp_path_factory
    ):
        from deepseek_ocr_customvllm_spark.pipeline_job import run_pipeline
        from deepseek_ocr_customvllm_spark.sources.pages import (
            pages_from_documents,
        )
        from deepseek_ocr_customvllm_spark.sources.warc import parse_warc_blob

        pages = pages_from_documents(_near_dup_doc_corpus(spark))

        out0 = str(tmp_path_factory.mktemp("nodedup"))
        m0 = run_pipeline(spark, pages, out0, seq_len=64, n_shards=2)
        assert m0["near_dedup"] is None and m0["n_dedup_dropped"] == 0

        out1 = str(tmp_path_factory.mktemp("dedup"))
        m1 = run_pipeline(
            spark, pages, out1, seq_len=64, n_shards=2, near_dedup="best"
        )
        # the planted clusters collapsed: exactly the dropped mass
        # disappears from the kept count, and the telemetry histogram
        # (now over the post-funnel corpus) shows size-2 clusters
        assert m1["near_dedup"] == "best"
        assert m1["n_dedup_dropped"] > 0
        assert m1["n_kept"] == m0["n_kept"] - m1["n_dedup_dropped"]
        assert any(h["cluster_size"] == 2 for h in m1["dup_cluster_histogram"])

        # the WET export (same doc set as the packed shards) holds at
        # most ONE member of every planted (base, +1000000) pair
        wet_rows = spark.read.parquet(f"{out1}/wet").collect()
        kept_urls = set()
        for r in wet_rows:
            for url, _, _ in parse_warc_blob(bytes(r["data"])):
                kept_urls.add(url)
        base_rows = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .where(F.col("doc_id") % 3 == 0)
            .select("doc_id", "source")
            .collect()
        )
        n_pairs_checked = n_both = 0
        for row in base_rows:
            u_base = f"https://docs.test/{row['source']}/{row['doc_id']}"
            u_dup = (
                f"https://docs.test/{row['source']}/{row['doc_id'] + 1000000}"
            )
            if u_base in kept_urls or u_dup in kept_urls:
                n_pairs_checked += 1
                if u_base in kept_urls and u_dup in kept_urls:
                    n_both += 1
        assert n_pairs_checked > 0
        assert n_both == 0

    def test_deterministic_across_parallelism(self, spark, tmp_path_factory):
        from deepseek_ocr_customvllm_spark.pipeline_job import run_pipeline
        from deepseek_ocr_customvllm_spark.sources.pages import (
            pages_from_documents,
        )
        from deepseek_ocr_customvllm_spark.sources.warc import parse_warc_blob

        corpus = _near_dup_doc_corpus(spark)
        kept_sets = []
        for n_parts in (2, 7):
            pages = pages_from_documents(corpus).repartition(n_parts)
            out = str(tmp_path_factory.mktemp(f"par{n_parts}"))
            m = run_pipeline(
                spark, pages, out, seq_len=64, n_shards=2,
                near_dedup="min_id",
            )
            urls = set()
            for r in spark.read.parquet(f"{out}/wet").collect():
                for url, _, _ in parse_warc_blob(bytes(r["data"])):
                    urls.add(url)
            kept_sets.append((m["n_kept"], m["n_dedup_dropped"], urls))
        assert kept_sets[0] == kept_sets[1]

    def test_rejects_unknown_policy(self, spark, tmp_path_factory):
        from deepseek_ocr_customvllm_spark.pipeline_job import run_pipeline
        from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df

        with pytest.raises(ValueError, match="near_dedup"):
            run_pipeline(
                spark,
                synth_pages_df(spark, 10),
                str(tmp_path_factory.mktemp("bad")),
                near_dedup="newest",
            )


class TestWetChunkSizing:
    def test_wet_chunk_count_derived_from_bytes(self, spark, tmp_path_factory):
        """ADVICE r6: the WET leg must size its chunk count from the
        corpus bytes, not reuse the packing shard count — a tiny byte
        target forces many chunks, each bounded by roughly the target."""
        from deepseek_ocr_customvllm_spark.pipeline_job import run_pipeline
        from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df

        pages = synth_pages_df(spark, 120, num_partitions=4)
        out = str(tmp_path_factory.mktemp("wetsize"))
        m = run_pipeline(
            spark, pages, out, seq_len=64, n_shards=2,
            wet_chunk_bytes=20_000,
        )
        assert m["n_wet_chunks"] > 2  # would be 2 under the old reuse
        sizes = [
            len(bytes(r["data"]))
            for r in spark.read.parquet(f"{out}/wet").collect()
        ]
        # xxhash64 chunking is statistical, not bin-packing: allow a
        # generous factor over the target, but nothing near "whole
        # corpus in one task"
        assert max(sizes) < 20_000 * 4
        assert sum(sizes) > 20_000  # corpus genuinely exceeds one chunk

        with pytest.raises(ValueError, match="wet_chunk_bytes"):
            run_pipeline(
                spark, pages, str(tmp_path_factory.mktemp("bad")),
                wet_chunk_bytes=0,
            )
