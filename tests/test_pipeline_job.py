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
