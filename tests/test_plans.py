"""Physical-plan assertions: the scale properties we claim must be
visible in ``explain`` output, not just intended.

- column pruning: the extraction scan must read ONLY (url, warc_ts, html)
  even though the pages table is wider
- predicate pushdown: filters on the parquet scan reach PushedFilters
- broadcast: the top-k similarity query must broadcast the query side;
  dimension joins must not shuffle the fact side twice
- whole-stage codegen: the text-stats operators stay JVM-side
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._jdf.queryExecution().explainMode()
    ) if False else df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _formatted(df) -> str:
    from pyspark.sql.functions import lit  # noqa: F401

    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_extract_scan_is_column_pruned(spark, tmp_path):
    from deepseek_ocr_customvllm_spark.operators.extract import extract_pages
    from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df

    path = str(tmp_path / "pages")
    synth_pages_df(spark, 50, num_partitions=2).write.parquet(path)
    pages = spark.read.parquet(path)
    plan = _formatted(extract_pages(pages, num_partitions=2))
    scan = plan[plan.index("Scan parquet") :]
    read_schema = scan[scan.index("ReadSchema") : scan.index("\n", scan.index("ReadSchema"))]
    assert "html" in read_schema and "url" in read_schema
    # the wide columns must NOT be read
    assert "text" not in read_schema
    assert "lang" not in read_schema


def test_filter_pushdown_on_parquet_scan(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = docs.filter(F.col("n_chars") > 450).select("doc_id", "n_chars")
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,450)]" in plan


def test_topk_similarity_broadcasts_queries(spark):
    from deepseek_ocr_customvllm_spark.operators.similarity import topk_dot_neighbors

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _formatted(topk_dot_neighbors(emb))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_top_customers_broadcasts_are_pinned(spark):
    """The /*+ BROADCAST(n, r) */ hint must survive to the physical plan
    regardless of size estimates: with auto-broadcast disabled, nation and
    region still broadcast while customer ⋈ rev stays a shuffle join (the
    large-large pair at scale)."""
    import __spark_entry__ as entrymod

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = entrymod.queries()["top_customers_per_region"](
            spark, "/root/testdata/sf0.001"
        )
        plan = _formatted(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan


def test_ivf_assign_broadcasts_and_partially_aggregates(spark):
    """Centroid scoring must broadcast the tiny centroid side, and the
    argmax must be a partial-aggregable max_by (one row per vector crosses
    the shuffle), not a window sort over the N x K scored rows."""
    from deepseek_ocr_customvllm_spark.operators.similarity import ivf_topk_neighbors

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _formatted(ivf_topk_neighbors(emb))
    assert "BroadcastExchange" in plan
    assert "partial_max_by" in plan or "partial_maxby" in plan.lower(), plan
    assert "Window" not in plan
    # column pruning: nothing but vec_id + embedding read
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>>" in plan


def test_compression_quality_is_single_scan_arrow_udf(spark):
    """The scalar pandas_udf tier: one pruned scan -> one ArrowEvalPython,
    zero shuffles (the zlib call is the only Python in the plan)."""
    from deepseek_ocr_customvllm_spark.operators.textstats import compression_quality

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _formatted(compression_quality(docs))
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_aqe_splits_skewed_join(spark):
    """Zipf-hot keys are the norm in web corpora (one domain = 40% of
    docs).  With AQE skew handling on, a sort-merge join against a hot key
    must be re-planned at runtime into skew-split partitions — this test
    pins the knob we rely on at scale (thresholds lowered so the 50k-row
    local corpus triggers it)."""
    import pyspark.sql.functions as SF

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "20KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "20KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 90% of the fact rows share one key; dim side is uniform
        fact = spark.range(0, 50_000).select(
            SF.when(SF.col("id") % 10 != 0, SF.lit(7)).otherwise(
                SF.col("id") % 100
            ).alias("k"),
            SF.concat(SF.lit("payload-"), SF.col("id")).alias("v"),
        )
        dim = spark.range(0, 100).select(
            SF.col("id").alias("k"), SF.lit("d").alias("d")
        )
        joined = fact.join(dim, "k")
        # execute THIS DataFrame's own query execution so its adaptive
        # plan finalizes (count() would execute a different wrapped plan)
        assert len(joined.collect()) == 50_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_textstats_whole_stage_codegen(spark):
    from deepseek_ocr_customvllm_spark.operators.textstats import token_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _formatted(token_counts(docs))
    assert "codegen id" in plan  # whole-stage codegen spans present
    # no Python evaluation node anywhere in the text-stats path
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_salted_repartition_is_single_shuffle(spark):
    from deepseek_ocr_customvllm_spark.operators.extract import extract_pages
    from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df

    pages = synth_pages_df(spark, 50, num_partitions=2)
    plan = _formatted(extract_pages(pages, num_partitions=4))
    # exactly one exchange node: the explicit salted repartition
    assert plan.count("Exchange (") == 1
    assert "xxhash64(url" in plan  # partitioned by url hash, not input order


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Co-bucketed url tables must join without an Exchange."""
    from deepseek_ocr_customvllm_spark.plans.bucketing import (
        bucketed_join,
        write_bucketed,
    )
    from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pages = synth_pages_df(spark, 60, num_partitions=2).select("url", "warc_ts")
        state = pages.select("url").withColumn("status", F.lit("SUCCESS"))
        write_bucketed(pages, "t_pages_b", buckets=4)
        write_bucketed(state, "t_state_b", buckets=4)
        joined = bucketed_join(spark, "t_pages_b", "t_state_b")
        plan = _formatted(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange (" not in plan  # bucket co-location, zero shuffle
        assert joined.count() == 60
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_pages_b")
        spark.sql("DROP TABLE IF EXISTS t_state_b")


def test_prebucketed_input_extracts_with_zero_shuffle(spark, tmp_path):
    """repartition=False on a bucket-laid-out input: no Exchange at all."""
    from deepseek_ocr_customvllm_spark.operators.extract import extract_pages
    from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df

    path = str(tmp_path / "pages_b")
    synth_pages_df(spark, 40, num_partitions=4).write.parquet(path)
    pages = spark.read.parquet(path)
    df = extract_pages(pages, repartition=False)
    plan = _formatted(df)
    assert "Exchange (" not in plan
    assert df.count() == 40


def test_pii_redact_is_pure_map_no_shuffle(spark):
    """PII redaction is a single narrow scan: no Exchange, no Python —
    the whole thing stays inside whole-stage codegen."""
    import __spark_entry__ as em

    df = em.queries()["pii_redact"](spark, "/root/testdata/sf0.001")
    plan = _formatted(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "codegen id" in plan  # whole-stage codegen spans the projection


def test_url_canonical_dedup_is_single_shuffle(spark):
    """Canonicalization is expression-only; the dedup adds exactly the
    one hash-aggregate exchange every dedup needs (partial_count proves
    the map-side combine)."""
    import __spark_entry__ as em

    df = em.queries()["url_canonical_dedup"](spark, "/root/testdata/sf0.001")
    plan = _formatted(df)
    # formatted mode prints each node twice (tree + detail section)
    assert plan.count(") Exchange") == 1
    assert "partial_count" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_broadcasts_the_source_count(spark):
    """The 1-row corpus-wide source count must come in as a broadcast,
    and the whole query stays JVM-side (no Python)."""
    import __spark_entry__ as em

    df = em.queries()["tfidf_top_terms"](spark, "/root/testdata/sf0.001")
    plan = _formatted(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_assignment_is_map_only(spark):
    """The k-means assignment stage must broadcast centroid LITERALS —
    zero Exchange in the whole assignment plan (only the centroid-update
    aggregations shuffle, and only k x dim rows reach the driver)."""
    from deepseek_ocr_customvllm_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = similarity.quantized(emb).select("vec_id", "qe")
    centroids = [[0] * 64 for _ in range(4)]
    plan = _formatted(similarity._assign_clusters(q, centroids, 4))
    assert ") Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_broadcasts_eval_shingles(spark):
    """The eval side is tiny by definition: its shingle set must come in
    as a broadcast, never a shuffle of the training shingles."""
    import __spark_entry__ as em

    df = em.queries()["decontaminate"](spark, "/root/testdata/sf0.001")
    plan = _formatted(df)
    assert "BroadcastHashJoin" in plan


def test_every_query_plan_is_free_of_antipatterns(spark):
    """Sweep ALL driver queries: no cartesian product and no
    row-at-a-time Python anywhere; Arrow-batched Python only in the
    operators explicitly built on that tier.  This is the systematic
    version of the per-query plan tests — a new query cannot ship with
    a degenerate plan unnoticed."""
    import __spark_entry__ as em

    # queries whose OPERATOR is the Arrow/pandas tier by design
    arrow_ok = {
        "extract_documents_pipeline", "extract_block_histogram",
        "extract_synth_summary",              # fused mapInPandas extractor
        "multimodal_inspect", "image_features", "audio_features",
        "compression_quality",                # scalar pandas_udf (zlib)
        "corpus_filter",                      # fuses the zlib signal too
        "ann_ivf_topk",                       # grouped-map on bounded clusters
        "ann_recall_report",                  # embeds the IVF tier above
        "ann_recall_clustered",               # same tiers, clustered corpus
        "warc_roundtrip",                     # mapInPandas WARC record parse
        "warc_extract_pipeline",              # WARC parse + fused extractor
        "fixture_match_report",               # fused extractor vs the Python twin
        "unicode_normalize",                  # Arrow pandas_udf NFC (no JVM builtin)
        "outlink_summary",                    # corpus from the mapInPandas pagegen;
                                              # the extraction itself is JVM regex
    }
    failures = []
    for name, fn in em.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        plan = _formatted(df)
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan:
            failures.append(f"{name}: row-at-a-time Python UDF")
        if name not in arrow_ok and (
            "ArrowEvalPython" in plan
            or "MapInPandas" in plan
            or "FlatMapGroupsInPandas" in plan
        ):
            failures.append(f"{name}: unexpected Python tier")
    assert not failures, failures


def test_domain_quota_and_length_report_single_exchange(spark):
    """Both round-4 window operators must shuffle exactly ONCE: the rank
    window and (for the report) the groupBy reuse one hash partitioning
    — a second Exchange would double the shuffle at corpus scale."""
    from deepseek_ocr_customvllm_spark.operators.textstats import (
        corpus_length_report,
        domain_quota_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for df in (domain_quota_sample(docs), corpus_length_report(docs)):
        plan = _formatted(df)
        assert plan.count("Exchange (") == 1, plan


def test_repetition_signals_stays_jvm_side(spark):
    """The gram explode/count/window pipeline must be pure JVM (no
    Python tier) and join back on doc_id without a cartesian."""
    from deepseek_ocr_customvllm_spark.operators.textstats import (
        repetition_signals,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _formatted(repetition_signals(docs))
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    # the per-doc top-1 window must run over AGGREGATED gram counts —
    # its ORDER BY key is the count aggregate (cnt), never a raw gram row
    win_detail = plan[plan.index(") Window") :]
    win_detail = win_detail[: win_detail.index("\n\n")]
    assert "cnt#" in win_detail, win_detail


def test_dedup_spans_apply_explodes_grams_once(spark):
    """The span n-gram explode is the most expensive stage of substring
    dedup; `spans` feeds two consumers and `cover` three, so WITHOUT the
    default localCheckpoint Catalyst re-runs the explode per branch.
    Pin: the default (persist=True) plan contains ZERO gram-md5
    expressions (they ran exactly once, inside the checkpoint job) while
    the lazy variant demonstrably repeats them."""
    from deepseek_ocr_customvllm_spark.operators.dedup import (
        dedup_spans_apply,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    plan_default = _formatted(dedup_spans_apply(docs, n=5))
    # the gram hash (md5 over array_join of the token slice) ran inside
    # the checkpoint jobs; the final plan reads the cover checkpoint
    # (its three consumers) and never re-derives a gram
    assert "array_join" not in plan_default
    assert plan_default.count("Scan ExistingRDD") >= 3  # cover x3 consumers

    plan_lazy = _formatted(dedup_spans_apply(docs, n=5, persist=False))
    # formatted explain prints each expression twice (tree + detail):
    # >= 4 printed occurrences == the explode exists in >= 2 branches
    assert plan_lazy.count("array_join") >= 4


def test_sequence_pack_is_one_exchange_jvm_side(spark):
    """Packing must be a single hash Exchange on shard feeding the
    per-shard running window — no Python tier, no global sort, no
    second shuffle (the shard is the only partitioning the plan needs)."""
    from deepseek_ocr_customvllm_spark.operators.curation import sequence_pack

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _formatted(sequence_pack(docs))
    assert "Python" not in plan
    assert plan.count("Exchange (") == 1, plan
    assert "hashpartitioning(shard" in plan, plan
    # the window sorts only within shards — a global Sort (singlepartition
    # / rangepartitioning) would be the corpus-wide-layout anti-pattern
    assert "rangepartitioning" not in plan


def test_dsir_select_explodes_terms_once(spark):
    """The token explode is dsir_select's expensive stage; the
    (doc_id, is_target, bucket) aggregate feeds two consumers (bucket
    distributions + per-doc scores), so WITHOUT the default
    localCheckpoint Catalyst re-runs the explode per branch.  Marker:
    the salted bucket hash literal 'dsir-v1'."""
    from deepseek_ocr_customvllm_spark.operators.curation import dsir_select

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan_default = _formatted(dsir_select(docs))
    assert "dsir-v1" not in plan_default  # ran once, inside the checkpoint
    assert plan_default.count("Scan ExistingRDD") >= 2  # feat x2 consumers
    # the 256-row ratio side must broadcast, never shuffle the scores side
    assert "BroadcastHashJoin" in plan_default or "BroadcastExchange" in plan_default

    plan_lazy = _formatted(dsir_select(docs, persist=False))
    assert plan_lazy.count("dsir-v1") >= 2  # explode exists in >= 2 branches


def test_ccnet_bucket_explodes_terms_once(spark):
    """ccnet_bucket's token explode feeds both the language model and
    the per-doc scores; the default localCheckpoint must cut the
    lineage so the explode runs once.  Marker: the Generate node
    (formatted explain prints explode as 'Generate (n)' tree lines plus
    an '(n) Generate' detail block).  The checkpointed plan reads the
    materialized counts from ExistingRDD in >= 2 branches and has no
    Generate at all; the lazy plan re-runs the explode per consumer."""
    from deepseek_ocr_customvllm_spark.operators.curation import ccnet_bucket

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan_default = _formatted(ccnet_bucket(docs))
    assert "Generate" not in plan_default
    assert plan_default.count("Scan ExistingRDD") >= 2
    # language totals (~10^2 rows) broadcast into the bits join
    assert "BroadcastHashJoin" in plan_default or "BroadcastExchange" in plan_default

    plan_lazy = _formatted(ccnet_bucket(docs, persist=False))
    assert plan_lazy.count("Generate") >= 2


def test_temperature_sample_scans_corpus_once_per_branch_cut(spark):
    """The lang-count aggregate feeds two consumers (isqrt total +
    quotas); the default localCheckpoint leaves exactly ONE corpus
    scan in the final plan (the rank window's) — formatted explain
    prints each node twice, so 1 scan == count 2.  The lazy variant
    demonstrably re-scans per branch (3 scans == count 6)."""
    from deepseek_ocr_customvllm_spark.operators.curation import (
        temperature_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan_default = _formatted(temperature_sample(docs))
    assert plan_default.count("Scan parquet") <= 2
    assert plan_default.count("Scan ExistingRDD") >= 2
    plan_lazy = _formatted(temperature_sample(docs, persist=False))
    assert plan_lazy.count("Scan parquet") >= 6


def test_semdedup_prune_joins_once_inside_checkpoints(spark):
    """semdedup_prune's expensive stages — the giant literal-codebook
    assignment and the cell-local pairwise join — must run exactly once:
    with the default checkpoints the FINAL plan contains no Join and no
    corpus scan at all (both direction projections read the
    materialized epsilon-pairs); the lazy variant demonstrably re-runs
    the join and re-scans parquet per branch."""
    from deepseek_ocr_customvllm_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = similarity.semdedup_corpus(similarity.clustered_embeddings(emb))
    plan_default = _formatted(similarity.semdedup_prune(corpus))
    assert plan_default.count("Join") == 0
    assert plan_default.count("Scan parquet") == 0
    assert plan_default.count("Scan ExistingRDD") >= 2

    plan_lazy = _formatted(similarity.semdedup_prune(corpus, persist=False))
    assert plan_lazy.count("Join") >= 2
    assert plan_lazy.count("Scan parquet") >= 4


def test_minhash_fused_shingle_table_is_one_exchange(spark):
    """Round-6 serial-floor cut: the fused pipeline's checkpointed
    shingle table (distinct shingles + carried set size) must build
    behind ONE Exchange — the explicit repartition(doc_id) satisfies
    both the (doc_id, sh) dedup and the window count.  A second
    Exchange here means Catalyst stopped recognizing the partitioning
    subsumption and the fusion silently regressed to the old cost."""
    from deepseek_ocr_customvllm_spark.operators import dedup
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    # round 8: the repartition moved BEFORE the shingle explode (ships
    # documents, not the 3x shingle stream) — same single Exchange
    raw = dedup.shingles(docs.repartition("doc_id"), distinct=False)
    pre_mat = (
        raw.dropDuplicates(["doc_id", "sh"])
        .withColumn("n", F.count("*").over(Window.partitionBy("doc_id")))
    )
    plan = _formatted(pre_mat)
    # formatted explain prints each Exchange twice (tree + detail)
    assert plan.count("Exchange") <= 2, plan

    # and the fused verify reads the persisted shingle/signature tables
    # (round 8: SQL cache instead of localCheckpoint — partitioning
    # metadata survives, and the self-join's two sides share ONE
    # materialization), never re-aggregating sizes
    out = dedup.minhash_lsh_duplicates(docs)  # persist=True default
    try:
        final = _formatted(out)
        assert "InMemoryTableScan" in final  # reads the cached tables
    finally:
        spark.catalog.clearCache()


def test_minhash_fused_matches_lazy_shape(spark):
    """The fused (persist=True) and historical lazy (persist=False)
    pipelines must agree pair-for-pair — min() over a multiset equals
    min() over its set, and the carried-n verify is value-identical to
    the sizes-join verify."""
    from deepseek_ocr_customvllm_spark.operators import dedup

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    a = sorted(map(tuple, dedup.minhash_lsh_duplicates(docs).collect()))
    b = sorted(
        map(tuple, dedup.minhash_lsh_duplicates(docs, persist=False).collect())
    )
    assert a == b


def test_bigram_surprisal_explodes_once(spark):
    """bigram_surprisal's explode feeds three consumers (bigram counts,
    first-token counts, scoring join); with the default persist=True the
    final plan must read the checkpointed bigram table and contain NO
    transform/sequence expression (the explode ran exactly once)."""
    from deepseek_ocr_customvllm_spark.operators.curation import (
        bigram_surprisal,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    plan = _formatted(bigram_surprisal(docs))
    assert "Scan ExistingRDD" in plan          # reads the checkpoint
    assert "sequence(0" not in plan, plan      # never re-derives bigrams
    lazy = _formatted(bigram_surprisal(docs, persist=False))
    assert lazy.count("sequence(0") >= 3       # the lazy shape would
