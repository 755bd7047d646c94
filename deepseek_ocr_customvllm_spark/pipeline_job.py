"""The per-dump curation pipeline as ONE spark-submit command — the
operational capstone a corpus team runs on every crawl snapshot:

    read pages -> fused extraction -> funnel gates (nonempty / lang /
    Gopher / exact-dedup canonical) -> [optional MinHash near-dup
    keeper, ``--near-dedup[=best]``] -> packed training shards
    + WET extracted-text shards + a one-line JSON telemetry report
    (funnel stage counts, near-dup cluster histogram, docs/sec).

Everything here composes operators that are individually
oracle-verified (`extract_pages`, `curation_funnel`/`funnel_apply`,
`sequence_pack_rows`, `wet_chunks`, `cluster_size_report`): the job
adds orchestration and I/O, no new semantics.  Run:

    spark-submit --driver-memory 8g \\
        --py-files dist/deepseek_ocr_customvllm_spark.zip \\
        deepseek_ocr_customvllm_spark/pipeline_job.py \\
        --synth 2000 --out /data/dump0 [--seq-len 2048] [--shards 8]

(``--driver-memory`` matters under spark-submit: the in-code
``spark.driver.memory`` in `plans.session.get_spark` cannot resize an
already-started JVM, and local mode runs every task thread inside the
driver heap — the 1g default OOMs the near-dedup stage at ~20k docs.)

Scale shape: one extraction pass (map-only after the salted
repartition), the funnel's single fingerprint Exchange, the packer's
single shard Exchange, and the WET chunker's single chunk Exchange —
four shuffles end to end, each on a different (and necessary) key.
The extracted frame feeds three consumers (funnel, packs, WET), so it
is persisted once up front.  The optional near-dedup stage adds the
banded self-join + component propagation over the (already gated)
funnel survivors — ONE MinHash pass shared by the histogram telemetry
and the keeper application.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

if __package__ in (None, ""):  # plain `python .../pipeline_job.py`
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepseek_ocr_customvllm_spark.operators.curation import (
    curation_funnel,
    funnel_apply,
    sequence_pack_rows,
    write_packed_shards,
)
from deepseek_ocr_customvllm_spark.dedup_job import drop_non_canonical
from deepseek_ocr_customvllm_spark.operators.dedup import (
    cluster_size_report,
    duplicate_components,
    minhash_lsh_duplicates,
    release_caches as dedup_release_caches,
)
from deepseek_ocr_customvllm_spark.operators.extract import extract_pages
from deepseek_ocr_customvllm_spark.plans.session import get_spark
from deepseek_ocr_customvllm_spark.sources.warc import wet_chunks


def run_pipeline(
    spark: SparkSession,
    pages_df: DataFrame,
    out_dir: str,
    num_partitions: int | None = None,
    seq_len: int = 2048,
    n_shards: int = 8,
    max_bucket: int | None = 100,
    lang_gate: bool = False,
    near_dedup: str | None = None,
    wet_chunk_bytes: int = 1 << 30,
) -> dict:
    """Extract → gate → dedup-canonicalize → pack → WET, returning the
    telemetry dict.  ``max_bucket`` follows the STANDING RULE: the
    production hot-bucket cap defaults ON for the near-dup leg (the
    funnel's exact-dedup gate needs no cap — it is an exact
    fingerprint aggregate).  ``lang_gate`` defaults OFF: the funnel's
    stopword rule is English-specific and a general dump is
    multilingual — pass ``lang_gate=True`` (CLI ``--lang-en``) for an
    English-only corpus.

    ``near_dedup`` (``None`` | ``"min_id"`` | ``"best"``) APPLIES the
    MinHash near-dup keeper between the funnel and the packer — the
    ``dedup_job`` core over the funnel survivors, so only one member of
    each near-dup cluster reaches the packed shards and the WET export.
    When enabled, ONE MinHash pass over the post-funnel corpus feeds
    BOTH the cluster-histogram telemetry and the application (the
    banded self-join is the expensive leg and must run exactly once);
    when off, the histogram is computed over the full extracted corpus
    as before and nothing near-dup is dropped (telemetry-only).

    The WET leg sizes its own chunk count from the kept corpus's total
    markdown BYTES against ``wet_chunk_bytes`` (default 1 GiB), never
    from the packing shard count (ADVICE r6): a WET chunk is assembled
    as one in-memory blob in one task, so ``n_shards`` chunks over a
    real dump would concentrate ~1/n_shards of the dump's extracted
    bytes in a single task and OOM.  The derived count is floored at
    ``n_shards`` so small corpora keep their shard layout."""
    if near_dedup not in (None, "min_id", "best"):
        raise ValueError(
            f"near_dedup must be None, 'min_id' or 'best', got {near_dedup!r}"
        )
    if wet_chunk_bytes <= 0:
        # validate up front: failing after the extract/funnel/pack legs
        # would waste the whole run and leave a partial output dir
        raise ValueError(f"wet_chunk_bytes must be > 0, got {wet_chunk_bytes}")
    t0 = time.time()
    extracted = extract_pages(pages_df, num_partitions=num_partitions)
    # Three consumers below (docs frame feeds funnel/apply/pack; the
    # SUCCESS frame feeds WET): persist the one expensive pass.
    extracted = extracted.where(F.col("status") == "SUCCESS").select(
        "url", "warc_ts", "markdown"
    ).persist()
    n_extracted = extracted.count()

    # Stable bigint doc ids from the url — deterministic at any
    # parallelism, collision-checked by the funnel's fp-keyed dedup
    # (two urls hashing together would merely dedup-compare their text).
    # The url/warc_ts columns ride along so the surviving frame feeds
    # the WET writer without a second join.
    docs = extracted.select(
        "url",
        "warc_ts",
        "markdown",
        F.xxhash64("url").alias("doc_id"),
        F.col("markdown").alias("text"),
    )
    funnel_rows = [
        r.asDict()
        for r in curation_funnel(docs, lang_gate=lang_gate).collect()
    ]
    kept = funnel_apply(docs, lang_gate=lang_gate)

    n_dedup_dropped = 0
    if near_dedup is not None:
        # One MinHash pass over the FUNNEL SURVIVORS feeds both the
        # histogram telemetry and the keeper application.  Running the
        # keeper post-funnel matters semantically: canonical selection
        # is restricted to members that survived the gates (a cluster
        # whose min-id member was gate-dropped still keeps its best
        # surviving member — anti-joining against components computed
        # over the full corpus would lose the whole cluster).
        kept_ids = kept.select("doc_id", "text")
        pairs = minhash_lsh_duplicates(kept_ids, max_bucket=max_bucket)
        comp = duplicate_components(pairs.select("id_a", "id_b"))
        hist = [r.asDict() for r in cluster_size_report(comp).collect()]
        # pre-dedup count comes from the funnel report, not a fresh
        # kept.count() — funnel_apply shares _funnel_flags with
        # curation_funnel (pinned by test), and re-counting would pay a
        # full extra fingerprint Exchange over the corpus
        n_before = funnel_rows[-1]["n_kept"] if funnel_rows else 0
        kept = drop_non_canonical(kept, comp, keep=near_dedup).persist()
        n_dedup_dropped = n_before - kept.count()
        # kept is now materialized and the dedup telemetry collected:
        # drop the MinHash pass's pinned shingle/signature caches
        dedup_release_caches(pairs)
    else:
        pairs = minhash_lsh_duplicates(
            docs.select("doc_id", "text"), max_bucket=max_bucket
        )
        hist = [
            r.asDict()
            for r in cluster_size_report(
                duplicate_components(pairs.select("id_a", "id_b"))
            ).collect()
        ]
        dedup_release_caches(pairs)
        # telemetry-only path: kept still feeds THREE actions (the pack
        # write, the markdown byte-sum, and the WET write); without a
        # persist each re-derives funnel_apply from the persisted
        # extracted frame, re-paying the funnel's fingerprint Exchange
        # up to 3x (VERDICT r07).  The near-dedup path above persists
        # its post-keeper kept the same way.
        kept = kept.persist()

    packs = sequence_pack_rows(
        kept.select("doc_id", "text"), seq_len=seq_len, n_shards=n_shards
    )
    write_packed_shards(packs, f"{out_dir}/packed")
    n_packs = spark.read.parquet(f"{out_dir}/packed").count()

    total_md_bytes = (
        kept.agg(F.sum(F.octet_length("markdown")).alias("b")).collect()[0]["b"]
        or 0
    )
    n_wet = max(n_shards, -(-total_md_bytes // wet_chunk_bytes))
    wet = wet_chunks(
        kept.select("url", "warc_ts", "markdown"), n_chunks=n_wet
    )
    wet.write.mode("overwrite").parquet(f"{out_dir}/wet")
    n_wet_chunks = spark.read.parquet(f"{out_dir}/wet").count()

    extracted.unpersist()
    kept.unpersist()
    wall = time.time() - t0
    return {
        "n_extracted": n_extracted,
        "funnel": funnel_rows,
        "n_kept": (funnel_rows[-1]["n_kept"] if funnel_rows else 0)
        - n_dedup_dropped,
        "near_dedup": near_dedup,
        "n_dedup_dropped": n_dedup_dropped,
        "dup_cluster_histogram": hist,
        "n_packs": n_packs,
        "seq_len": seq_len,
        "n_wet_chunks": n_wet_chunks,
        "wall_clock_s": round(wall, 3),
        "docs_per_sec": round(n_extracted / wall, 2) if wall > 0 else 0.0,
        "packed_path": f"{out_dir}/packed",
        "wet_path": f"{out_dir}/wet",
    }


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pages", help="input pages parquet path")
    parser.add_argument("--synth", type=int, help="generate N synthetic docs")
    parser.add_argument("--out", required=True)
    parser.add_argument("--partitions", type=int, default=None)
    parser.add_argument("--seq-len", type=int, default=2048)
    parser.add_argument("--shards", type=int, default=8)
    parser.add_argument(
        "--lang-en",
        action="store_true",
        help="enable the English stopword gate (multilingual dumps: leave off)",
    )
    parser.add_argument(
        "--exact-recall",
        action="store_true",
        help="disable the hot-bucket cap in the near-dup leg",
    )
    parser.add_argument(
        "--wet-chunk-bytes",
        type=int,
        default=1 << 30,
        help="target bytes per WET chunk; the WET chunk count is "
        "ceil(total markdown bytes / this), floored at --shards",
    )
    parser.add_argument(
        "--near-dedup",
        nargs="?",
        const="min_id",
        choices=("min_id", "best"),
        default=None,
        help="APPLY the MinHash near-dup keeper between the funnel and "
        "the packer (bare flag = min_id retention; '=best' keeps the "
        "highest-quality cluster member)",
    )
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    spark = get_spark(master=args.master)
    if args.synth:
        from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df

        pages = synth_pages_df(spark, args.synth)
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        parser.error("one of --pages / --synth is required")

    print(
        json.dumps(
            run_pipeline(
                spark,
                pages,
                args.out,
                num_partitions=args.partitions,
                seq_len=args.seq_len,
                n_shards=args.shards,
                max_bucket=None if args.exact_recall else 100,
                lang_gate=args.lang_en,
                near_dedup=args.near_dedup,
                wet_chunk_bytes=args.wet_chunk_bytes,
            )
        )
    )


if __name__ == "__main__":
    main()
