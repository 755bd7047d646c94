"""WARC-path scale smoke: encode → shard → parse → extract at 100k pages,
plus host-PageRank over a 1M-doc corpus.

The sf0.1 round-trip query (500 pages, 8 shards) cannot show what the
WARC source claims at scale: that encode stays JVM-side, blob assembly
is linear (a quadratic assembly at ~400 pages/blob would already hurt
here and be catastrophic at real shard sizes), the parse stage is
embarrassingly parallel over shards, and nothing corpus-sized lands on
the driver.  This smoke builds the synthetic corpus executor-side
(`synth_pages_df` — the driver never materializes a page), pushes it
through warc_chunks → parse_warc → extract_pages, and ASSERTS:

- record conservation: parsed row count == n_docs and parsed total
  payload bytes == source total html bytes (byte-lossless in aggregate);
- per-url byte identity on a hash-sampled ~1/64 subset (md5 join
  against the deterministic source — full identity is the oracle-backed
  sf-level check; here a sample keeps the smoke's second corpus pass
  bounded);
- extraction totals: one extracted row per page, with the SUCCESS count
  reported (synthetic corpus includes deliberate failure rows);
- driver RSS flat (reported).

The PageRank leg runs graph.host_pagerank over 1,000,000 doc_ids:
after the single corpus-cardinality collapse, 5 iterations shuffle only
host-cardinality data — wall time must not scale with iters × corpus.

Usage: python scripts/warc_scale_smoke.py [--n-docs 100000]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def rss_mb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-docs", type=int, default=100_000)
    parser.add_argument("--n-chunks", type=int, default=256)
    parser.add_argument("--pagerank-docs", type=int, default=1_000_000)
    parser.add_argument(
        "--cores",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    args = parser.parse_args()
    n_docs = args.n_docs

    from deepseek_ocr_customvllm_spark.operators import graph
    from deepseek_ocr_customvllm_spark.operators.extract import extract_pages
    from deepseek_ocr_customvllm_spark.sources import warc
    from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(
        app_name="warc_scale_smoke",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )

    results: dict = {"n_docs": n_docs, "n_chunks": args.n_chunks}

    pages = synth_pages_df(spark, n_docs, num_partitions=args.cores)
    src_totals = pages.agg(
        F.count("*").alias("n"),
        F.sum(F.length("html")).alias("b"),
    ).collect()[0]

    # --- encode + shard + parse ----------------------------------------
    t0 = time.time()
    # persist (NOT localCheckpoint: unpersist() cannot release
    # checkpoint blocks — iterate.py docstring) so the corpus really
    # leaves memory before the PageRank leg
    parsed = warc.parse_warc(
        warc.warc_chunks(pages, n_chunks=args.n_chunks)
    ).persist()
    got = parsed.agg(
        F.count("*").alias("n"),
        F.sum(F.length("html")).alias("b"),
    ).collect()[0]
    results["roundtrip_wall_s"] = round(time.time() - t0, 2)
    results["pages_per_sec"] = round(n_docs / (time.time() - t0), 1)
    results["total_payload_mb"] = round((got["b"] or 0) / 1e6, 1)
    assert got["n"] == src_totals["n"] == n_docs, (got, src_totals)
    assert got["b"] == src_totals["b"], "payload bytes not conserved"

    # --- sampled per-url byte identity ----------------------------------
    sample_pred = F.pmod(F.xxhash64("url"), F.lit(64)) == 0
    a = pages.filter(sample_pred).select("url", F.md5("html").alias("m_src"))
    b = parsed.filter(sample_pred).select("url", F.md5("html").alias("m_rt"))
    joined = a.join(b, "url", "full_outer")
    n_bad = joined.filter(
        F.col("m_src").isNull()
        | F.col("m_rt").isNull()
        | (F.col("m_src") != F.col("m_rt"))
    ).count()
    results["sampled_urls_checked"] = joined.count()
    assert results["sampled_urls_checked"] > 0
    assert n_bad == 0, f"{n_bad} sampled urls differ through the round-trip"

    # --- extraction from the parsed records ------------------------------
    t0 = time.time()
    ext = (
        extract_pages(parsed, num_partitions=args.cores)
        .groupBy("status")
        .count()
        .collect()
    )
    wall = time.time() - t0
    counts = {r["status"]: r["count"] for r in ext}
    results["extract_wall_s"] = round(wall, 2)
    results["extract_docs_per_sec"] = round(n_docs / wall, 1)
    results["extract_status_counts"] = counts
    assert sum(counts.values()) == n_docs
    assert counts.get("SUCCESS", 0) > 0.8 * n_docs
    parsed.unpersist()

    # --- PageRank over 1M docs -------------------------------------------
    docs_big = spark.range(0, args.pagerank_docs, 1, args.cores).select(
        F.col("id").alias("doc_id")
    )
    t0 = time.time()
    ranks = graph.host_pagerank(docs_big, iters=5).collect()
    results["pagerank_wall_s"] = round(time.time() - t0, 2)
    results["pagerank_hosts"] = len(ranks)
    assert len(ranks) == graph.N_HOSTS_MOD
    assert all(r["rank"] > 0 for r in ranks)

    results["driver_rss_mb"] = rss_mb()
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
