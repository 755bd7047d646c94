"""Curation-path scale smoke: assembly, CCNet buckets, temperature
sampling at 100k docs (+ SemDeDup at 20k embeddings).

The sf0.1 bench corpus (500-2,000 rows) cannot show that the curation
operators' shapes hold when the corpus is 100-1000x the driver's
memory: that the explodes stay map-side-combined, the multi-consumer
checkpoints keep every expensive stage single-run, the per-language
windows only ever sort narrow projections, and nothing accumulates on
the driver.  This smoke synthesizes the corpus JVM-side (the driver
never materializes it), runs the production operators, and ASSERTS the
semantic invariants at scale:

- training_set_assembly: output <= budget rows; selected docs carry
  distinct fingerprints (dedup held); every per-shard token stream is
  gapless from offset 0 (pack layout exact); all n_tokens >= the gate.
- ccnet_bucket: one row per doc; within every language the
  head/middle/tail tercile sizes differ by at most one.
- temperature_sample: per-language selections equal min(quota, n_l);
  total <= budget.
- semdedup_prune: cell-local pairwise only (the operator's plan is
  pinned by tests/test_plans.py; here the 20k-vector run must finish
  in bounded wall with a sane drop count).
- driver RSS stays flat (reported; the JVM peak is the workers').

Corpus: ~50-250-word docs, hash-chosen vocabulary with a 10%-duplicate
head (exact clones, so the assembly's fingerprint dedup has real work),
five languages at 50/25/15/8/2% — the skew that makes the isqrt
temperature quotas diverge from proportional sampling.

Usage: python scripts/curation_scale_smoke.py [--n-docs 100000]
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

# lang tiers: cumulative percent -> lang (head-heavy, like web corpora)
LANG_CASE = (
    "CASE WHEN pmod(xxhash64(id, 99), 100) < 50 THEN 'en' "
    "WHEN pmod(xxhash64(id, 99), 100) < 75 THEN 'de' "
    "WHEN pmod(xxhash64(id, 99), 100) < 90 THEN 'fr' "
    "WHEN pmod(xxhash64(id, 99), 100) < 98 THEN 'es' "
    "ELSE 'und' END"
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n-docs", type=int, default=100_000)
    parser.add_argument("--n-emb", type=int, default=20_000)
    parser.add_argument("--budget", type=int, default=10_000)
    parser.add_argument(
        "--cores",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    args = parser.parse_args()
    n_docs = args.n_docs

    from deepseek_ocr_customvllm_spark.operators import curation, similarity
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(
        app_name="curation_scale_smoke",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )

    # --- corpus: 10% exact-duplicate head (ids sharing id div 10 == 0
    # bucket clone doc 'base' text), variable 50-250-word lengths ------
    docs = (
        spark.range(0, n_docs, 1, args.cores)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(LANG_CASE).alias("lang"),
            F.expr(
                # first 10% of ids: 1,000 exact-clone groups of ~10
                # (seeded by id div 10 -> identical text); rest unique
                "CASE WHEN id < cast(0.1 * {n} as bigint) THEN "
                "concat_ws(' ', transform(sequence(0, 99), i -> "
                "concat('c', pmod(xxhash64(id div 10, i), 3000)))) "
                "ELSE "
                "concat_ws(' ', transform(sequence(0, 49 + "
                "cast(pmod(xxhash64(id, 5), 200) as int)), i -> "
                "concat('w', pmod(xxhash64(id, i), 3000)))) END".format(
                    n=n_docs
                )
            ).alias("text"),
        )
    )

    results: dict = {"n_docs": n_docs, "budget": args.budget}

    # --- training_set_assembly ----------------------------------------
    t0 = time.time()
    layout = curation.training_set_assembly(
        docs, budget=args.budget, seq_len=2048
    ).collect()
    results["assembly_wall_s"] = round(time.time() - t0, 2)
    results["assembly_rows"] = len(layout)
    assert 0 < len(layout) <= args.budget
    assert all(r.n_tokens >= 10 for r in layout)
    # dedup held: every clone group contributes at most one selected doc
    clone_ids = [r.doc_id for r in layout if r.doc_id < 0.1 * n_docs]
    assert len({i // 10 for i in clone_ids}) == len(clone_ids), (
        "assembly selected two members of an exact-clone group"
    )
    by_shard: dict = {}
    for r in layout:
        by_shard.setdefault(r.shard, []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.start_tok)
        pos = 0
        for r in rs:
            assert r.start_tok == pos, "pack stream has a gap"
            pos += r.n_tokens
    results["assembly_packed_tokens"] = sum(r.n_tokens for r in layout)

    # --- sequence_pack_rows: MATERIALIZE real shards -------------------
    # Invariants assert JVM-side (never collect pack texts to the
    # driver): every written pack is exactly seq_len tokens, each
    # shard's pack_ids are gapless 0..n-1, and the shard-partitioned
    # parquet reads back with the same row count.
    import tempfile

    t_pack = time.time()
    pack_dir = tempfile.mkdtemp(prefix="packed_shards_")
    packs = curation.sequence_pack_rows(docs, seq_len=2048)
    curation.write_packed_shards(packs, pack_dir)
    back = spark.read.parquet(pack_dir)
    results["pack_wall_s"] = round(time.time() - t_pack, 2)
    n_packs = back.count()
    results["pack_rows"] = n_packs
    assert n_packs > 0
    assert back.filter(F.col("n_tokens") != 2048).count() == 0, (
        "a materialized pack is not exactly seq_len tokens"
    )
    shard_stats = back.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("pack_id").alias("maxp"),
        F.count_distinct("pack_id").alias("ndist"),
    ).collect()
    for r in shard_stats:
        assert r.maxp == r.n - 1 and r.ndist == r.n, (
            f"shard {r.shard} pack stream has holes"
        )
    # token conservation: written tokens == total stream div seq_len
    total_toks = (
        curation.sequence_pack(docs, seq_len=2048)
        .groupBy("shard").agg(F.sum("n_tokens").alias("tt")).collect()
    )
    want_packs = sum(r.tt // 2048 for r in total_toks)
    assert n_packs == want_packs, (n_packs, want_packs)
    import shutil

    shutil.rmtree(pack_dir, ignore_errors=True)

    # --- ccnet_bucket --------------------------------------------------
    t1 = time.time()
    tersizes = (
        curation.ccnet_bucket(docs)
        .groupBy("lang", "ppl_bucket")
        .count()
        .collect()
    )
    results["ccnet_wall_s"] = round(time.time() - t1, 2)
    per_lang: dict = {}
    for r in tersizes:
        per_lang.setdefault(r.lang, {})[r.ppl_bucket] = r["count"]
    total = 0
    for lang, b in per_lang.items():
        sizes = [b.get("head", 0), b.get("middle", 0), b.get("tail", 0)]
        total += sum(sizes)
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
    assert total == n_docs, "ccnet_bucket lost or duplicated docs"
    results["ccnet_langs"] = len(per_lang)

    # --- temperature_sample --------------------------------------------
    t2 = time.time()
    samp = (
        curation.temperature_sample(docs, budget=args.budget)
        .groupBy("lang", "n_docs", "quota")
        .count()
        .collect()
    )
    results["temperature_wall_s"] = round(time.time() - t2, 2)
    n_selected = 0
    for r in samp:
        assert r["count"] == min(r.quota, r.n_docs), (r.lang, r)
        n_selected += r["count"]
    assert n_selected <= args.budget
    results["temperature_selected"] = n_selected
    # the isqrt quota must upweight the tail: the rarest language's
    # share of the sample exceeds its share of the corpus
    shares = {r.lang: (r["count"], r.n_docs) for r in samp}
    if "und" in shares and "en" in shares:
        (c_u, n_u), (c_e, n_e) = shares["und"], shares["en"]
        assert c_u * n_e > 0 and c_u / n_u > c_e / n_e, (
            "temperature sampling failed to upweight the tail language"
        )

    # --- semdedup at --n-emb vectors ------------------------------------
    emb = spark.range(0, args.n_emb, 1, args.cores).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), j -> "
            "cast(pmod(xxhash64(id, j), 6001) - 3000 as double) / 1000)"
        ).alias("embedding"),
    )
    t3 = time.time()
    n_dropped = similarity.semdedup_prune(
        similarity.semdedup_corpus(similarity.clustered_embeddings(emb))
    ).count()
    results["semdedup_wall_s"] = round(time.time() - t3, 2)
    results["semdedup_n_emb"] = args.n_emb
    results["semdedup_dropped"] = n_dropped
    # every planted twin pair must lose exactly one member; no more
    # drops than planted twins + a small false-positive allowance
    planted = sum(
        1 for i in range(args.n_emb)
        if i % similarity.TWIN_MOD == similarity.TWIN_RES
    )
    assert n_dropped >= planted, "semdedup missed planted twins"
    assert n_dropped <= int(planted * 1.05), (
        f"semdedup over-dropped: {n_dropped} vs {planted} planted"
    )

    results["driver_rss_mb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
