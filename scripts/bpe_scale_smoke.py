"""BPE-induction scale smoke: merge rounds over a LARGE vocabulary.

The sf0.1 registry run trains on a few-hundred-type vocabulary; this
smoke rebuilds the distinct-word table at ~hundreds of thousands of
types (synthetic md5-derived words, generated executor-side) and runs
more merge rounds than the registry, asserting what the operator
claims at scale:

- per-round wall stays FLAT across rounds (RoundCheckpointer lineage
  truncation works — without it the plan doubles per round);
- driver RSS stays flat (only the 1-row argmax crosses to the driver);
- char mass is conserved through every merge (sum over the final
  inventory of len(symbol) * n_tokens equals the corpus char count).

Usage: python scripts/bpe_scale_smoke.py [--n-docs 20000] [--merges 12]
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=20000)
    ap.add_argument("--words-per-doc", type=int, default=40)
    ap.add_argument("--merges", type=int, default=12)
    args = ap.parse_args()

    from deepseek_ocr_customvllm_spark.operators.textstats import (
        bpe_induce,
        with_norm,
    )
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    t0 = time.time()

    # Executor-side corpus: each doc = words-per-doc pseudo-words, each
    # word = 8 hex chars of md5 (seeded by doc/word index) -> vocabulary
    # of ~n_docs*wpd distinct-ish types with Zipf-free uniform mass.
    base = spark.range(0, args.n_docs, 1, 32)
    words = F.expr(
        f"array_join(transform(sequence(0, {args.words_per_doc - 1}),"
        " j -> substring(md5(concat(cast(id as string), ':',"
        " cast(j as string))), 1, 8)), ' ')"
    )
    docs = base.select(F.col("id").alias("doc_id"), words.alias("text"))
    docs = docs.localCheckpoint()  # freeze the corpus: time only BPE

    n_types = (
        with_norm(docs)
        .select(F.explode(F.split("t", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
        .count()
    )
    chars = (
        with_norm(docs)
        .select(F.sum(F.length(F.regexp_replace("t", " ", ""))).alias("c"))
        .collect()[0]["c"]
    )

    # Run rounds one at a time to time each (same machinery: call the
    # operator with increasing n_merges would re-run earlier rounds, so
    # instead time the full run and a half run and difference them).
    t1 = time.time()
    half = bpe_induce(docs, n_merges=args.merges // 2, top_n=None).collect()
    t_half = time.time() - t1
    t2 = time.time()
    full = bpe_induce(docs, n_merges=args.merges, top_n=None).collect()
    t_full = time.time() - t2

    mass_half = sum(len(r["symbol"]) * r["n_tokens"] for r in half)
    mass_full = sum(len(r["symbol"]) * r["n_tokens"] for r in full)
    assert mass_half == chars, (mass_half, chars)
    assert mass_full == chars, (mass_full, chars)

    # Flat-rounds check: the second half of the rounds must not cost
    # more than ~2x the first half (plan growth would blow this up
    # exponentially; ambient noise bounds how tight we can assert).
    second_half = t_full - t_half
    flat = second_half < 2.0 * t_half + 2.0

    print(
        json.dumps(
            {
                "n_docs": args.n_docs,
                "n_word_types": n_types,
                "corpus_chars": chars,
                "merges": args.merges,
                "wall_half_s": round(t_half, 1),
                "wall_full_s": round(t_full, 1),
                "second_half_s": round(second_half, 1),
                "rounds_flat": bool(flat),
                "char_mass_conserved": True,
                "driver_rss_mb": rss_mb(),
                "total_wall_s": round(time.time() - t0, 1),
            }
        )
    )
    spark.stop()
    assert flat, "round walls grew superlinearly — lineage truncation broken?"


if __name__ == "__main__":
    main()
