"""Streaming incremental-dedup scale smoke: the content-keyed
exactly-once sink over a multi-dump landing sequence.

The unit tests prove the ledger semantics on 3-row files; this smoke
shows the SHAPE holds when each dump is thousands of documents and the
accumulated store spans many committed batches:

- N landing files of ``--docs-per-file`` docs each; every file carries
  a fixed fraction of exact re-crawls of EARLIER files' docs (the
  cross-batch drop path does real work every batch — exact, because
  this smoke asserts counts and only jaccard-1.0 pairs collide in ALL
  bands deterministically; near-dup RECALL is `dedup_recall_report`'s
  job) plus in-file clones (the in-batch path too).
- After draining: admitted == planted-unique count exactly; the
  band/shingle store holds rows ONLY for admitted docs; the ledger has
  one content key per file.
- Checkpoint loss + full replay: a second drain admits NOTHING new and
  the replay wall is reported separately (it should be a small fraction
  of the initial drain — each replayed batch computes one content-key
  aggregate and skips).
- Driver RSS is reported (must stay flat: nothing here collects).

Usage: python scripts/streaming_dedup_smoke.py [--files 10]
       [--docs-per-file 2000]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _mk_file(spark, path: str, file_idx: int, n: int) -> None:
    """File ``file_idx``: doc_ids [idx*n, (idx+1)*n); 10% of rows are
    exact re-crawls of the PREVIOUS file's docs, 5% are exact clones of
    an in-file neighbour, the rest are unique hash-derived bodies."""
    base = file_idx * n
    df = spark.range(base, base + n, 1, 8).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.col("id") % 10 == 7) & F.lit(file_idx > 0),
            # exact re-crawl of a UNIQUE-bodied doc one file earlier
            # (slot %10 == 6 never takes a planted branch)
            _body(F.col("id") - n - 1),
        )
        .when(F.col("id") % 20 == 9, _body(F.col("id") - 1))  # in-file clone
        .otherwise(_body(F.col("id")))
        .alias("text"),
    )
    # ONE part-file per dump: the sink takes one file per micro-batch,
    # so this makes batch == dump (otherwise every part-file is its own
    # batch — correct too, just not what the ledger assertions count)
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _body(idcol):
    """Deterministic ~40-token body, JVM-side only.  Modulus is a prime
    far above any doc_id this smoke generates, so two distinct ids never
    share a single token (no unplanned duplicates)."""
    toks = [
        F.concat(
            F.lit(f"w{k}x"), ((idcol * (k + 3)) % 1000003).cast("string")
        )
        for k in range(40)
    ]
    return F.concat_ws(" ", *toks)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=10)
    ap.add_argument("--docs-per-file", type=int, default=2000)
    args = ap.parse_args()

    from deepseek_ocr_customvllm_spark.plans.session import get_spark
    from deepseek_ocr_customvllm_spark.plans.state import ParquetStateStore
    from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
        INCR_STREAM_ID,
        run_incremental_dedup_stream,
    )

    spark = get_spark(app_name="streaming_dedup_smoke")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="stream_smoke_")
    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    sargs = (
        landing + "/*",
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
        os.path.join(root, "store"),
        os.path.join(root, "state"),
    )
    n, nf = args.docs_per_file, args.files
    # the planted-duplicate slot arithmetic (%10 re-crawls, %20 clones,
    # target slot id-n-1 ≡ 6 mod 10) assumes dump size is a multiple of
    # 20 — anything else shifts the slots and the expected counts lie
    assert n % 20 == 0, "--docs-per-file must be a multiple of 20"
    for i in range(nf):
        _mk_file(spark, os.path.join(landing, f"dump_{i:03d}"), i, n)

    t0 = time.time()
    admitted = run_incremental_dedup_stream(spark, *sargs)
    drain_s = time.time() - t0

    # --- invariants -------------------------------------------------------
    # expected: uniques = all docs minus in-file clones minus cross-file
    # near-dups (both planted deterministically above)
    total = nf * n
    in_clones = sum(
        1 for i in range(nf) for d in range(i * n, (i + 1) * n)
        if d % 20 == 9 and not (d % 10 == 7 and i > 0)
    )
    x_dups = sum(
        1 for i in range(1, nf) for d in range(i * n, (i + 1) * n)
        if d % 10 == 7
    )
    expected = total - in_clones - x_dups
    assert admitted == expected, (admitted, expected)

    store = ParquetStateStore(spark, sargs[4])
    keys = [
        k for k in store.applied_map() if k.startswith(INCR_STREAM_ID + ":")
    ]
    assert len(keys) == nf, (len(keys), nf)
    n_store = (
        spark.read.parquet(os.path.join(root, "store", "bands"))
        .select("doc_id").distinct().count()
    )
    assert n_store == expected, (n_store, expected)

    # --- checkpoint-loss replay: content keys skip everything -------------
    shutil.rmtree(os.path.join(root, "ckpt"))
    t1 = time.time()
    admitted2 = run_incremental_dedup_stream(spark, *sargs)
    replay_s = time.time() - t1
    assert admitted2 == expected, (admitted2, expected)

    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(json.dumps({
        "smoke": "streaming_dedup",
        "files": nf,
        "docs_per_file": n,
        "docs_total": total,
        "admitted": admitted,
        "in_file_clones_dropped": in_clones,
        "cross_file_dups_dropped": x_dups,
        "ledger_keys": len(keys),
        "drain_wall_s": round(drain_s, 2),
        "docs_per_sec": round(total / drain_s, 1),
        "checkpoint_loss_replay_wall_s": round(replay_s, 2),
        "replay_fraction_of_drain": round(replay_s / drain_s, 3),
        "driver_rss_mb": round(rss_mb, 1),
    }))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
