"""Deep-history incremental-dedup smoke: does the per-batch wall stay
flat-ish as the ACCUMULATED store grows two orders of magnitude?

The streaming smoke (streaming_dedup_smoke.py) proves the exactly-once
protocol over ~12k docs; the scale question VERDICT r6 #4 asks is the
other axis — the accumulated-store side.  This smoke runs the SAME
sink (`run_incremental_dedup_stream`) twice in one process:

- phase A (shallow): seed dump of ``--dump`` docs, then ``--probes``
  probe dumps of ``--dump`` docs each, drained one at a time, per-drain
  wall recorded;
- phase B (deep): fresh dirs, seed dump of ``--deep`` docs (>= 500k by
  default — the 100x store), the IDENTICAL probe dumps, walls recorded.

Every probe dump carries 10% exact re-crawls of seed documents, so the
cross-batch equi-join + Jaccard verify does real dropping work against
the accumulated store in both phases.  Asserted invariants:

- correctness: per-probe admitted == 90% of the dump, exactly, in both
  phases (re-crawls of admitted seed docs drop; everything else admits);
- flatness: mean probe wall in phase B <= --max-ratio x phase A's
  (default 3.0 — the store-side band scan grows with history, but the
  join is an equi-join on band keys and candidate verification touches
  only matched docs' shingles, so the wall must not scale anywhere near
  the 100x+ store growth);
- compaction: after phase B, `compact_incremental_store` folds every
  committed batch partition into one compacted partition each, and two
  more probe dumps drain against the compacted store — admission stays
  exact and the walls are reported alongside (the path-list/partition
  overhead the compaction removes is the residual the two-phase ratio
  measures);
- driver RSS reported and bounded (nothing here collects unbounded
  data driver-side).

Body-generator aliasing guard: `_body` depends on doc_id only through
doc_id % 1000003, so every id range this smoke uses (seed [0, deep),
probes [600000, 600000 + probes*dump)) is chosen inside one modulus
period with pairwise-disjoint residues — no unplanned duplicates.

Usage: python scripts/incremental_dedup_deep_history_smoke.py
       [--deep 500000] [--dump 4000] [--probes 4] [--max-ratio 3.0]
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

_PROBE_BASE = 600_000
_BODY_MOD = 1_000_003


def _body(idcol):
    """Deterministic ~40-token body, JVM-side only (same recurrence as
    streaming_dedup_smoke; see module docstring for the aliasing
    guard)."""
    toks = [
        F.concat(
            F.lit(f"w{k}x"), ((idcol * (k + 3)) % _BODY_MOD).cast("string")
        )
        for k in range(40)
    ]
    return F.concat_ws(" ", *toks)


def _write_seed(spark, path: str, n: int) -> None:
    df = spark.range(0, n, 1, 16).select(
        F.col("id").alias("doc_id"), _body(F.col("id")).alias("text")
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _write_probe(spark, path: str, probe_idx: int, dump: int, seed_n: int) -> None:
    """Probe ids live in their own residue range; 10% of rows are exact
    re-crawls of seed docs (deterministic target (id*31) % seed_n)."""
    base = _PROBE_BASE + probe_idx * dump
    df = spark.range(base, base + dump, 1, 8).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 == 7, _body((F.col("id") * 31) % seed_n)
        )
        .otherwise(_body(F.col("id")))
        .alias("text"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _run_phase(spark, root: str, seed_n: int, dump: int, probes: int) -> dict:
    from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
        run_incremental_dedup_stream,
    )

    landing = os.path.join(root, "landing")
    os.makedirs(landing)
    sargs = (
        landing + "/*",
        os.path.join(root, "out"),
        os.path.join(root, "ckpt"),
        os.path.join(root, "store"),
        os.path.join(root, "state"),
    )
    _write_seed(spark, os.path.join(landing, "dump_seed"), seed_n)
    t0 = time.time()
    admitted = run_incremental_dedup_stream(spark, *sargs)
    seed_wall = time.time() - t0
    assert admitted == seed_n, (admitted, seed_n)

    probe_walls = []
    expect = seed_n
    for i in range(probes):
        _write_probe(
            spark, os.path.join(landing, f"dump_{i:03d}"), i, dump, seed_n
        )
        t1 = time.time()
        admitted = run_incremental_dedup_stream(spark, *sargs)
        probe_walls.append(round(time.time() - t1, 2))
        n_dups = sum(
            1
            for d in range(_PROBE_BASE + i * dump, _PROBE_BASE + (i + 1) * dump)
            if d % 10 == 7
        )
        expect += dump - n_dups
        assert admitted == expect, (i, admitted, expect)
    return {
        "seed_docs": seed_n,
        "seed_drain_wall_s": round(seed_wall, 2),
        "probe_walls_s": probe_walls,
        "probe_wall_mean_s": round(sum(probe_walls) / len(probe_walls), 2),
        "store_band_rows": spark.read.parquet(
            os.path.join(root, "store", "bands")
        ).count(),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--deep", type=int, default=500_000)
    ap.add_argument("--dump", type=int, default=4000)
    ap.add_argument("--probes", type=int, default=4)
    ap.add_argument("--max-ratio", type=float, default=3.0)
    args = ap.parse_args()
    # the seed range [0, deep) and the probe range must have disjoint
    # residues mod _BODY_MOD; with both ranges inside one period that
    # reduces to the seed staying below the probe base
    assert args.deep <= _PROBE_BASE, "seed range must stay below the probe base"
    assert _PROBE_BASE + (args.probes + 2) * args.dump < _BODY_MOD, (
        "probe ids (incl. the two post-compaction probes) must stay "
        "inside one body-modulus period"
    )
    assert args.dump % 10 == 0, "--dump must be a multiple of 10"

    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    spark = get_spark(app_name="incremental_dedup_deep_history_smoke")
    spark.sparkContext.setLogLevel("ERROR")

    shallow_root = tempfile.mkdtemp(prefix="incr_shallow_")
    deep_root = tempfile.mkdtemp(prefix="incr_deep_")
    try:
        shallow = _run_phase(
            spark, shallow_root, args.dump, args.dump, args.probes
        )
        deep = _run_phase(spark, deep_root, args.deep, args.dump, args.probes)
        ratio = deep["probe_wall_mean_s"] / max(
            shallow["probe_wall_mean_s"], 1e-9
        )

        # --- compaction: fold the deep store, then two more probes ----
        from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
            compact_incremental_store,
            run_incremental_dedup_stream,
        )

        t0 = time.time()
        cstats = compact_incremental_store(
            spark,
            os.path.join(deep_root, "store"),
            os.path.join(deep_root, "state"),
        )
        compact_wall = time.time() - t0
        assert cstats["compacted"], cstats
        landing = os.path.join(deep_root, "landing")
        sargs = (
            landing + "/*",
            os.path.join(deep_root, "out"),
            os.path.join(deep_root, "ckpt"),
            os.path.join(deep_root, "store"),
            os.path.join(deep_root, "state"),
        )
        expect = args.deep + args.probes * (args.dump - args.dump // 10)
        post_walls = []
        for i in range(args.probes, args.probes + 2):
            _write_probe(
                spark,
                os.path.join(landing, f"dump_{i:03d}"),
                i,
                args.dump,
                args.deep,
            )
            t1 = time.time()
            admitted = run_incremental_dedup_stream(spark, *sargs)
            post_walls.append(round(time.time() - t1, 2))
            expect += args.dump - args.dump // 10
            assert admitted == expect, (i, admitted, expect)
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        result = {
            "smoke": "incremental_dedup_deep_history",
            "dump_docs": args.dump,
            "probes": args.probes,
            "shallow": shallow,
            "deep": deep,
            "store_growth_x": round(
                deep["store_band_rows"] / max(shallow["store_band_rows"], 1), 1
            ),
            "probe_wall_ratio_deep_vs_shallow": round(ratio, 2),
            "max_ratio": args.max_ratio,
            "compaction": {
                "wall_s": round(compact_wall, 2),
                "committed_keys_folded": cstats["pending_keys"],
                "bands_rows": cstats.get("bands_rows"),
                "post_compaction_probe_walls_s": post_walls,
                "post_compaction_probe_wall_mean_s": round(
                    sum(post_walls) / len(post_walls), 2
                ),
            },
            "driver_rss_mb": round(rss_mb, 1),
        }
        assert ratio <= args.max_ratio, result
        print(json.dumps(result))
    finally:
        shutil.rmtree(shallow_root, ignore_errors=True)
        shutil.rmtree(deep_root, ignore_errors=True)


if __name__ == "__main__":
    main()
