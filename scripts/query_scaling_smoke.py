"""Two-parallelism scaling evidence for the SHUFFLE-BOUND dedup path.

The north rule's two-cluster-size criterion is evidenced in bench.py by
the extraction job (Python-worker-bound).  This smoke runs the same
check for the query engine's shuffle-heavy path — the banded MinHash
pipeline (shingle explode -> signature agg -> banded self-join ->
Jaccard verify) — at local[N] vs local[4N] on identical input, as
adjacent interleaved pairs (both arms of a pair inside one
ambient-noise window, per BASELINE.md "Scaling methodology (round 3)").

Input sizing is the whole game: at raw sf0.1 the walls are ~4 s and
fixed costs (session, scan, plan) dominate — measured efficiencies of
0.26-0.48 that say nothing about the engine.  So the smoke SALTS and
REPLICATES the sf0.1 documents table (each copy's shingles carry a
copy marker, so replication multiplies honest shingle work without
manufacturing cross-copy duplicate clusters) until the local[N] arm
runs tens of seconds, the same fix the extraction bench applied when
its 4k-doc arms were noise-dominated.

Each arm is a fresh SparkSession (a stopped context leaves the JVM
gateway alive, ~2 s to swap masters); rep 1 pays plan/codegen, rep 2
is the steady state and is the reported wall — bench.py's convention.

Measured findings (rounds 5-6, recorded in BASELINE.md "Query-engine
scaling"): round 5 quantified a per-query SERIAL FLOOR (driver
planning, AQE re-planning, ~10 stage schedulings ~= 8.7 s, vs ~55
core-seconds of parallel work at x12) against a pure-JVM calibration
of 0.80-0.92 on the same host.  Round 6 CUT the floor and the
parallel work together (fused single-scan shingle table, sizes
carried per row, jobs 9 -> 7): walls fell to 23-26 s at local[2]
(was 36-52) and 10-13 s at local[8] (was ~15).  NOTE the efficiency
statistic correctly FALLS when the job gets cheaper — wall-ratio
efficiency (s+W/2)/(4(s+W/8)) tends to 0.25 as the parallel work W
shrinks over a fixed floor s, so compare WALLS across rounds, and
efficiencies only within a round.  Decomposition after the cut:
W ~= 32 core-s, s ~= 7.4 s ~= 7 irreducible shuffle-boundary stages.
Replication does NOT raise the signal cheaply: the Jaccard-verify
stage's shingle join grows super-linearly with replicas (a x48
attempt ran >60 min and was abandoned), so REPLICAS stays 12 and the
floor analysis is the honest statement.

Prints ONE JSON line: {"metric": "query_scaling_smoke", ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
SCALE_4N = SCALE_N * 4
PAIRS = int(os.environ.get("SPARK_GRAFT_SCALE_PAIRS", "3"))
REPLICAS = int(os.environ.get("SPARK_GRAFT_QSCALE_REPLICAS", "12"))


def _new_spark(cores: int):
    return _new_spark_partitions(cores, max(cores, 8))


def _new_spark_partitions(cores: int, shuffle_partitions: int):
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    return get_spark(
        app_name=f"qscale_local{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle_partitions,
    )


def _materialize_corpus(path: str) -> int:
    """sf0.1 documents x REPLICAS, salted per copy: doc_ids disjoint,
    every text suffixed with its copy marker so shingle sets differ
    across copies — n x the shuffle/explode work, no fake dup blowup."""
    from pyspark.sql import functions as F

    spark = _new_spark(32)
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        copies = [
            docs.select(
                (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(f" corpus copy marker k{k}")
                ).alias("text"),
            )
            for k in range(REPLICAS)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.repartition(32).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path).count()
    finally:
        spark.stop()


def _run_arm(cores: int, path: str) -> float:
    from deepseek_ocr_customvllm_spark.operators import dedup

    # 4 shuffle tasks per core on BOTH arms: equal tasks-per-core
    # packing, so waves self-balance and the single-wave straggler
    # effect cannot masquerade as an engine scaling limit
    spark = _new_spark_partitions(cores, 4 * cores)
    try:
        wall = None
        for _ in range(2):  # rep 2 = steady state
            # rep isolation: the round-8 persist-shaped pipeline would
            # otherwise cache-HIT rep 2 on rep 1's materialized
            # shingle/signature tables and measure cached reads, not
            # the pipeline this smoke exists to scale-test
            spark.catalog.clearCache()
            docs = spark.read.parquet(path)
            t0 = time.time()
            dedup.minhash_lsh_duplicates(docs).write.mode(
                "overwrite"
            ).format("noop").save()
            wall = time.time() - t0
        return round(wall, 3)
    finally:
        spark.stop()


def main() -> None:
    work = tempfile.mkdtemp(prefix="qscale_")
    path = os.path.join(work, "docs")
    try:
        n_docs = _materialize_corpus(path)
        pairs = []
        for _ in range(PAIRS):
            wall_n = _run_arm(SCALE_N, path)
            wall_4n = _run_arm(SCALE_4N, path)
            pairs.append(
                {
                    "wall_n_s": wall_n,
                    "wall_4n_s": wall_4n,
                    "efficiency": round(wall_n / wall_4n / 4.0, 4),
                }
            )
        effs = [p["efficiency"] for p in pairs]
        print(
            json.dumps(
                {
                    "metric": "query_scaling_smoke",
                    "job": "minhash_lsh_duplicates (shuffle-bound)",
                    "n_docs": n_docs,
                    "replicas": REPLICAS,
                    "scaling_cores": [SCALE_N, SCALE_4N],
                    "method": (
                        "interleaved (N, 4N) pairs, fresh session per "
                        "arm, rep-2 steady-state walls; efficiency = "
                        "(wall_n / wall_4n) / 4"
                    ),
                    "pairs": pairs,
                    "efficiency_max": max(effs),
                    "efficiency_median": round(statistics.median(effs), 4),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
