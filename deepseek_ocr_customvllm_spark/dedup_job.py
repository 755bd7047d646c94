"""Production corpus-dedup job: MinHash-LSH pairs -> connected
components -> canonical-only corpus, with the SCALE DEFAULTS ON.

This is the ``job.py``-layer entry point for near-duplicate removal —
the composition the registry exposes as ``corpus_dedup_apply``, but
with the production knobs defaulted the way a 10^12-document run needs
them (NOTES.md "scale-knob defaults" rule, VERDICT r5 #4):

- ``max_bucket=100`` ON by default: degenerate LSH buckets (boilerplate
  heads, exact-duplicate clusters — which share ALL bands) otherwise
  produce k^2/2 candidate rows inside one bucket.  The 100k-doc smoke
  measured the cap holding the candidate budget at 4.6% of the
  100x-docs bound with zero recall loss outside degenerate buckets
  (their members belong to the exact-dedup tier anyway).
- ``persist`` ON by default (inside :func:`minhash_lsh_duplicates`):
  one checkpointed shingle scan feeds signatures and verification.

The ORACLE-COMPARED registry path deliberately pins the exact-recall
configuration (``max_bucket=None``) instead — correctness comparisons
must never silently drop candidates.  Anything that is NOT
oracle-compared should come through here.

Run under spark-submit (the module file is the application — spark-submit
has no ``-m`` flag)::

    spark-submit --driver-memory 8g \\
        --py-files dist/deepseek_ocr_customvllm_spark.zip \\
        deepseek_ocr_customvllm_spark/dedup_job.py \\
        --docs /data/documents_parquet --out /data/deduped \\
        --max-bucket 100

``--exact-recall`` disables the cap for small/audit runs.  Prints ONE
JSON line with row counts and wall clock.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepseek_ocr_customvllm_spark.operators import dedup
from deepseek_ocr_customvllm_spark.plans.session import get_spark

#: The production hot-bucket cap (see module docstring).  A registry /
#: oracle path that needs exact recall passes ``max_bucket=None``
#: explicitly — the default here is the SCALE configuration.
DEFAULT_MAX_BUCKET = 100


def run_dedup_job(
    docs: DataFrame,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    keep: str = "min_id",
) -> DataFrame:
    """The deduped corpus: near-dup pairs (capped, checkpointed) ->
    connected components -> every non-canonical member dropped.

    Returns the surviving ``(doc_id, text)`` rows — the corpus a
    training pipeline feeds downstream.  Scale shape: banded self-join
    with the hot-bucket cap, iterative min-label propagation with
    per-round localCheckpoint, and a final anti-join on the
    non-canonical id list (bounded by the duplicate mass; AQE picks
    broadcast when that mass is small, shuffle when it isn't — at
    10^12 docs the drop list can itself be billions of rows, so the
    strategy is deliberately not pinned).

    ``keep`` picks the retention policy: ``"min_id"`` (default — the
    earliest-admitted member of each cluster survives) or ``"best"``
    (the highest-``quality_score`` member survives, tie min doc_id —
    :func:`operators.dedup.dedup_keep_best`'s policy; keeps the cleaner
    extraction when a page was crawled twice).
    """
    if keep not in ("min_id", "best"):
        # validate BEFORE the (eager, checkpointing) minhash pass
        raise ValueError(f"keep must be 'min_id' or 'best', got {keep!r}")
    pairs = dedup.minhash_lsh_duplicates(docs, max_bucket=max_bucket)
    comp = dedup.duplicate_components(pairs.select("id_a", "id_b"))
    # components are eagerly materialized and drop_non_canonical reads
    # only docs + comp: the MinHash pass's pinned caches are done
    dedup.release_caches(pairs)
    return drop_non_canonical(docs, comp, keep=keep)


def drop_non_canonical(
    docs: DataFrame, comp: DataFrame, keep: str = "min_id"
) -> DataFrame:
    """Apply a retention policy to precomputed near-dup ``comp``
    ``(doc_id, component_id)`` rows: drop every non-canonical cluster
    member from ``docs``, original columns intact.

    Split out of :func:`run_dedup_job` so a caller that already built
    the components for telemetry (the per-dump ``pipeline_job``) can
    apply them without a second MinHash pass — at scale the banded
    self-join is the expensive leg, and it must run exactly once.
    """
    if keep not in ("min_id", "best"):
        raise ValueError(f"keep must be 'min_id' or 'best', got {keep!r}")
    if keep == "best":
        from pyspark.sql.window import Window

        from deepseek_ocr_customvllm_spark.operators import textstats

        quality = textstats.quality_scores(docs).select(
            "doc_id", "quality_score"
        )
        scored = comp.join(quality, "doc_id")
        w = Window.partitionBy("component_id").orderBy(
            F.col("quality_score").desc(), F.col("doc_id").asc()
        )
        non_canon = (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > 1)
            .select("doc_id")
        )
    else:
        non_canon = comp.filter(
            F.col("doc_id") != F.col("component_id")
        ).select("doc_id")
    return docs.join(non_canon, "doc_id", "left_anti")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--docs", required=True, help="input parquet (doc_id, text)")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument(
        "--max-bucket",
        type=int,
        default=DEFAULT_MAX_BUCKET,
        help="hot-bucket cap (production default ON; see --exact-recall)",
    )
    parser.add_argument(
        "--exact-recall",
        action="store_true",
        help="disable the hot-bucket cap (audit/oracle runs only)",
    )
    parser.add_argument(
        "--keep",
        choices=("min_id", "best"),
        default="min_id",
        help="cluster retention policy: earliest-admitted (min_id) or "
        "highest-quality member (best)",
    )
    parser.add_argument("--master", default=None)
    parser.add_argument("--partitions", type=int, default=None)
    args = parser.parse_args(argv)

    spark = get_spark(
        app_name="dedup_job",
        master=args.master,
        shuffle_partitions=args.partitions,
    )
    cap = None if args.exact_recall else args.max_bucket
    t0 = time.time()
    docs = spark.read.parquet(args.docs)
    kept = run_dedup_job(docs, max_bucket=cap, keep=args.keep)
    kept.write.mode("overwrite").parquet(args.out)
    n_in = docs.count()
    n_out = spark.read.parquet(args.out).count()
    print(
        json.dumps(
            {
                "job": "dedup_job",
                "max_bucket": cap,
                "keep": args.keep,
                "rows_in": n_in,
                "rows_kept": n_out,
                "rows_dropped": n_in - n_out,
                "wall_clock_s": round(time.time() - t0, 3),
                "out": args.out,
            }
        )
    )


if __name__ == "__main__":
    main()
