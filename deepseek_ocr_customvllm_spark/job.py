"""The end-to-end batch extraction job (the reference's whole service,
as one DataFrame program — SURVEY.md §3.3):

    read pages -> resume anti-join -> salted repartition
    -> mapInPandas extract -> write extracted (append)
    -> MERGE extraction_state -> append lineage

Run under spark-submit (packaged via ``scripts/build_pyfiles.sh``):

    spark-submit --py-files dist/deepseek_ocr_customvllm_spark.zip \\
        job.py --pages /data/pages_parquet --out /data/out \\
        --partitions 256

or as a module: ``python -m deepseek_ocr_customvllm_spark.job ...``.
With ``--synth N`` the job generates the deterministic synthetic corpus
executor-side instead of reading a parquet path.
"""

from __future__ import annotations

import argparse
import os
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from deepseek_ocr_customvllm_spark.operators.extract import (
    EXTRACTED_SCHEMA,
    extract_pages,
    lineage_from_extracted,
)
from deepseek_ocr_customvllm_spark.plans.session import get_spark
from deepseek_ocr_customvllm_spark.plans.state import open_state_store

# Explicit read schema (extracted columns + the job_id partition column):
# schema inference fails on a table whose last rewrite produced zero rows
# (e.g. a purge of every url).
_EXTRACTED_READ_SCHEMA = T.StructType(
    list(EXTRACTED_SCHEMA.fields) + [T.StructField("job_id", T.StringType())]
)


def _read_extracted_raw(spark: SparkSession, extracted_path: str) -> DataFrame:
    return spark.read.schema(_EXTRACTED_READ_SCHEMA).parquet(extracted_path)


def run_extraction_job(
    spark: SparkSession,
    pages_df: DataFrame,
    out_dir: str,
    num_partitions: Optional[int] = None,
    resume: bool = True,
    job_id: Optional[str] = None,
    max_bytes: Optional[int] = None,
) -> dict:
    """Execute the pipeline; returns a metrics dict (A6 analogue:
    ``pages_per_second`` at ``Scripts/benchmark.py:159-169`` becomes
    docs/sec over job wall-clock)."""
    # Time-sortable id: fixed-width ms-epoch hex prefix + random suffix, so
    # lexicographic order == temporal order and `read_extracted`'s
    # latest-run-per-url window picks the newest run (a bare uuid would make
    # "latest" arbitrary when reruns use different configs).
    job_id = job_id or f"{int(time.time() * 1000):012x}{uuid.uuid4().hex[:6]}"
    t0 = time.time()

    state = open_state_store(spark, os.path.join(out_dir, "extraction_state"))
    if resume:
        pending = state.pending(pages_df)
    else:
        pending = pages_df

    kwargs = {}
    if max_bytes is not None:
        kwargs["max_bytes"] = max_bytes
    extracted = extract_pages(pending, num_partitions=num_partitions, **kwargs)

    # One pass over the heavy data: the extractor output lands in parquet
    # partitioned by job run; state + lineage are then derived from the
    # just-written (narrow) columns instead of re-running the extractor.
    extracted_path = os.path.join(out_dir, "extracted")
    extracted.withColumn("job_id", F.lit(job_id)).write.mode("append").partitionBy(
        "job_id"
    ).parquet(extracted_path)

    this_run = (
        _read_extracted_raw(spark, extracted_path)
        .filter(F.col("job_id") == job_id)
        .select("url", "status", "warc_ts", "partition_id", "n_bytes_in", "t_ms")
    )
    state.merge(
        this_run.select("url", "status", F.col("warc_ts").alias("updated_at"))
    )

    lineage = lineage_from_extracted(
        this_run.select("partition_id", "status", "n_bytes_in", "t_ms"), job_id
    )
    lineage_path = os.path.join(out_dir, "lineage")
    lineage.write.mode("append").parquet(lineage_path)

    n_this_run = this_run.count()
    wall = time.time() - t0
    return {
        "job_id": job_id,
        "wall_clock_s": round(wall, 3),
        "rows_extracted": n_this_run,
        "docs_per_sec": round(n_this_run / wall, 2) if wall > 0 else None,
        "extracted_path": extracted_path,
        "lineage_path": lineage_path,
    }


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the extracted table with exactly-one-row-per-url semantics.

    A job that crashes between the parquet append and the state MERGE
    leaves its urls pending; the rerun re-extracts them into a second
    job partition.  The extractor is deterministic, so duplicates are
    byte-identical — this reader still collapses to the latest job run
    per url so downstream counts are exact.  (The Iceberg path gets this
    from the transactional commit instead.)
    """
    from pyspark.sql.window import Window

    df = _read_extracted_raw(spark, os.path.join(out_dir, "extracted"))
    w = Window.partitionBy("url").orderBy(F.col("job_id").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def purge_urls(spark: SparkSession, out_dir: str, urls_df: DataFrame) -> int:
    """K7 — delete documents from the pipeline outputs.

    The reference's delete endpoint purges MinIO objects + the DB row
    (``app/api/routes/ocr.py:136-212``).  Here: rewrite the ``extracted``
    table without the urls (at cluster scale this is Iceberg
    ``DELETE FROM extracted WHERE url IN ...`` — a metadata/delete-file
    operation, no rewrite) and drop them from the checkpoint state so a
    re-ingested url is processed fresh.  Returns rows removed.
    """
    import shutil

    from deepseek_ocr_customvllm_spark.plans.state import open_state_store

    extracted_path = os.path.join(out_dir, "extracted")
    urls = urls_df.select("url")
    current = _read_extracted_raw(spark, extracted_path)
    n_before = current.count()
    remaining = current.join(urls, "url", "left_anti")

    # Preserve the append layout (job_id as a partition directory, not a
    # physical column) and swap via rename-aside so a crash mid-swap leaves
    # a recoverable `_old` copy instead of no table at all.
    tmp_path = extracted_path + "_rewrite"
    remaining.write.mode("overwrite").partitionBy("job_id").parquet(tmp_path)
    old_path = extracted_path + "_old"
    os.rename(extracted_path, old_path)
    os.rename(tmp_path, extracted_path)
    shutil.rmtree(old_path)

    state = open_state_store(spark, os.path.join(out_dir, "extraction_state"))
    if hasattr(state, "delete_urls"):
        state.delete_urls(urls)
    n_after = _read_extracted_raw(spark, extracted_path).count()
    return n_before - n_after


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pages", help="input pages parquet path")
    parser.add_argument("--synth", type=int, help="generate N synthetic docs instead")
    parser.add_argument("--out", required=True, help="output directory")
    parser.add_argument("--partitions", type=int, default=None)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--max-bytes", type=int, default=None)
    parser.add_argument("--master", default=None)
    parser.add_argument(
        "--purge-urls",
        help="file with one url per line: delete them from outputs + state, then exit",
    )
    args = parser.parse_args(argv)

    spark = get_spark(master=args.master)
    if args.purge_urls:
        import json as _json

        with open(args.purge_urls, encoding="utf-8") as f:
            urls = [(line.strip(),) for line in f if line.strip()]
        removed = purge_urls(
            spark, args.out, spark.createDataFrame(urls, ["url"])
        )
        print(_json.dumps({"purged": removed}))
        return
    if args.synth:
        from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df

        pages = synth_pages_df(spark, args.synth)
    elif args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        parser.error("one of --pages / --synth is required")

    metrics = run_extraction_job(
        spark,
        pages,
        args.out,
        num_partitions=args.partitions,
        resume=not args.no_resume,
        job_id=None,
        max_bytes=args.max_bytes,
    )
    import json

    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
