"""Streaming extraction: the queue-consumer shape of the reference,
Spark-natively.

The reference is *job-streaming*: Celery workers consume an AMQP queue
of document ids and process them as they arrive
(``app/core/celery_app.py:5-32``, ``app/tasks/tasks.py:8-37``).  The
batch job replaces that per the north rule, but the same extraction
operator also composes with Structured Streaming unchanged — a
``readStream`` over the landing directory of ``pages`` parquet files is
the micro-batch analogue of the queue: new files = new messages,
checkpointing = broker durability, exactly-once sink = task ack.

``extract_pages``'s ``mapInPandas`` stage is stateless per-row, so it is
legal in a streaming plan with no watermark required; the state-table
MERGE runs in ``foreachBatch`` (the exactly-once sink pattern).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..operators.extract import EXTRACTED_SCHEMA, extract_pages
from ..sources.pages import PAGES_SPARK_SCHEMA


def extraction_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """``readStream`` over a parquet landing directory -> streaming
    extracted DataFrame (same schema as the batch operator)."""
    pages = (
        spark.readStream.schema(PAGES_SPARK_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(landing_dir)
    )
    # num_partitions must be explicit: a streaming plan cannot ask the
    # (not-yet-running) job for its parallelism.
    cores = spark.sparkContext.defaultParallelism
    return extract_pages(pages, num_partitions=cores)


def run_stream_once(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_bytes: Optional[int] = None,
) -> int:
    """Drain everything currently in the landing dir through the
    streaming plan into parquet (memory-of-queue semantics for tests);
    returns rows written."""
    extracted = extraction_stream(spark, landing_dir)
    q = (
        extracted.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).count()
