"""SparkSession factory with the configuration the pipeline assumes.

Tuned for correctness-at-scale first (SURVEY.md §4):

- AQE on (runtime coalescing + skew handling)
- Arrow on (every UDF in this engine is Arrow-vectorized)
- UTC session timezone (DuckDB oracle comparisons are UTC-naive)
- speculative execution off — the extractor is deterministic, but
  speculation can double-fire side-effectful sinks; the reference
  likewise pins one long-running worker (celery ``-P solo``)
- Arrow batch size bounded: the analogue of the reference's
  ``CHUNK_SIZE=40``-page memory bound (``app/config.py:60``) — a batch
  of huge documents must fit in the Python worker's memory
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
ARROW_MAX_RECORDS = 256


def get_spark(
    app_name: str = "deepseek_ocr_customvllm_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS))
        .config("spark.speculation", "false")
        # zstd: ~30% smaller markdown/blocks columns than snappy at
        # comparable CPU — at 100 TB the scan is I/O-bound, so codec
        # ratio is throughput
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
