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

# applicationIds that already ran the engine warm-up (one per session).
_WARMED: set = set()


def _warm_engine(spark: SparkSession) -> None:
    """One-time per-session engine warm-up over a tiny synthetic frame.

    A fresh Spark application pays multi-second one-time costs on the
    FIRST query that exercises each engine code path: loading the Janino
    compiler and first whole-stage compile, shuffle/broadcast machinery,
    window/sort-aggregate operators, the SQL cache.  A long-running
    production job amortizes these to zero; a measurement that charges
    them to one arbitrary query is measuring process cold-start, not the
    engine (the same rationale as ``bench.py``'s own ``_warmup``, which
    covers only the Python-worker path).  This touches the JVM-side
    paths: Exchange + hash/sort aggregation (incl. min(string)),
    broadcast join, explode, window, a self-join, and an in-memory cache
    build — ~1-3 s once per session over 20k synthetic rows, independent
    of data scale.

    Disable with ``SPARK_GRAFT_SESSION_WARMUP=0`` (e.g. for one-shot
    CLI invocations where startup latency matters more than first-query
    latency).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    app = spark.sparkContext.applicationId
    if app in _WARMED:
        return
    _WARMED.add(app)
    # driver-side module imports the first query would otherwise pay for
    # (the layout probe reads parquet footers via pyarrow)
    from . import layout as _layout  # noqa: F401
    df = spark.range(0, 20000, 1, 8).select(
        "id",
        (F.col("id") % 97).alias("k"),
        F.col("id").cast("string").alias("s"),
    )
    small = spark.range(0, 97).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    (
        df.join(F.broadcast(small), "k")
        .select("id", "k", "v", "s", F.explode(F.array(F.lit(1), F.lit(2))).alias("e"))
        .groupBy("k")
        .agg(F.sum("id"), F.min("s"), F.count("*"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    w = Window.partitionBy("k").orderBy("id")
    d2 = (
        df.repartition("k")
        .withColumn("r", F.row_number().over(w))
        .filter("r <= 3")
        .persist()
    )
    (
        d2.alias("a")
        .join(d2.alias("b"), "k")
        .groupBy("a.id")
        .agg(F.min("b.s"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    d2.unpersist()


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
    if os.environ.get("SPARK_GRAFT_SESSION_WARMUP", "1") != "0":
        _warm_engine(spark)
    return spark
