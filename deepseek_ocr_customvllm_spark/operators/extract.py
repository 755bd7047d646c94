"""The extraction stage as a Spark operator.

One ``mapInPandas`` pass fuses the whole reference worker lifecycle
(render -> preprocess -> model -> post-process,
``app/services/ocr_service.py:98-141``) into a single Arrow-batched
per-partition operator — the Spark analogue of the reference's
``ThreadPoolExecutor`` chunk loop, with partitions as the parallelism
primitive (SURVEY.md §2.3 M6).

Scale design (100 TB / 10^12 docs):

- **salted url-hash repartition** before the extractor: partition key is
  ``xxhash64(url) % (parallelism * salt)``, so placement is a pure
  function of the url (not input order) and Zipf-skewed domains spread
  across ``salt`` sub-buckets per partition.  At cluster scale the same
  expression drives Iceberg bucket partitioning.
- **no shuffle besides that one repartition**: the extractor is map-only;
  lineage/metrics are derived from output columns by a later aggregation
  rather than a second pass over the data.
- **per-row error isolation**: a document that fails parses into a
  FAILED row (reference per-job try/except, ``ocr_service.py:200-207``);
  a task never dies for one document.
- **memory bound**: Arrow batch size (session conf) caps documents per
  Python-side batch, the analogue of ``CHUNK_SIZE=40`` pages.
"""

from __future__ import annotations

import time
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..extractor.engine import MAX_BYTES, extract_document

# Superset block struct — Spark has no sum types, so the four reference
# block shapes (heading/paragraph/table/image, app/schemas/schemas.py:15-45)
# share one nullable struct.
BLOCK_STRUCT = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("level", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("table_id", T.StringType()),
        T.StructField("rows", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("validation", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

PAGE_STRUCT = T.StructType(
    [
        T.StructField("page_number", T.IntegerType()),
        T.StructField("blocks", T.ArrayType(BLOCK_STRUCT)),
    ]
)

SPAN_STRUCT = T.StructType(
    [
        T.StructField("label", T.StringType()),
        T.StructField("x1", T.IntegerType()),
        T.StructField("y1", T.IntegerType()),
        T.StructField("x2", T.IntegerType()),
        T.StructField("y2", T.IntegerType()),
        T.StructField("valid", T.BooleanType()),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("error", T.StringType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_bytes_in", T.LongType()),
        T.StructField("markdown_raw", T.StringType()),
        T.StructField("markdown", T.StringType()),
        T.StructField("blocks", T.ArrayType(PAGE_STRUCT)),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("t_ms", T.DoubleType()),
    ]
)

_BLOCK_KEYS = ("type", "level", "text", "table_id", "rows", "validation", "source")

# Default salt factor: sub-buckets per partition for the skew-taming
# repartition.  Must be LARGE: Spark re-hashes the partition expression,
# so with only a handful of distinct key values per partition the
# re-hash clumps them binomially and the biggest partition (the
# straggler) ends up ~1.5x the mean — measured as a 0.52 scaling
# efficiency before this was fixed.  1024 sub-buckets per partition
# keeps the clumping variance under 2% while still being an explicit,
# deterministic url-hash bucket id (usable as an Iceberg bucket
# partition transform at cluster scale).
DEFAULT_SALT = 1024


def _superset_block(block: dict) -> dict:
    return {k: block.get(k) for k in _BLOCK_KEYS}


def _extract_batch(
    iterator: Iterator[pd.DataFrame], max_bytes: int
) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1

    for pdf in iterator:
        out = {name: [] for name in EXTRACTED_SCHEMA.fieldNames()}
        for url, warc_ts, html in zip(
            pdf["url"].tolist(), pdf["warc_ts"].tolist(), pdf["html"].tolist()
        ):
            t0 = time.perf_counter()
            res = extract_document(url, html, max_bytes=max_bytes)
            t_ms = (time.perf_counter() - t0) * 1000.0
            out["url"].append(url)
            out["warc_ts"].append(warc_ts)
            out["content_type"].append(res.content_type)
            out["status"].append(res.status)
            out["error"].append(res.error)
            out["n_pages"].append(res.n_pages)
            out["n_blocks"].append(res.n_blocks)
            out["n_chars"].append(res.n_chars)
            out["n_bytes_in"].append(len(html) if html is not None else 0)
            out["markdown_raw"].append(res.markdown_raw)
            out["markdown"].append(res.markdown)
            out["blocks"].append(
                [
                    {
                        "page_number": p["page_number"],
                        "blocks": [_superset_block(b) for b in p["blocks"]],
                    }
                    for p in res.pages
                ]
            )
            out["spans"].append(res.spans)
            out["partition_id"].append(pid)
            out["t_ms"].append(t_ms)
        yield pd.DataFrame(out)


def salted_repartition(
    df: DataFrame, num_partitions: int, salt: int = DEFAULT_SALT
) -> DataFrame:
    """Repartition by ``xxhash64(url) % (num_partitions * salt)``.

    Deterministic placement (pure function of url), with ``salt``
    sub-buckets per target partition so that a hot domain's documents
    spread instead of landing on one straggler executor.
    """
    key = F.pmod(F.xxhash64(F.col("url")), F.lit(num_partitions * salt))
    return df.repartition(num_partitions, key)


def extract_pages(
    pages_df: DataFrame,
    num_partitions: Optional[int] = None,
    salt: int = DEFAULT_SALT,
    max_bytes: int = MAX_BYTES,
    repartition: bool = True,
) -> DataFrame:
    """``pages(url, warc_ts, html, ...)`` -> ``extracted`` DataFrame.

    Column-prunes to the three columns the extractor needs (keeps the
    parquet scan narrow even when the input table is wide), applies the
    salted repartition, then runs the fused extraction operator.

    ``repartition=False`` skips the shuffle entirely — correct when the
    input already has a url-uniform layout (an Iceberg table written
    ``PARTITIONED BY (bucket(N, url))``, or this engine's own bucketed
    output).  The extraction job then moves ZERO bytes over the network:
    scan -> extract -> write, all partition-local.
    """
    narrow = pages_df.select("url", "warc_ts", "html")
    if repartition:
        if num_partitions is None:
            num_partitions = pages_df.sparkSession.sparkContext.defaultParallelism
        narrow = salted_repartition(narrow, num_partitions, salt)
    return narrow.mapInPandas(
        lambda it: _extract_batch(it, max_bytes), schema=EXTRACTED_SCHEMA
    )


def lineage_from_extracted(extracted: DataFrame, job_id: str) -> DataFrame:
    """Per-partition lineage metrics (FIXTURES.md §3) derived from the
    extracted output — no second pass over the input data.

    The reference records per-job stage timings in ``ocr_jobs``
    (``app/models/documents.py:51-54``); here the unit is a partition.
    """
    return (
        extracted.groupBy("partition_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes_in").alias("n_bytes"),
            F.sum(F.when(F.col("status") == "SUCCESS", 1).otherwise(0)).alias(
                "n_success"
            ),
            F.sum(F.when(F.col("status") == "FAILED", 1).otherwise(0)).alias(
                "n_failed"
            ),
            F.sum(F.when(F.col("status") == "REJECTED", 1).otherwise(0)).alias(
                "n_rejected"
            ),
            (F.sum("t_ms") / 1000.0).alias("t_extract_s"),
            (
                F.count("*") / F.greatest(F.sum("t_ms") / 1000.0, F.lit(1e-9))
            ).alias("docs_per_sec"),
        )
        .withColumn("job_id", F.lit(job_id))
    )
