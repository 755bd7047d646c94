"""Distributed synthesis of the ``pages`` table.

``synth_page(i)`` is a pure function of ``i``, so the corpus can be
generated *inside* executors from ``spark.range`` — no driver-side loop,
no collect, identical rows at any parallelism.  This stands in for the
Iceberg ``pages`` table scan at 10^12-document scale; the generated
parquet has exactly the ``input_hint`` shape
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .pagegen import synth_page

PAGES_SPARK_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _gen_batch(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in iterator:
        rows = [synth_page(int(i)) for i in pdf["id"].tolist()]
        yield pd.DataFrame(
            {
                "url": [r["url"] for r in rows],
                "warc_ts": [r["warc_ts"] for r in rows],
                "html": [r["html"] for r in rows],
                "text": [r["text"] for r in rows],
                "lang": [r["lang"] for r in rows],
            }
        )


def synth_pages_df(
    spark: SparkSession, n_docs: int, num_partitions: int | None = None
) -> DataFrame:
    """The synthetic corpus as a DataFrame, generated executor-side."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, num_partitions)
    return base.mapInPandas(_gen_batch, schema=PAGES_SPARK_SCHEMA)


def write_pages_parquet(
    spark: SparkSession, n_docs: int, path: str, num_partitions: int | None = None
) -> None:
    synth_pages_df(spark, n_docs, num_partitions).write.mode("overwrite").parquet(path)
