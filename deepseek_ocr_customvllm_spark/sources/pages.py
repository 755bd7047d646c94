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


def _gen_batch(
    iterator: Iterator[pd.DataFrame], scale: int = 1
) -> Iterator[pd.DataFrame]:
    for pdf in iterator:
        rows = [synth_page(int(i), scale) for i in pdf["id"].tolist()]
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
    spark: SparkSession,
    n_docs: int,
    num_partitions: int | None = None,
    scale: int = 1,
) -> DataFrame:
    """The synthetic corpus as a DataFrame, generated executor-side."""
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, num_partitions)
    return base.mapInPandas(
        lambda it: _gen_batch(it, scale), schema=PAGES_SPARK_SCHEMA
    )


_NAV_HTML = (
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li>'
    '<li><a href="/contact">Contact</a></li><li><a href="/blog">Blog</a></li></ul></nav>'
)
_FOOTER_HTML = (
    '<footer><a href="/privacy">Privacy</a> <a href="/terms">Terms</a>'
    " <span>© 2025 docs.test</span></footer>"
)


def pages_from_documents(docs_df: DataFrame) -> DataFrame:
    """Wrap the testdata ``documents`` table into ``pages`` rows.

    A deterministic HTML template (with real nav/footer boilerplate the
    extractor must strip) built entirely from JVM-side ``concat`` — no
    Python in the path.  Gives the extraction pipeline a corpus derived
    from the driver's own tables.
    """
    from pyspark.sql import functions as F

    html = F.concat(
        F.lit("<html><head><title>doc</title></head><body>"),
        F.lit(_NAV_HTML),
        F.lit("<article><h1>Document "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p></article>"),
        F.lit(_FOOTER_HTML),
        F.lit("</body></html>"),
    )
    return docs_df.select(
        F.concat(
            F.lit("https://docs.test/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.expr("timestampadd(SECOND, cast(doc_id as int), TIMESTAMP '2025-01-01 00:00:00')").alias(
            "warc_ts"
        ),
        html.cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def write_pages_parquet(
    spark: SparkSession,
    n_docs: int,
    path: str,
    num_partitions: int | None = None,
    scale: int = 1,
) -> None:
    synth_pages_df(spark, n_docs, num_partitions, scale).write.mode(
        "overwrite"
    ).parquet(path)
