"""Bucketed-table layout for shuffle-free url joins.

At 100 TB every url-keyed join (resume anti-join, state merge staging,
extracted x annotations) shuffles both sides unless the tables are
co-bucketed.  Writing ``extracted`` and ``extraction_state`` bucketed by
``url`` into the warehouse makes those joins zero-exchange: Spark reads
matching buckets pairwise.

(The Iceberg twin of this layout is ``PARTITIONED BY (bucket(N, url))``;
the sandbox uses Spark's native bucketed parquet tables.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 16


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int = DEFAULT_BUCKETS,
    key: str = "url",
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted table keyed for url joins."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "url", how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key (no shuffle)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
