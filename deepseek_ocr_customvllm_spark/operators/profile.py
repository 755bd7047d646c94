"""Generic table profiling — the data-quality pass every ingestion job
runs before trusting a new drop of upstream data (null surges, key
cardinality collapses, out-of-range dates are all caught by exactly
these per-column statistics).

The reference repo validates single uploads (size/type gates at
``app/routers/ocr.py``); a 100 TB table needs the same trust check in
aggregate form, so the Spark rebuild carries it as a first-class
operator.

Scale shape: ONE aggregation statement over one scan.  Typed min/max
and null counts are plain map-side-combinable aggregates; the per-column
exact distinct counts make Catalyst plan a single Expand (k copies of
each row, one per distinct-aggregate) — the same cost as the stacked
explode a hand-rolled profiler would shuffle, but fused into one stage
with partial aggregation.  The wide 1-row result is unpivoted to one
row per column AFTER aggregation, so the unpivot is free.

Float columns are deliberately excluded from the default profile:
double min/max stringification is not dialect-portable (Spark renders
``1.5E4``, DuckDB ``15000.0``); the numeric-stats operators
(``quality_score`` family) carry floats through ``dtrunc`` instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column profile: ``(col_name, n_rows, n_nonnull, n_distinct,
    min_val, max_val)`` with min/max computed on the NATIVE type and
    stringified afterwards (lexicographic min/max of stringified
    numbers would report ``'10' < '9'``)."""
    if not columns:
        raise ValueError("table_profile needs at least one column")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in columns:
        aggs.append(F.count(F.col(c)).cast("bigint").alias(f"nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).cast("bigint").alias(f"nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"mn_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"mx_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in columns
    )
    return wide.select(
        F.expr(
            f"stack({len(columns)}, {stack_args}) AS "
            "(col_name, n_nonnull, n_distinct, min_val, max_val)"
        ),
        "n_rows",
    ).select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val")
