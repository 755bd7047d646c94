"""Similarity search over an embedding column (``array<float>``).

Two tiers, mirroring what a 100 TB training-data pipeline needs:

- **brute-force top-k** (the correctness baseline): broadcast the query
  set, score every (query, candidate) pair with an exact
  integer-quantized dot product, rank per query.  The quantization
  (``round(x * 1000)`` per component) makes the arithmetic exact
  integer math — bit-identical across engines and partitionings, no
  float-summation-order nondeterminism.
- **LSH bucketing** (the scale path): signed-random-hyperplane buckets
  (``K_PLANES`` frozen ±1 hyperplanes, seeded) so candidate generation
  becomes an equi-join on bucket id instead of a cross join.

JVM-side throughout: ``zip_with``/``aggregate`` higher-order functions,
no Python UDFs.
"""

from __future__ import annotations

import random
from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUANT = 1000
K_PLANES = 8
DIM = 64
HYPERPLANE_SEED = 777
TOP_K = 5
QUERY_MOD = 50  # vec_id % QUERY_MOD == 0 -> query vector


def hyperplanes(k: int = K_PLANES, dim: int = DIM, seed: int = HYPERPLANE_SEED) -> List[List[int]]:
    """Frozen ±1 hyperplanes (sign random projections, Charikar 2002)."""
    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(k)]


def quantized(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Add ``qe``: the integer-quantized embedding."""
    return df.withColumn(
        "qe", F.expr(f"transform({col}, x -> cast(round(x * {QUANT}) as bigint))")
    )


def _dot(a: str, b: str) -> F.Column:
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, x) -> acc + x)")


def topk_dot_neighbors(
    emb: DataFrame, top_k: int = TOP_K, query_mod: int = QUERY_MOD
) -> DataFrame:
    """Exact top-k max-inner-product neighbors for the query subset."""
    q = quantized(emb).select("vec_id", "qe")
    queries = q.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("qv")
    )
    pairs = F.broadcast(queries).crossJoin(q).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), _dot("qv", "qe").alias("dot")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )


def lsh_buckets(emb: DataFrame) -> DataFrame:
    """Signed-hyperplane bucket id per vector (the ANN scale path:
    bucket equi-join replaces the cross join for candidate generation)."""
    q = quantized(emb).select("vec_id", "qe")
    planes = hyperplanes()
    bucket = None
    for k, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"{w}L" for w in plane) + ")"
        bit = F.when(_dot("qe", arr) > 0, F.lit(2 ** k)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    return q.select("vec_id", bucket.cast("bigint").alias("bucket"))


def embedding_norm_stats(emb: DataFrame) -> DataFrame:
    """Per-label quantized-norm statistics (sanity/monitoring tier)."""
    q = quantized(emb)
    sq = _dot("qe", "qe")
    return (
        q.select("label", sq.alias("sqnorm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            (F.floor(F.avg("sqnorm") * 100) / 100).alias("avg_sqnorm"),
            F.max("sqnorm").alias("max_sqnorm"),
        )
    )
