"""Deduplication operators: exact, MinHash+LSH, SimHash.

The scale path for corpus dedup (10^12 docs):

- **exact**: md5 of normalized text, hash-groupBy — one shuffle on the
  fingerprint, map-side partial aggregation for free.
- **MinHash + LSH**: word-3-gram shingles -> ``N_HASHES`` seeded-md5
  minhashes -> banded bucket keys -> self-join on band buckets (only
  bucket-mates are compared; never O(n^2)) -> exact n-gram Jaccard
  verification of the candidates.
- **SimHash**: 32-bit signature from per-token hashes via bitwise
  majority vote; near-dup pairs block on the 4 signature bytes and
  verify with ``bit_count(xor) <= HAMMING_MAX``.

Portability contract: every hash is derived from md5 hex (identical in
Spark and DuckDB) — never engine-private hashes like ``xxhash64`` — so
the driver's DuckDB oracle reproduces results bit-for-bit.  The integer
nibble-fold ``HEX32_SQL`` converts the first 8 md5 hex chars to a bigint
using only ``instr``/``substr`` arithmetic, which both dialects evaluate
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_HASHES = 8  # minhash signature length
N_BANDS = 4  # bands of 2 hashes each
JACCARD_MIN = 0.5
HAMMING_MAX = 3
SHINGLE_WORDS = 3


def hex32_sql(col_expr: str) -> str:
    """Dialect-portable SQL: first 8 hex chars of md5(col) -> bigint."""
    terms = " + ".join(
        f"(cast(instr('0123456789abcdef', substr(md5({col_expr}), {k}, 1)) as bigint) - 1) * {16 ** (8 - k)}"
        for k in range(1, 9)
    )
    return f"({terms})"


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def shingles(df: DataFrame) -> DataFrame:
    """``documents(doc_id, text)`` -> distinct ``(doc_id, sh)`` word
    3-gram shingles of the normalized text."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    d = df.select("doc_id", norm.alias("t")).filter(F.col("t") != "")
    d = d.withColumn("ts", F.split("t", " ")).filter(F.size("ts") >= SHINGLE_WORDS)
    sh = F.explode(
        F.expr(
            "transform(sequence(0, size(ts) - 3), "
            "i -> concat(ts[i], ' ', ts[i+1], ' ', ts[i+2]))"
        )
    )
    return d.select("doc_id", sh.alias("sh")).distinct()


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame) -> DataFrame:
    """Duplicate groups by md5 of normalized text."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    fp = df.select("doc_id", F.md5(norm.cast("binary")).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_dups") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(sh: DataFrame) -> DataFrame:
    """``(doc_id, sh)`` -> one row per doc with minhash columns m0..m7."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")).cast("binary"))).alias(
            f"m{i}"
        )
        for i in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """Band the signatures (2 hashes per band) and self-join on bucket."""
    bands = None
    for b in range(N_BANDS):
        part = sig.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.md5(F.concat(F.col(f"m{2 * b}"), F.col(f"m{2 * b + 1}")).cast("binary")).alias(
                "bk"
            ),
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.alias("a")
    b_ = bands.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    cand: DataFrame, sh: DataFrame, jaccard_min: float = JACCARD_MIN
) -> DataFrame:
    """Exact n-gram Jaccard for the LSH candidates."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cand.join(sh.alias("s1"), F.col("id_a") == F.col("s1.doc_id"))
        .join(
            sh.alias("s2"),
            (F.col("id_b") == F.col("s2.doc_id")) & (F.col("s1.sh") == F.col("s2.sh")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_int"))
    )
    joined = (
        inter.join(sizes.alias("na"), F.col("id_a") == F.col("na.doc_id"))
        .join(sizes.alias("nb"), F.col("id_b") == F.col("nb.doc_id"))
        .select(
            "id_a",
            "id_b",
            # floor-truncation, not round(): portable across engines
            (
                F.floor(
                    F.col("n_int")
                    * F.lit(10000.0)
                    / (F.col("na.n") + F.col("nb.n") - F.col("n_int"))
                )
                / 10000
            ).alias("jaccard"),
        )
    )
    return joined.filter(F.col("jaccard") >= jaccard_min)


def minhash_lsh_duplicates(df: DataFrame) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline over ``documents``."""
    sh = shingles(df)
    sig = minhash_signatures(sh)
    cand = lsh_candidate_pairs(sig)
    return jaccard_verify(cand, sh)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(df: DataFrame) -> DataFrame:
    """32-bit simhash per document (md5-derived, dialect-portable)."""
    spark = df.sparkSession
    df.createOrReplaceTempView("_simhash_in")
    v = hex32_sql("tok")
    bit_aggs = ",\n    ".join(
        f"sum(case when cast(floor(v / {2 ** b}.0) as bigint) % 2 = 1 then 1 else -1 end) AS b{b}"
        for b in range(32)
    )
    sim = " + ".join(f"(case when b{b} > 0 then {2 ** b} else 0 end)" for b in range(32))
    return spark.sql(
        f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\\\s+', ' ') AS t
  FROM _simhash_in
),
toks AS (
  SELECT doc_id, explode(split(t, ' ')) AS tok FROM norm WHERE t <> ''
),
vals AS (
  SELECT doc_id, {v} AS v FROM toks
),
bits AS (
  SELECT doc_id,
    {bit_aggs}
  FROM vals GROUP BY doc_id
)
SELECT doc_id, cast({sim} as bigint) AS simhash FROM bits
"""
    )


def simhash_near_pairs(sig: DataFrame, hamming_max: int = HAMMING_MAX) -> DataFrame:
    """Near-dup pairs: block on signature bytes, verify Hamming distance."""
    bands = None
    for k in range(4):
        part = sig.select(
            "doc_id",
            "simhash",
            F.lit(k).alias("band"),
            (
                F.floor(F.col("simhash") / F.lit(256 ** k)).cast("bigint") % 256
            ).alias("bk"),
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.alias("a")
    b_ = bands.alias("b")
    pairs = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.expr("bit_count(sim_a ^ sim_b)")
    return pairs.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= hamming_max)
