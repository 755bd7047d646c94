"""Driver-contract parity tests: every oracled query in
``__spark_entry__`` must produce value-identical results from Spark and
from DuckDB over the same parquet tables (mirrors the driver's
CORRECTNESS check: row count + schema + order-insensitive values).
"""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
# VALUES-literal oracles are computed from the oracle SF dir at module
# import; keep it in lockstep with the SF this test compares at.
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_DIR

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    sort_cols = list(df.columns)
    df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    return df


def _value_kind(v):
    """Coarse type kind, Decimal distinct from int: the driver hashes typed
    values, so a DuckDB decimal128 next to a Spark int64 hash-mismatches even
    when numerically equal (round-1 `flagship_doc_stats` regression)."""
    import decimal

    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, (int,)):
        return "int"
    if isinstance(v, float):
        return "float"
    return type(v).__name__


def _assert_kinds_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    for col in spark_pdf.columns:
        if col not in duck_pdf.columns:
            continue
        ka = next((k for k in map(_value_kind, spark_pdf[col]) if k), None)
        kb = next((k for k in map(_value_kind, duck_pdf[col]) if k), None)
        assert ka == kb, (
            f"{name}: col {col}: value-type kind differs (spark={ka}, duck={kb})"
            " — driver value-hash would mismatch; cast the oracle (NOTES.md #7)"
        )


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    _assert_kinds_match(spark_pdf, duck_pdf, name)
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: column names differ"
    assert len(a) == len(b), f"{name}: row counts differ ({len(a)} vs {len(b)})"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                ok = (
                    (pd.isna(x) and pd.isna(y))
                    or math.isclose(float(x), float(y), rel_tol=1e-9, abs_tol=1e-9)
                )
            else:
                ok = x == y
            assert ok, f"{name}: col {col} row {i}: spark={x!r} duck={y!r}"


_ORACLES = entrymod.oracle_sql()
_QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(_ORACLES), ids=sorted(_ORACLES))
def test_oracle_parity(name, spark, duck):
    spark_df = _QUERIES[name](spark, SF_DIR)
    spark_pdf = spark_df.toPandas()
    duck_pdf = duck.execute(_ORACLES[name]).fetchdf()
    _compare(spark_pdf, duck_pdf, name)


def test_every_query_has_an_oracle():
    """No rows-only queries: every queries() entry must carry a full
    DuckDB oracle (the driver's strongest check).  If a future operator
    genuinely cannot be SQL-expressed, document it here and relax this —
    deliberately, not by a silent skip."""
    assert set(_QUERIES) == set(_ORACLES)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_every_oracle_has_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_no_oracle_emits_driver_hostile_types(duck):
    """NOTES.md portability rule #7, enforced: no oracle may surface a
    DECIMAL/HUGEINT/unsigned column (DuckDB SUM(INTEGER) -> decimal128,
    SUM(BIGINT) -> hugeint), because the driver's value hash sees the
    Arrow type and mismatches Spark's int64 even when values are equal."""
    for name, sql in _ORACLES.items():
        desc = duck.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in desc:
            assert not any(
                k in typ.upper()
                for k in ("DECIMAL", "HUGEINT", "UINTEGER", "UBIGINT")
            ), f"{name}.{col} is {typ} — cast it (NOTES.md rule #7)"
