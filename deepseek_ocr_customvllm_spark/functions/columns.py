"""Dialect-portable column expressions.

Every computed value that a DuckDB oracle must reproduce bit-for-bit goes
through these helpers (the portability rules live in NOTES.md):

- :func:`dtrunc` instead of ``round()`` — Spark rounds the shortest decimal
  representation (HALF_UP) while DuckDB rounds the raw binary double, so
  values ending in ...5 at the cut position disagree between engines.
- :func:`dsum` instead of ``sum()`` on doubles — float summation order
  differs between Spark's partial aggregation and a single-node engine;
  decimal-cast summation is exact integer arithmetic.
- :func:`norm_text` — THE shared text normalization every text operator and
  every oracle CTE uses (``_NORM_DUCK`` in ``__spark_entry__`` is its DuckDB
  twin); changing one without the other breaks every hash-compared result.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Charset for caller-supplied salts that get interpolated into generated
# SQL fragments (curation._md5_bigint, dedup.simhash_signatures).  ONE
# definition: two copies of a security-relevant charset can drift.
_SALT_SAFE = re.compile(r"^[A-Za-z0-9_.:|-]*$")


def ensure_safe_salt(salt: str) -> str:
    """Validate a salt destined for SQL-string interpolation.

    A quote or backslash would break — or worse, rewrite — the generated
    expression, so anything outside the safe charset is rejected.
    ``fullmatch``, not ``match``: ``$`` would accept a trailing
    newline."""
    if not _SALT_SAFE.fullmatch(salt):
        raise ValueError(
            "salt must match [A-Za-z0-9_.:|-]*, got %r" % (salt,)
        )
    return salt


# Explicit class, NOT \s: Java's \s includes \x0B while RE2's (the
# DuckDB oracle dialect) does not — the one divergence between them.
# Semantically identical to \s+ in both engines for this class.
WHITESPACE_RE = r"[ \t\n\r\f\x0B]+"


def norm_text(col: str = "text") -> Column:
    """Whitespace-collapsed lowercase text (the shared normalization —
    every operator that tokenizes text MUST go through this helper so
    their tokenizations cannot drift apart)."""
    return F.regexp_replace(F.trim(F.lower(F.col(col))), WHITESPACE_RE, " ")


def dtrunc(col: Column, n: int = 4) -> Column:
    """Floor-truncate a double to ``n`` decimals.

    ``floor(x * 10^n) / 10^n`` is bit-identical in Spark, DuckDB, and a
    Python ``math.floor`` twin for identical double inputs.
    """
    p = 10 ** n
    return F.floor(col * p) / p


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent exact sum of a double column.

    Casting to decimal before summing makes the aggregation exact integer
    arithmetic — immune to float-summation-order differences between Spark
    partial aggregation and the DuckDB oracle.  ``scale`` must cover the
    data's true decimal precision.
    """
    return F.sum(col.cast(f"decimal(28,{scale})")).cast("double")
