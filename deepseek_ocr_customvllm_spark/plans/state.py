"""Checkpoint / resume state store.

Rebuilds the reference's ``ocr_jobs`` durability contract
(``app/models/documents.py:20-59``: PENDING -> QUEUED -> RUNNING ->
SUCCESS | FAILED, updated per job) as a table
``extraction_state(url, status, attempt, updated_at)`` maintained by
MERGE semantics, with resume = left-anti join of ``pages`` against
terminal states.

Two backends:

- **Iceberg** (the production path, SURVEY.md §2.10 K4): a real
  ``MERGE INTO <table> USING batch ON url WHEN MATCHED UPDATE ... WHEN
  NOT MATCHED INSERT ...`` against a configured catalog — atomic,
  exactly-once, snapshot-isolated.  Used when the session has an
  Iceberg catalog; the local test image has no Iceberg jars, so this
  path is exercised only for SQL generation.
- **Versioned parquet** (the sandbox fallback): each merge writes a new
  complete snapshot directory ``v_{k:08d}`` and readers take the highest
  complete version (a ``_SUCCESS``-marked directory), which reproduces
  Iceberg's snapshot-commit semantics (commit = atomic appearance of a
  new version; readers never see partial writes).  Old versions are
  retained for time travel and can be expired.
"""

from __future__ import annotations

import os
import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

STATE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.StringType()),
        T.StructField("attempt", T.IntegerType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

# Terminal states excluded from re-processing on resume. REJECTED rows
# (oversize quarantine, routes/ocr.py:42-43) are terminal too — retrying
# cannot change the outcome. FAILED rows ARE retried (the reference
# allows re-enqueueing a failed job).
TERMINAL_STATES = ("SUCCESS", "REJECTED")

_VERSION_RE = re.compile(r"^v_(\d{8})$")


def merge_sql(target_table: str, source_view: str) -> str:
    """The Iceberg MERGE statement for the production path (K4)."""
    return f"""
MERGE INTO {target_table} t
USING {source_view} s
ON t.url = s.url
WHEN MATCHED THEN UPDATE SET
  t.status = s.status,
  t.attempt = t.attempt + 1,
  t.updated_at = s.updated_at
WHEN NOT MATCHED THEN INSERT (url, status, attempt, updated_at)
VALUES (s.url, s.status, 1, s.updated_at)
""".strip()


class ParquetStateStore:
    """Versioned-snapshot MERGE emulation over parquet (sandbox backend)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- versions ----------------------------------------------------------
    def _versions(self) -> list:
        out = []
        for name in os.listdir(self.root):
            m = _VERSION_RE.match(name)
            if m and os.path.exists(os.path.join(self.root, name, "_SUCCESS")):
                out.append(int(m.group(1)))
        return sorted(out)

    def current_version(self) -> Optional[int]:
        vs = self._versions()
        return vs[-1] if vs else None

    def _path(self, version: int) -> str:
        return os.path.join(self.root, f"v_{version:08d}")

    # -- read --------------------------------------------------------------
    def read(self, version: Optional[int] = None) -> DataFrame:
        """Current (or time-travelled) state; empty DataFrame if none."""
        v = version if version is not None else self.current_version()
        if v is None:
            return self.spark.createDataFrame([], STATE_SCHEMA)
        return self.spark.read.parquet(self._path(v))

    # -- merge -------------------------------------------------------------
    def merge(self, batch: DataFrame) -> int:
        """MERGE the batch ``(url, status, updated_at)`` into the state.

        Matched urls: status/updated_at replaced, attempt incremented.
        New urls: inserted with attempt=1.  Returns the new version.
        """
        current = self.read()
        batch = batch.select("url", "status", "updated_at")

        joined = batch.alias("s").join(
            current.select("url", F.col("attempt").alias("prev_attempt")).alias("t"),
            "url",
            "left",
        )
        updates = joined.select(
            "url",
            "status",
            (F.coalesce(F.col("prev_attempt"), F.lit(0)) + 1).alias("attempt"),
            "updated_at",
        )
        untouched = current.join(batch.select("url"), "url", "left_anti")
        merged = untouched.select("url", "status", "attempt", "updated_at").unionByName(
            updates
        )
        # Defensive de-dup: if the batch itself carried duplicate urls,
        # keep the latest update (MERGE would reject such a batch;
        # we resolve deterministically instead).
        w = Window.partitionBy("url").orderBy(
            F.col("updated_at").desc(), F.col("status")
        )
        merged = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

        new_version = (self.current_version() or 0) + 1
        merged.write.mode("overwrite").parquet(self._path(new_version))
        return new_version

    # -- resume ------------------------------------------------------------
    def pending(self, pages_df: DataFrame) -> DataFrame:
        """Rows of ``pages`` not yet in a terminal state (S4: the resume
        left-anti join, reference PK lookup at ocr_service.py:62)."""
        done = self.read().filter(F.col("status").isin(*TERMINAL_STATES)).select("url")
        return pages_df.join(done, "url", "left_anti")

    # -- delete (K7: reference delete endpoint purges the DB row,
    #    app/api/routes/ocr.py:136-212) ------------------------------------
    def delete_urls(self, urls_df: DataFrame) -> int:
        """Remove the given urls from the state entirely (a re-ingested
        url is then treated as brand new, matching the reference's
        delete-then-reupload flow).  Returns the new version."""
        current = self.read()
        remaining = current.join(urls_df.select("url"), "url", "left_anti")
        new_version = (self.current_version() or 0) + 1
        remaining.write.mode("overwrite").parquet(self._path(new_version))
        return new_version

    # -- maintenance -------------------------------------------------------
    def expire_versions(self, keep_last: int = 3) -> int:
        """Snapshot expiry (Iceberg ``expire_snapshots`` analogue, K7)."""
        import shutil

        vs = self._versions()
        removed = 0
        for v in vs[:-keep_last] if keep_last > 0 else vs:
            shutil.rmtree(self._path(v), ignore_errors=True)
            removed += 1
        return removed


class IcebergStateStore:
    """Production backend: real Iceberg MERGE INTO (requires a catalog)."""

    def __init__(self, spark: SparkSession, table: str):
        self.spark = spark
        self.table = table
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {table} "
            "(url string, status string, attempt int, updated_at timestamp)"
        )

    def read(self) -> DataFrame:
        return self.spark.table(self.table)

    def merge(self, batch: DataFrame) -> None:
        batch.select("url", "status", "updated_at").createOrReplaceTempView(
            "_state_batch"
        )
        self.spark.sql(merge_sql(self.table, "_state_batch"))

    def pending(self, pages_df: DataFrame) -> DataFrame:
        done = self.read().filter(F.col("status").isin(*TERMINAL_STATES)).select("url")
        return pages_df.join(done, "url", "left_anti")


def open_state_store(spark: SparkSession, location: str):
    """``iceberg:<table>`` -> IcebergStateStore, else parquet directory."""
    if location.startswith("iceberg:"):
        return IcebergStateStore(spark, location.split(":", 1)[1])
    return ParquetStateStore(spark, location)
