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
- **Versioned parquet** (the sandbox fallback): MERGE is INCREMENTAL.
  State rows are hash-bucketed on url (``pmod(xxhash64(url), n_buckets)``,
  the same expression the extraction repartition and the Iceberg
  ``bucket(N, url)`` partition transform use); each merge writes ONLY the
  buckets the batch touches into a new version directory ``v_{k:08d}``
  plus a manifest mapping every bucket to the version that last wrote it.
  The manifest file is the atomic commit marker (written last, via
  tmp-file + rename): a crash anywhere before it leaves a dangling data
  directory that readers never consult.  Reads assemble the current state
  by partition-pruned scans of each bucket's owning version.  Cost per
  merge is O(batch + changed-bucket data), not O(total state) — at 10^12
  urls a checkpoint no longer rewrites the world.  Old versions are
  retained for time travel and expired only when no live manifest
  references them.  (Concurrent writers are out of scope — that is what
  the Iceberg catalog's optimistic commit provides in production.)
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional

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

# Explicit read schema (state columns + the bucket partition column):
# schema inference fails on a version directory whose write produced zero
# rows (e.g. a delete that emptied every changed bucket).
_READ_SCHEMA = T.StructType(
    list(STATE_SCHEMA.fields) + [T.StructField("bucket", T.IntegerType())]
)


def extracted_table_ddl(table: str, n_buckets: int = 1024) -> str:
    """Iceberg DDL for the production ``extracted`` table (K3).

    Partition layout per the scale design: ``days(warc_ts)`` for time
    pruning of crawl segments, ``bucket(N, url)`` so the extraction
    job's salted url-hash placement maps 1:1 onto the physical layout
    (a bucket-local scan extracts with ZERO shuffle — see
    ``operators.extract.extract_pages(repartition=False)`` and the
    no-Exchange plan test).  Columns are generated from the one
    authoritative schema, ``operators.extract.EXTRACTED_SCHEMA``.
    """
    from ..operators.extract import EXTRACTED_SCHEMA

    cols = ",\n  ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in EXTRACTED_SCHEMA.fields
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {table} (\n  {cols}\n)\n"
        f"USING iceberg\n"
        f"PARTITIONED BY (days(warc_ts), bucket({n_buckets}, url))"
    )


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
    """Incremental versioned-bucket MERGE emulation over parquet.

    Layout::

        root/
          v_00000001/bucket=<b>/...parquet   # only buckets merge #1 touched
          v_00000001.manifest.json           # commit marker:
                                             # {"buckets": {bucket: owning_version},
                                             #  "applied": {stream_id: last_batch_id}}
          v_00000002/bucket=<b>/...
          v_00000002.manifest.json

    A version is live iff its manifest exists; the manifest is written via
    tmp-file + atomic rename AFTER the data, so a crash mid-write leaves
    only a dangling ``v_k`` directory that no reader consults and the next
    merge safely overwrites.
    """

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 64):
        self.spark = spark
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)

    # -- versions / manifests ------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, f"v_{version:08d}.manifest.json")

    def _versions(self) -> list:
        out = []
        for name in os.listdir(self.root):
            m = _VERSION_RE.match(name)
            if m and os.path.exists(self._manifest_path(int(m.group(1)))):
                out.append(int(m.group(1)))
        return sorted(out)

    def current_version(self) -> Optional[int]:
        vs = self._versions()
        return vs[-1] if vs else None

    def _path(self, version: int) -> str:
        return os.path.join(self.root, f"v_{version:08d}")

    def _manifest_full(self, version: int) -> Dict:
        """{"buckets": {bucket: owner_version}, "applied": {stream_id:
        last_batch_id}} — reads both the current format and the legacy
        flat bucket map."""
        with open(self._manifest_path(version), encoding="utf-8") as f:
            raw = json.load(f)
        if "buckets" in raw and isinstance(raw["buckets"], dict):
            return {
                "buckets": {int(k): int(v) for k, v in raw["buckets"].items()},
                "applied": dict(raw.get("applied", {})),
            }
        return {
            "buckets": {int(k): int(v) for k, v in raw.items()},
            "applied": {},
        }

    def _manifest(self, version: int) -> Dict[int, int]:
        return self._manifest_full(version)["buckets"]

    def _commit(
        self, version: int, manifest: Dict[int, int], applied: Optional[Dict] = None
    ) -> None:
        payload = {
            "buckets": {str(k): v for k, v in manifest.items()},
            "applied": applied or {},
        }
        tmp = self._manifest_path(version) + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(payload, f)
        os.rename(tmp, self._manifest_path(version))  # atomic commit point

    def _bucket(self, col: F.Column) -> F.Column:
        return F.pmod(F.xxhash64(col), F.lit(self.n_buckets)).cast("int")

    # -- read ----------------------------------------------------------------
    def read(
        self, version: Optional[int] = None, buckets: Optional[list] = None
    ) -> DataFrame:
        """Current (or time-travelled) state; empty DataFrame if none.

        Assembled per bucket from the version that last wrote it —
        partition-pruned scans, one per referenced version.  ``buckets``
        restricts the read to those url-hash buckets (merge/delete use
        this so their cost is O(changed buckets), not O(state)).
        """
        v = version if version is not None else self.current_version()
        if v is None:
            return self.spark.createDataFrame([], STATE_SCHEMA)
        by_version: Dict[int, list] = {}
        for bucket, owner in self._manifest(v).items():
            if buckets is not None and bucket not in buckets:
                continue
            by_version.setdefault(owner, []).append(bucket)
        parts = []
        for owner, owned in sorted(by_version.items()):
            parts.append(
                self.spark.read.schema(_READ_SCHEMA)
                .parquet(self._path(owner))
                .filter(F.col("bucket").isin(owned))
                .select("url", "status", "attempt", "updated_at")
            )
        if not parts:
            return self.spark.createDataFrame([], STATE_SCHEMA)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    # -- merge ----------------------------------------------------------------
    def _write_buckets(
        self, rows: DataFrame, changed: list, applied_update: Optional[Dict] = None
    ) -> int:
        """Write rows (already restricted to the changed buckets) as the
        next version; commit by copying the previous manifest forward and
        repointing the changed buckets.  ``applied_update`` merges into
        the manifest's stream-batch ledger IN THE SAME atomic commit (the
        basis of the streaming exactly-once guard).  Returns the new
        version."""
        prev = self.current_version()
        full = (
            self._manifest_full(prev)
            if prev is not None
            else {"buckets": {}, "applied": {}}
        )
        manifest = full["buckets"]
        applied = full["applied"]
        if applied_update:
            applied.update(applied_update)
        new_version = (prev or 0) + 1
        (
            rows.withColumn("bucket", self._bucket(F.col("url")))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(self._path(new_version))
        )
        for b in changed:
            manifest[b] = new_version
        self._commit(new_version, manifest, applied)
        return new_version

    def last_applied(self, stream_id: str) -> int:
        """Last micro-batch id MERGEd for ``stream_id`` (-1 if none)."""
        v = self.current_version()
        if v is None:
            return -1
        return int(self._manifest_full(v)["applied"].get(stream_id, -1))

    def applied_map(self) -> Dict[str, int]:
        """The full ``{stream_id: last_batch_id}`` ledger of the current
        version (empty if no version exists).  The streaming dedup sink
        uses content-derived stream ids, so listing the ledger IS
        listing the committed batches."""
        v = self.current_version()
        if v is None:
            return {}
        return dict(self._manifest_full(v)["applied"])

    def merge(
        self,
        batch: DataFrame,
        stream_id: Optional[str] = None,
        batch_id: Optional[int] = None,
    ) -> int:
        """MERGE the batch ``(url, status, updated_at)`` into the state.

        Matched urls: status/updated_at replaced, attempt incremented.
        New urls: inserted with attempt=1.  Touches ONLY the url-hash
        buckets present in the batch; untouched buckets keep their old
        version (no rewrite).  Returns the new version.

        ``stream_id``/``batch_id`` make the merge IDEMPOTENT per
        micro-batch for Structured Streaming's ``foreachBatch`` replay
        contract: a batch id at or below the ledger entry committed with
        the last manifest is skipped outright (replaying it would
        double-increment ``attempt``); the ledger update rides in the
        same atomic manifest rename as the data commit.
        """
        if (stream_id is None) != (batch_id is None):
            # one without the other silently disables the idempotence
            # guard — the exact corruption the ledger exists to prevent
            raise ValueError("stream_id and batch_id must be passed together")
        if stream_id is not None and batch_id is not None:
            if batch_id <= self.last_applied(stream_id):
                return self.current_version() or 0
        batch = batch.select("url", "status", "updated_at")
        changed = [
            r["b"]
            for r in batch.select(self._bucket(F.col("url")).alias("b"))
            .distinct()
            .collect()
        ]
        if not changed:
            # An EMPTY ledgered batch must still advance the ledger: a
            # fully-dropped micro-batch (every doc deduped away) that
            # never records its batch id is re-executed in full on every
            # replay, forever.  Commit a data-free version that only
            # carries the applied update forward.
            if stream_id is not None:
                prev = self.current_version()
                full = (
                    self._manifest_full(prev)
                    if prev is not None
                    else {"buckets": {}, "applied": {}}
                )
                full["applied"][stream_id] = int(batch_id)
                new_version = (prev or 0) + 1
                # _versions() lists data DIRS (manifest alone is
                # invisible): materialize an empty one, then commit
                os.makedirs(self._path(new_version), exist_ok=True)
                self._commit(new_version, full["buckets"], full["applied"])
                return new_version
            return self.current_version() or 0
        current = self.read(buckets=changed)

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
        applied_update = (
            {stream_id: int(batch_id)}
            if stream_id is not None and batch_id is not None
            else None
        )
        return self._write_buckets(merged, changed, applied_update)

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
        delete-then-reupload flow).  Rewrites only the affected buckets;
        returns the new version."""
        changed = [
            r["b"]
            for r in urls_df.select(self._bucket(F.col("url")).alias("b"))
            .distinct()
            .collect()
        ]
        if not changed:
            return self.current_version() or 0
        current = self.read(buckets=changed)
        remaining = current.join(urls_df.select("url"), "url", "left_anti")
        return self._write_buckets(remaining, changed)

    # -- maintenance -------------------------------------------------------
    def expire_versions(self, keep_last: int = 3) -> int:
        """Snapshot expiry (Iceberg ``expire_snapshots`` analogue, K7).

        Keeps the last ``keep_last`` manifests for time travel and any
        older version directory still referenced by a kept manifest —
        expiring a version never orphans a live bucket.
        """
        import shutil

        vs = self._versions()
        kept = vs[-keep_last:] if keep_last > 0 else []
        referenced = set(kept)
        for v in kept:
            referenced.update(self._manifest(v).values())
        removed = 0
        for v in vs:
            if v in referenced:
                continue
            shutil.rmtree(self._path(v), ignore_errors=True)
            os.remove(self._manifest_path(v))
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
