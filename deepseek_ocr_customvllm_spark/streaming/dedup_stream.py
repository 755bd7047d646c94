"""Stateful streaming deduplication — exactly-once urls on an unbounded
stream.

The batch job gets exactly-once via the state-table anti-join; the
streaming equivalent keeps the seen-set in Spark's state store with
``applyInPandasWithState``: pages are grouped by a url-hash shard key
(bounded group count -> bounded state partitions), each group's state
holds the set of seen urls, and only first-seen rows are emitted.

This is the custom-stateful-operator tier (SURVEY.md §2.8): nothing in
the built-in operator set expresses "emit first occurrence per key,
forever, with shardable state" for a batch-composable output — built-in
``dropDuplicates`` on a stream needs a watermark to bound state, while
the crawl use-case wants explicit shard-local seen-sets that can be
snapshotted/restored with the checkpoint.

State-size honesty: ``applyInPandasWithState`` rewrites each group's
state value wholesale every micro-batch, so ``first_seen_stream``'s
per-batch cost is O(urls seen so far) per shard and grows without bound.
The state entry is a fixed-width md5 digest (16 bytes/url, collision
odds ~n²/2¹²⁹) to keep the array compact.  For the truly unbounded
crawl, ``bounded_first_seen_stream`` implements the snapshot pattern:
stream state holds ONLY the recent window; older entries are flushed to
a per-shard parquet snapshot (the durable seen-store), and first-seen
checks consult window ∪ snapshot.

Exactly-once across restart (why the flush is safe): a shard's group
function runs at most once per micro-batch, so a per-shard ``tick``
counter in state is a logical clock.  Entries are flushed only when
``tick_added < current_tick`` — i.e. only after the batch that emitted
them has COMMITTED (only the current batch can be uncommitted; all prior
state commits succeeded or we wouldn't see this tick).  The flush itself
is a set-union merge + atomic ``os.replace``, so a crash between the
file write and the batch commit merely re-merges the same digests on
replay — idempotent — while the replayed batch still suppresses those
urls because the restored state window ∪ snapshot union is unchanged.

At cluster scale ``store_path`` must be shared storage, and the
per-invocation snapshot read would be fronted by a bloom filter kept in
state (read the snapshot only on possible hits) or replaced by the
Iceberg MERGE state table — documented trade-offs, same algorithm.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

N_SHARDS = 64

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
    ]
)

# Fixed-width md5 digests, not raw urls: bounds per-entry state size.
STATE_SCHEMA = T.StructType(
    [T.StructField("seen", T.ArrayType(T.BinaryType()))]
)


def _dedup_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import hashlib

    # bytes(), not raw elements: Spark may hand binary back as bytearray,
    # which is unhashable.
    seen = set(bytes(h) for h in state.get[0]) if state.exists else set()
    out_urls = []
    out_ts = []
    for pdf in pdfs:
        for url, ts in zip(pdf["url"].tolist(), pdf["warc_ts"].tolist()):
            h = hashlib.md5(url.encode("utf-8")).digest()
            if h not in seen:
                seen.add(h)
                out_urls.append(url)
                out_ts.append(ts)
    state.update((list(seen),))
    yield pd.DataFrame(
        {"shard": [key[0]] * len(out_urls), "url": out_urls, "warc_ts": out_ts}
    )


def first_seen_stream(pages_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame -> first-seen (shard, url, warc_ts) rows."""
    sharded = pages_stream.select(
        F.pmod(F.xxhash64("url"), F.lit(N_SHARDS)).cast("int").alias("shard"),
        "url",
        "warc_ts",
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _dedup_group,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# bounded-state variant: recent window in stream state, rest in a durable
# per-shard parquet snapshot (see module docstring for the exactly-once
# argument)
# ---------------------------------------------------------------------------

BOUNDED_STATE_SCHEMA = T.StructType(
    [
        T.StructField("tick", T.IntegerType()),
        T.StructField("seen", T.ArrayType(T.BinaryType())),
        T.StructField("ticks", T.ArrayType(T.IntegerType())),
    ]
)


def _snapshot_path(store_path: str, shard: int) -> str:
    return f"{store_path}/shard_{shard:05d}.parquet"


def _read_snapshot(path: str) -> set:
    import os

    import pyarrow.parquet as pq

    if not os.path.exists(path):
        return set()
    col = pq.read_table(path, columns=["digest"]).column("digest")
    return {bytes(v.as_py()) for v in col}


def _write_snapshot_atomic(path: str, digests: set) -> None:
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp"
    pq.write_table(
        pa.table({"digest": pa.array(sorted(digests), type=pa.binary())}), tmp
    )
    os.replace(tmp, path)  # atomic: readers see old or new, never partial


def make_bounded_dedup_group(store_path: str, max_window: int):
    """Build the per-shard group function (closure carries the knobs)."""

    def _bounded_group(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import hashlib

        shard = int(key[0])
        if state.exists:
            tick0, seen_arr, tick_arr = state.get
            window = {bytes(h): t for h, t in zip(seen_arr, tick_arr)}
        else:
            tick0, window = 0, {}
        tick = tick0 + 1

        snap_file = _snapshot_path(store_path, shard)
        snapshot = _read_snapshot(snap_file)

        out_urls, out_ts = [], []
        for pdf in pdfs:
            for url, ts in zip(pdf["url"].tolist(), pdf["warc_ts"].tolist()):
                h = hashlib.md5(url.encode("utf-8")).digest()
                if h in window or h in snapshot:
                    continue
                window[h] = tick
                out_urls.append(url)
                out_ts.append(ts)

        if len(window) > max_window:
            # flush ONLY committed-batch entries (tick_added < tick): the
            # current batch may still fail and replay, and a replayed
            # first-seen row must not find itself pre-inserted.
            to_flush = {h for h, t in window.items() if t < tick}
            if to_flush:
                _write_snapshot_atomic(snap_file, snapshot | to_flush)
                window = {h: t for h, t in window.items() if t == tick}

        state.update((tick, list(window.keys()), list(window.values())))
        yield pd.DataFrame(
            {"shard": [shard] * len(out_urls), "url": out_urls, "warc_ts": out_ts}
        )

    return _bounded_group


def bounded_first_seen_stream(
    pages_stream: DataFrame,
    store_path: str,
    max_window: int = 100_000,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """``first_seen_stream`` with BOUNDED stream state: at most
    ``max_window`` + one batch of digests per shard stays in the state
    store; everything older lives in the per-shard parquet snapshot under
    ``store_path`` (shared storage on a cluster)."""
    sharded = pages_stream.select(
        F.pmod(F.xxhash64("url"), F.lit(n_shards)).cast("int").alias("shard"),
        "url",
        "warc_ts",
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        make_bounded_dedup_group(store_path, max_window),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=BOUNDED_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# streaming incremental NEAR-dup dedup (round 6)
# ---------------------------------------------------------------------------

INCR_STREAM_ID = "incremental_dedup"

DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

# Explicit schemas for the durable band/shingle store reads: schema
# inference samples parquet footers, and a batch that crashed mid-write
# can leave a torn file in its (uncommitted, filtered-out) partition.
_BANDS_READ_SCHEMA = "doc_id BIGINT, band INT, bk STRING, batch STRING"
_SH_READ_SCHEMA = "doc_id BIGINT, sh STRING, n BIGINT, batch STRING"

_COMPACTION_MANIFEST = "compaction.json"


def _read_compaction(store_dir: str) -> dict:
    """The store's compaction manifest: which committed content keys
    have been folded into which compacted partition.  Absent manifest =
    nothing compacted (the pre-compaction layout)."""
    import json
    import os

    path = os.path.join(store_dir, _COMPACTION_MANIFEST)
    if not os.path.exists(path):
        return {"version": 0, "folded": [], "partition": None}
    with open(path) as f:
        return json.load(f)


def _store_read_paths(
    data_dir: str, committed: list, folded: set, cpart: str | None
) -> list:
    """Resolve the parquet paths holding the committed keys' rows:
    the compacted partition (when one exists) plus one ``batch=<key>``
    dir per not-yet-folded committed key."""
    paths = [f"{data_dir}/batch={cpart}"] if cpart else []
    paths += [f"{data_dir}/batch={k}" for k in committed if k not in folded]
    return paths


def compact_incremental_store(spark, store_dir: str, state_dir: str) -> dict:
    """Fold every ledger-committed ``batch=<content-key>`` partition of
    the band/shingle store into ONE compacted partition each — the
    periodic maintenance a long-running incremental-dedup stream needs:
    without it the per-batch old-side read opens one partition per
    committed batch forever (the deep-history smoke measured the
    residual scan cost; BASELINE.md round 7).

    Protocol (crash-safe at every step):

    1. committed keys come from the LEDGER (torn partitions of a
       crashed, never-committed batch are invisible here, exactly as in
       the sink's read path);
    2. dirs superseded by the PREVIOUS compaction are swept first (the
       deferred sweep — see below);
    3. the union of the current compacted partition (if any) and all
       not-yet-folded committed partitions is written to a fresh
       ``batch=compacted-<version+1>`` dir for bands and shingles —
       a crash before step 4 leaves unreferenced dirs that the next
       compaction overwrites (same deterministic name);
    4. the manifest swap is one atomic ``os.replace`` — readers see
       either the old folded-set or the new one, never half;
    5. the dirs THIS compaction superseded are left on disk — the next
       compaction's step 2 removes them.

    The DEFERRED sweep is the concurrency contract: a stream
    micro-batch that resolved its old-side path list against the
    pre-swap manifest may still be scanning the just-folded ``batch=``
    dirs when the swap lands, so this call never deletes what it
    itself supersedes — only what the previous compaction superseded,
    giving in-flight readers a full inter-compaction period of grace.
    Run compactions spaced further apart than a micro-batch takes
    (minutes vs seconds in production) and the race cannot bite; true
    concurrent-writer safety beyond that (two compactions at once)
    is NOT provided — it is a single-operator maintenance command.

    The ledger itself is untouched: replay decisions still key on
    content, so a replayed batch skips before any store read whether or
    not its data has been folded.  Returns a stats dict.
    """
    import json
    import os
    import shutil

    from ..plans.state import ParquetStateStore

    store = ParquetStateStore(spark, state_dir)
    prefix = INCR_STREAM_ID + ":"
    committed = [
        s[len(prefix):] for s in store.applied_map() if s.startswith(prefix)
    ]
    man = _read_compaction(store_dir)
    folded = set(man["folded"])
    pending = [k for k in committed if k not in folded]
    bands_dir = os.path.join(store_dir, "bands")
    sh_dir = os.path.join(store_dir, "shingles")

    # deferred sweep (step 2): remove what the PREVIOUS compaction
    # superseded — folded batch dirs and compacted partitions other
    # than the current manifest's (including crash orphans).  Never
    # touches this call's own supersessions, so a reader mid-scan on
    # the pre-swap path list keeps its files until the next cycle.
    # Runs on the no-op path too: calling compaction with nothing
    # pending is how an operator finishes the previous cycle's cleanup.
    cur_part = man["partition"]
    n_swept = 0
    for d in (bands_dir, sh_dir):
        if not os.path.isdir(d):
            continue
        for entry in os.listdir(d):
            if not entry.startswith("batch="):
                continue
            key = entry[len("batch="):]
            if key == cur_part:
                continue
            if key in folded or key.startswith("compacted-"):
                shutil.rmtree(os.path.join(d, entry), ignore_errors=True)
                n_swept += 1

    if not pending:
        return {
            "compacted": False,
            "committed_keys": len(committed),
            "pending_keys": 0,
            "partition": man["partition"],
            "swept_dirs": n_swept,
        }

    new_part = f"compacted-{man['version'] + 1:04d}"
    stats = {}
    for d, schema in ((bands_dir, _BANDS_READ_SCHEMA), (sh_dir, _SH_READ_SCHEMA)):
        src = _store_read_paths(d, committed, folded, man["partition"])
        df = (
            spark.read.schema(schema)
            .option("basePath", d)
            .parquet(*src)
            .drop("batch")
        )
        df.write.mode("overwrite").parquet(f"{d}/batch={new_part}")
        stats[os.path.basename(d) + "_rows"] = spark.read.parquet(
            f"{d}/batch={new_part}"
        ).count()

    tmp = os.path.join(store_dir, _COMPACTION_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "version": man["version"] + 1,
                "folded": sorted(folded | set(pending)),
                "partition": new_part,
            },
            f,
        )
    os.replace(tmp, os.path.join(store_dir, _COMPACTION_MANIFEST))
    # no post-commit sweep: the dirs this call superseded stay on disk
    # for in-flight readers; the NEXT compaction's step 2 removes them
    return {
        "compacted": True,
        "committed_keys": len(committed),
        "pending_keys": len(pending),
        "partition": new_part,
        "swept_dirs": n_swept,
        **stats,
    }


def _content_key(batch_df: DataFrame, *cols: str) -> str:
    """Deterministic, order-independent key of a micro-batch's CONTENT:
    ``<row_count>x<sum of xxhash64(*cols) mod 2^64>``.

    Spark's micro-batch ids are ephemeral — after checkpoint loss the
    file-to-batch-id assignment is NOT guaranteed stable (file-source
    ordering ties), so a durable exactly-once ledger keyed on batch id
    could skip a never-processed file and reprocess an admitted one.
    Keying the ledger and every store partition on the batch's content
    makes replay decisions independent of batch numbering entirely: the
    same documents always map to the same ledger entry and the same
    store partitions, whatever batch id the source hands them.

    SUM (decimal-exact, folded mod 2^64 driver-side), NOT bit_xor: xor
    cancels even-multiplicity rows, so two batches each consisting of
    one row duplicated twice would collide at probability 1.  The sum
    keeps multiplicity (a decimal(38,0) accumulator is exact far beyond
    10^18 rows); distinct batches then alias only with equal row counts
    AND a 64-bit sum collision (~2^-64 per pair)."""
    cols = cols or ("doc_id", "text")
    hash_args = ", ".join(cols)
    row = batch_df.agg(
        F.count("*").alias("n"),
        F.sum(
            F.expr(f"cast(xxhash64({hash_args}) as decimal(38, 0))")
        ).alias("x"),
    ).collect()[0]
    x = int(row["x"]) if row["x"] is not None else 0
    return f"{row['n']}x{x % (1 << 64):016x}"


def run_incremental_dedup_stream(
    spark,
    landing_glob: str,
    out_dir: str,
    checkpoint_dir: str,
    store_dir: str,
    state_dir: str,
    max_bucket: int | None = 100,
    jaccard_min: float | None = None,
) -> int:
    """Streaming incremental near-duplicate dedup: each micro-batch's
    documents are banded against the ACCUMULATED band store of every
    previously admitted document — the streaming face of
    :func:`operators.dedup.incremental_dedup` (the per-dump join every
    production crawl pipeline runs), under the same exactly-once ledger
    as the extraction stream.

    Per micro-batch (all durable keys are CONTENT-derived — see
    :func:`_content_key` for why batch ids are never trusted across
    checkpoint loss):

    1. replay guard — a batch whose content key is already in the
       ledger is skipped outright (same documents = same key, whatever
       batch id the source assigned them on this run);
    2. in-batch near-dups: banded self-join + exact Jaccard verify
       (with the hot-bucket cap — a degenerate landing file must not
       k²-explode inside the sink); the LOWER doc_id of each verified
       pair is kept;
    3. cross-batch: the batch's band keys equi-join the accumulated
       band store restricted to LEDGER-COMMITTED partitions (never a
       self-join — the two-corpus shape of ``incremental_dedup``),
       verified against the union shingle table; matches drop;
    4. admitted docs, their band keys, and their ``(doc_id, sh, n)``
       shingle rows are written with content-keyed OVERWRITE (a
       replayed batch rewrites ITS OWN partitions — idempotent, never
       duplicates, never clobbers another batch's output);
    5. the ledger MERGE commits LAST, riding the state store's atomic
       manifest rename: admitted doc_ids land as ``ADMITTED`` rows and
       the content key lands in the applied ledger IN THE SAME commit
       (a fully-dropped batch still advances the ledger).

    Crash-replay correctness: if the job dies anywhere between (2) and
    (5), the content key never reached the ledger, so the replayed
    batch recomputes against the old side **filtered to committed
    keys** — its own half-written store partitions are excluded, the
    replay sees exactly the pre-crash world and rewrites identical
    partitions.  Stream state itself is empty (the checkpoint only
    tracks source offsets); ALL durable state lives in the band/shingle
    store and the ledger, so state is bounded by the admitted corpus,
    never by stream lifetime — and the whole store survives checkpoint
    loss: a from-scratch replay skips every committed batch by content,
    processes only genuinely new files, and admits nothing twice.

    Scale shape: the old side is what a production store keeps
    precomputed between snapshots (append-only band + shingle tables,
    partitioned by admission batch); ``max_bucket`` caps the old side's
    degenerate buckets (production default ON per NOTES.md "scale-knob
    defaults"; pass ``None`` for exact recall).  Returns total admitted
    rows in ``out_dir`` after draining.
    """
    import os

    from ..operators import dedup as D
    from ..plans.state import ParquetStateStore

    jm = D.JACCARD_MIN if jaccard_min is None else jaccard_min
    store = ParquetStateStore(spark, state_dir)
    bands_dir = os.path.join(store_dir, "bands")
    sh_dir = os.path.join(store_dir, "shingles")

    ledger_prefix = INCR_STREAM_ID + ":"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # (1) content-keyed replay guard: committed content never
        # reprocesses, whatever batch id this run assigned it
        ck = _content_key(batch_df)
        key = ledger_prefix + ck
        if store.last_applied(key) >= 0:
            return
        committed = [
            s[len(ledger_prefix):]
            for s in store.applied_map()
            if s.startswith(ledger_prefix) and s != key
        ]
        docs = batch_df.select("doc_id", "text")
        # persisted (doc_id, sh, n) — unpersisted at the end of the sink
        # so a months-running stream cannot accumulate cached batches
        sh_new = D._shingle_table_with_sizes(docs)
        sig_new = D.minhash_signatures(sh_new.select("doc_id", "sh"))
        bands_new = D._banded(sig_new).localCheckpoint()

        # (2) in-batch: lower id of a verified pair wins (shared core
        # with lsh_candidate_pairs — the hot-bucket cap applies here
        # too: a degenerate landing file must not k^2-explode)
        cand_in = D._pairs_from_bands(bands_new, max_bucket)
        drops = D.jaccard_verify(cand_in, sh_new, jm).select(
            F.col("id_b").alias("doc_id")
        )

        # (3) cross-batch against the accumulated store, restricted to
        # LEDGER-COMMITTED partitions — by reading exactly those
        # partition PATHS, not an isin() filter: the path list never
        # touches a half-written (torn) partition of a crashed batch,
        # and an in-list would grow into unbounded codegen as batches
        # accumulate.  Keys already folded by a compaction
        # (:func:`compact_incremental_store`) resolve to the single
        # compacted partition instead of one dir per batch.
        if committed:
            man = _read_compaction(store_dir)
            folded, cpart = set(man["folded"]), man["partition"]
            band_paths = _store_read_paths(bands_dir, committed, folded, cpart)
            sh_paths = _store_read_paths(sh_dir, committed, folded, cpart)
            old_bands = D._cap_hot_buckets(
                spark.read.schema(_BANDS_READ_SCHEMA)
                .option("basePath", bands_dir)
                .parquet(*band_paths)
                .select("doc_id", "band", "bk"),
                max_bucket,
            )
            cand_x = (
                bands_new.alias("n")
                .join(
                    old_bands.alias("o"),
                    (F.col("n.band") == F.col("o.band"))
                    & (F.col("n.bk") == F.col("o.bk")),
                )
                .select(
                    F.col("n.doc_id").alias("id_a"),
                    F.col("o.doc_id").alias("id_b"),
                )
                .distinct()
            )
            old_sh = (
                spark.read.schema(_SH_READ_SCHEMA)
                .option("basePath", sh_dir)
                .parquet(*sh_paths)
                .select("doc_id", "sh", "n")
            )
            sh_all = sh_new.unionByName(old_sh)
            drops = drops.unionByName(
                D.jaccard_verify(cand_x, sh_all, jm).select(
                    F.col("id_a").alias("doc_id")
                )
            )

        admitted = docs.join(
            drops.distinct(), "doc_id", "left_anti"
        ).localCheckpoint()

        # (4) content-keyed overwrites: idempotent under replay, and a
        # remapped batch id can never clobber another batch's output
        admitted.write.mode("overwrite").parquet(f"{out_dir}/batch={ck}")
        adm_ids = admitted.select("doc_id")
        bands_new.join(adm_ids, "doc_id").write.mode("overwrite").parquet(
            f"{bands_dir}/batch={ck}"
        )
        sh_new.join(adm_ids, "doc_id").write.mode("overwrite").parquet(
            f"{sh_dir}/batch={ck}"
        )

        # (5) ledger commit LAST — the atomic admission record; the
        # content key rides the same manifest rename (and is recorded
        # even when admitted is empty — state.merge advances the ledger
        # for data-free batches)
        store.merge(
            admitted.select(
                F.col("doc_id").cast("string").alias("url"),
                F.lit("ADMITTED").alias("status"),
                F.expr(f"timestamp_seconds({batch_id})").alias(
                    "updated_at"
                ),
            ),
            stream_id=key,
            batch_id=batch_id,
        )
        # every consumer of the batch's shingle table has run; drop the
        # cache blocks before the next batch arrives (the ledger commit
        # above is the last reader)
        sh_new.unpersist()

    stream = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_glob)
    )
    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.exists(out_dir):
        return 0
    return spark.read.parquet(out_dir).count()
