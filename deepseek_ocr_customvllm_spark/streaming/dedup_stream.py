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
