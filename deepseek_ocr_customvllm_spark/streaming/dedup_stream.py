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
state value wholesale every micro-batch, so per-batch cost is
O(urls seen so far) per shard and grows without bound.  The state entry
is a fixed-width md5 digest (16 bytes/url, collision odds ~n²/2¹²⁹) to
keep the array compact, but a truly unbounded crawl needs the batch
pattern instead: periodically snapshot the seen-set to the parquet/
Iceberg state store (``plans.state``) and keep only a recent window
(e.g. the current crawl segment) in stream state.
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
