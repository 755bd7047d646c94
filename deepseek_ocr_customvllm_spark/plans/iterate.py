"""Round-based iteration support: checkpoint each round, free the last.

Iterative DataFrame algorithms (label propagation, PageRank, k-means)
MUST truncate lineage every round — a cached plan still nests the
previous round's plan, so plan size (and Catalyst/explain cost) doubles
per round and OOMs the driver around round 10.  ``localCheckpoint`` is
the local-mode truncation; on a cluster use
``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` for
executor-loss-tolerant truncation.

``DataFrame.unpersist()`` does NOT release localCheckpoint blocks (they
live in the block manager, not the cache manager), so keeping storage
O(1) rounds instead of O(total rounds) requires holding handles to the
JVM RDDs each checkpoint registered and unpersisting them directly once
the NEXT round is materialized.  :class:`RoundCheckpointer` wraps that
bookkeeping; it attributes blocks by diffing the session's
persistent-RDD registry around the checkpoint call, which assumes no
concurrent thread persists RDDs in the same session while a round runs
(the single-writer scope the state store declares).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame


class RoundCheckpointer:
    """Eager per-round localCheckpoint with previous-round freeing."""

    def __init__(self, df: DataFrame):
        self._sc = df.sparkSession.sparkContext
        # Caller-owned caches existing before the loop: never touched.
        self._outside = set(self._registry())
        self._live: List = []
        self._pending: List = []
        self._pinned: List = []

    def _registry(self) -> dict:
        jmap = self._sc._jsc.getPersistentRDDs()
        return {k: jmap[k] for k in jmap.keySet().toArray()}

    def _checkpoint(self, df: DataFrame):
        before = set(self._registry()) | self._outside
        out = df.localCheckpoint()  # eager by default: materialized now
        created = [
            v for k, v in self._registry().items() if k not in before
        ]
        return out, created

    def ckpt(self, df: DataFrame, free_previous: bool = True) -> DataFrame:
        """Materialize ``df`` (eager localCheckpoint) and return the
        truncated frame.  With ``free_previous`` (default) the previous
        round's blocks are released immediately; pass ``False`` when the
        previous round is still read AFTER the new one exists (e.g. a
        convergence diff) and call :meth:`rotate` once it isn't.
        """
        if not free_previous and self._pending:
            # Guard BEFORE materializing: two un-rotated rounds would
            # orphan blocks (no handle survives the overwrite, and
            # localCheckpoint blocks can't be reached any other way) —
            # always a caller sequencing bug, and checkpointing first
            # would itself orphan the new round's blocks on the raise.
            raise RuntimeError(
                "ckpt(free_previous=False) called twice without rotate()"
            )
        out, created = self._checkpoint(df)
        if free_previous:
            self.free()
            self._live = created
        else:
            self._pending = created
        return out

    def rotate(self) -> None:
        """Free the previous round's blocks and promote the round
        checkpointed with ``free_previous=False`` to current."""
        for r in self._live:
            r.unpersist(False)
        self._live = self._pending
        self._pending = []

    def pin(self, df: DataFrame) -> DataFrame:
        """Checkpoint a loop-invariant frame (reused every round).  Its
        blocks outlive round rotation; call :meth:`release_pinned` once
        the final result no longer references them (i.e. after the last
        round was itself checkpointed)."""
        out, created = self._checkpoint(df)
        self._pinned.extend(created)
        return out

    def release_pinned(self) -> None:
        for r in self._pinned:
            r.unpersist(False)
        self._pinned = []

    def free(self) -> None:
        """Release the most recent round's blocks — and any un-rotated
        pending round's (error paths run through here) — after the
        final result has been materialized elsewhere."""
        for r in self._live + self._pending:
            r.unpersist(False)
        self._live = []
        self._pending = []
