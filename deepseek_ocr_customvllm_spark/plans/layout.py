"""Input-layout adaptation helpers.

``spread_input`` is the guide's remedy for *input skew* (optimization
guide §2.5: "one huge unsplittable file … repartition immediately after
the read"): when a source delivers fewer scan partitions than the
cluster has task slots, every downstream map-side computation (partial
aggregation, per-row hashing, Python workers) is serialized onto those
few tasks no matter how many cores exist.

The repartition is GUARDED by the actual scan layout, not by a local
core count: at production scale a 100 TB table yields thousands of
splits, the guard is false, and the operator adds **zero** shuffles.
The degenerate case it fixes — a single-file, single-row-group parquet
table (parquet cannot be split below a row group) — is exactly the
sandbox testdata layout, and also what a real pipeline sees when an
upstream writer emitted one fat file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # imported at module load so the probe never pays it inside a query
    import pyarrow.parquet as _pq
except Exception:  # pragma: no cover - pyarrow is a runtime dependency
    _pq = None

# Footer-probe budget: if the source has at least this many files the
# guard is already false, so footers are never read for wide tables and
# the probe cost is bounded by (target) local footer reads.
_LOCAL_PREFIXES = ("file:", "/")


def _parallel_units(df: DataFrame, target: int) -> int:
    """Lower bound on the scan's usable parallelism, cheaply.

    ``df.inputFiles()`` walks the analyzed plan only (no physical
    planning, no job).  A parquet file cannot split below a row group,
    so usable units = total row groups; footers are read only while the
    running count is still below ``target`` and only for local files.
    Non-file sources (in-memory ranges, checkpoints …) return no files —
    report "enough" for those rather than paying a planning pass: every
    call site feeds file-backed tables, and a wrong "enough" only skips
    an optional repartition.
    """
    try:
        files = df.inputFiles()
    except Exception:
        return target
    if not files:
        return target
    if len(files) >= target:
        return len(files)
    units = 0
    for f in files:
        path = f[7:] if f.startswith("file://") else f
        if not path.startswith("/"):
            return target  # remote FS: footer probe not worth a roundtrip
        if _pq is None or not path.endswith((".parquet", ".pq")):
            units += 1
            continue
        try:
            units += max(1, _pq.ParquetFile(path).metadata.num_row_groups)
        except Exception:
            units += 1
        if units >= target:
            return units
    return units


def spread_input(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` iff its source under-splits.

    ``target`` defaults to ``defaultParallelism`` (the cluster's task
    slots) — a scale-adaptive quantity, never a hard-coded local core
    count.  The layout probe costs a few file-footer reads at most (see
    :func:`_parallel_units`) and runs no Spark jobs.

    Only safe where downstream results are independent of row order and
    placement — every aggregation in this engine is (exact integer /
    decimal arithmetic, commutative), which the oracle parity suite
    pins.
    """
    sc = df.sparkSession.sparkContext
    if target is None:
        target = sc.defaultParallelism
    if _parallel_units(df, target) >= target:
        return df
    return df.repartition(target)
