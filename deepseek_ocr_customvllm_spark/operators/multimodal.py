"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the pipeline as ``binary`` columns
with struct metadata; the per-item work (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched ``mapInPandas`` stages — the same
operator shape as the text extractor, so partitioning / skew / lineage
handling is shared.

The actual codecs are NOT available in this runtime, so the decode step
is stubbed (``decode_stub`` raises ``NotImplementedError``; the
deterministic ``inspect_payloads`` fake extracts byte-level features).
The Spark-side plumbing — schema, batch iteration, UDF signature — is
real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

INSPECT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_hash", T.StringType()),
    ]
)


def decode_stub(payload: bytes, media_type: str) -> object:
    """Placeholder for the real image/audio decode (PIL / ffmpeg are not
    in this container).  The Spark plumbing around it is real."""
    raise NotImplementedError(
        f"decoding media_type={media_type!r} requires codec libraries "
        "not present in this runtime"
    )


def _inspect_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        texts = pdf["text"].tolist()
        n_bytes = []
        heads = []
        for t in texts:
            s = t if t is not None else ""
            n_bytes.append(len(s.encode("utf-8")))
            heads.append(hashlib.md5(s[:64].encode("utf-8")).hexdigest())
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].tolist(), "n_bytes": n_bytes, "head_hash": heads}
        )


def inspect_payloads(df: DataFrame) -> DataFrame:
    """Deterministic byte-level feature extraction over an opaque payload
    column — the vectorized-UDF plumbing the real decoders plug into.
    (Here the ``documents.text`` column stands in for the payload.)"""
    return df.select("doc_id", "text").mapInPandas(
        _inspect_batch, schema=INSPECT_SCHEMA
    )
