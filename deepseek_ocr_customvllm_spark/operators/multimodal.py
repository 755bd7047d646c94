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


# ---------------------------------------------------------------------------
# frame sampling / feature extraction over binary media columns
# ---------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

N_FRAMES = 4
FRAME_SIZE = 64


def _frame_sample_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per Arrow batch: emit ``N_FRAMES`` evenly spaced byte windows per
    payload — the exact batch shape a real video frame sampler has
    (1 input row -> N output rows, binary out, struct metadata), with the
    codec replaced by deterministic byte slicing."""
    for pdf in it:
        out = {k: [] for k in ("media_id", "frame_index", "frame_offset", "frame_bytes", "meta")}
        for mid, payload in zip(pdf["media_id"].tolist(), pdf["payload"].tolist()):
            data = payload or b""
            n = len(data)
            for k in range(N_FRAMES):
                offset = 0 if n == 0 else (k * max(n - FRAME_SIZE, 0)) // max(N_FRAMES - 1, 1)
                out["media_id"].append(mid)
                out["frame_index"].append(k)
                out["frame_offset"].append(offset)
                out["frame_bytes"].append(data[offset : offset + FRAME_SIZE])
                out["meta"].append(
                    {"media_type": "binary/fake", "width": None, "height": None, "duration_ms": n}
                )
        yield pd.DataFrame(out)


def frame_samples(media_df: DataFrame) -> DataFrame:
    """``(media_id long, payload binary)`` -> sampled frame rows.

    The real decoder would replace the slicing inside
    ``_frame_sample_batch`` (see :func:`decode_stub`); partitioning,
    schema, and the 1->N row fan-out are production-shaped.
    """
    return media_df.select("media_id", "payload").mapInPandas(
        _frame_sample_batch, schema=FRAME_SCHEMA
    )
