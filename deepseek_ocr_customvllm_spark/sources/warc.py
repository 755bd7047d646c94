"""WARC (ISO 28500) record build + parse over the ``pages`` table.

Common Crawl ships its corpus as WARC files: concatenated records, each
a small ``\\r\\n``-terminated header block (``WARC-Target-URI``,
``WARC-Date``, ``Content-Length``) followed by exactly
``Content-Length`` payload bytes and a blank-line terminator.  The
reference repo ingests documents one HTTP upload at a time
(`app/main.py` upload endpoint); at 10^12-document scale the same
corpus arrives as WARC shards instead, so the Spark rebuild needs the
format as a first-class source.

Spark-first split of the work:

- **Serialization is pure JVM**: :func:`warc_record_bytes` builds each
  record with ``concat`` over binary casts — header strings, the byte
  length from ``length(html)``, the payload itself.  No Python in the
  encode path, so writing WARC shards is whole-stage-codegen work.
- **Chunking is a deterministic shuffle**: :func:`warc_chunks` groups
  records into ``n_chunks`` shard blobs keyed by ``xxhash64(url)``,
  ordered *within* the blob by url, so the blob bytes are a pure
  function of the member set — identical at any parallelism, which is
  what makes the round-trip oracle-checkable.  Blob assembly runs in
  the grouped Arrow tier (linear ``b"".join``; a JVM binary
  fold-concat is quadratic — see the function docstring).
- **Parsing is the Arrow batch path**: :func:`parse_warc` walks each
  blob's records in ``mapInPandas`` (one Python call per *batch of
  shards*, not per record).  Malformed records are skipped per-record
  (the same isolation contract as the extractor's FAILED rows) —
  a torn shard never poisons its batch.

At cluster scale the parse stage is embarrassingly parallel over
shards (one task per WARC file, no shuffle before the parse), which is
exactly how Common Crawl jobs are laid out.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = "\r\n"
_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"
_PY_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"


def _b(col_or_lit) -> Column:
    c = F.lit(col_or_lit) if isinstance(col_or_lit, str) else col_or_lit
    return c.cast("binary")


def warc_record_bytes(
    url: Column | str = "url",
    warc_ts: Column | str = "warc_ts",
    html: Column | str = "html",
    rec_type: str = "response",
    content_type: str = "text/html",
) -> Column:
    """One WARC/1.0 record as a binary column (JVM-only).  The default
    header pair is the raw-capture ``response``/``text/html`` record;
    WET conversion records pass ``conversion``/``text/plain``.

    ``Content-Length`` is the payload's BYTE length: the payload is
    cast to binary first (string → UTF-8 bytes) and both the length and
    the concatenated bytes come from that same cast, so framing can
    never drift from the payload even on non-ASCII string columns.
    The date is rendered in the session timezone, so callers pin UTC
    (`_ensure_utc`) the way every other timestamp-bearing plan here does.

    The url is percent-escaped for CR/LF before it enters the
    CRLF-delimited header: an untrusted crawl url containing a raw
    ``\\r\\n\\r\\n`` would otherwise terminate the header before
    ``Content-Length`` and corrupt record framing for the rest of the
    blob.  Only the two control bytes are escaped (``%0D`` / ``%0A``,
    their standard URI encoding — RFC 3986 forbids raw controls in a
    URI, and ISO 28500 forbids them in ``WARC-Target-URI``); legitimate
    ``%XX`` sequences already in the url pass through untouched, so no
    double-escaping.  The escape is JVM ``regexp_replace`` — the encode
    path stays whole-stage codegen.  The date needs no guard: it is
    rendered by ``date_format`` from a timestamp and cannot contain
    controls.
    """
    url = F.col(url) if isinstance(url, str) else url
    url = F.regexp_replace(
        F.regexp_replace(url, "\r", "%0D"), "\n", "%0A"
    )
    warc_ts = F.col(warc_ts) if isinstance(warc_ts, str) else warc_ts
    payload = _b(F.col(html) if isinstance(html, str) else html)
    header = F.concat(
        F.lit("WARC/1.0"), F.lit(_CRLF),
        F.lit(f"WARC-Type: {rec_type}"), F.lit(_CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "), F.date_format(warc_ts, _DATE_FMT), F.lit(_CRLF),
        F.lit(f"Content-Type: {content_type}"), F.lit(_CRLF),
        F.lit("Content-Length: "),
        F.length(payload).cast("string"), F.lit(_CRLF),
        F.lit(_CRLF),
    )
    return F.concat(_b(header), payload, _b(F.lit(_CRLF + _CRLF)))


_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.LongType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def warc_chunks(
    pages: DataFrame, n_chunks: int = 8, record: Column | None = None
) -> DataFrame:
    """Pack pages into ``n_chunks`` WARC shard blobs.

    Returns ``(chunk_id bigint, data binary)``.  Membership is
    ``pmod(xxhash64(url), n_chunks)`` and the in-blob order is sorted
    (url, record bytes) — the byte tie-break totally orders re-crawls
    of the same url — so the blob is a deterministic function of its
    member set: any partitioning of the input produces byte-identical
    shards.

    Record bytes are built JVM-side (:func:`warc_record_bytes`) BEFORE
    the shuffle; only the final blob assembly runs in the grouped Arrow
    tier, because the JVM alternative (``aggregate`` + binary ``concat``
    over a collected array) re-copies the accumulated prefix on every
    step — O(records × blob_bytes) per chunk — while ``b"".join`` sizes
    the buffer once and is linear.  A whole chunk must fit in one
    task's memory either way (it is one output blob); ``n_chunks`` is
    the knob that bounds it, exactly as WARC shard sizing does in a
    real crawl pipeline.
    """
    rec = (warc_record_bytes() if record is None else record).alias("rec")
    keyed = pages.select(
        F.pmod(F.xxhash64("url"), F.lit(n_chunks)).alias("chunk_id"),
        F.col("url"),
        rec,
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        # sort by (url, record bytes): a url alone does not totally
        # order re-crawls (same url, different payload), and a stable
        # sort would then freeze nondeterministic shuffle arrival order
        # into the blob bytes
        ordered = pdf.sort_values(["url", "rec"], kind="mergesort")
        blob = b"".join(bytes(x) for x in ordered["rec"])
        return pd.DataFrame(
            {"chunk_id": [int(pdf["chunk_id"].iloc[0])], "data": [blob]}
        )

    return keyed.groupBy("chunk_id").applyInPandas(assemble, schema=_CHUNK_SCHEMA)


PARSED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def parse_warc_blob(data: bytes) -> List[Tuple[str, _dt.datetime, bytes]]:
    """Parse one WARC blob into ``(url, warc_ts, html)`` records.

    Strict per-record framing (version line, ``Content-Length`` payload
    slice, blank-line terminator); a malformed record loses framing, so
    the parser RESYNCHRONIZES on the next ``WARC/1.0\\r\\n`` marker
    (the standard warcio-style recovery) instead of aborting the blob —
    one torn record costs itself, not every record sorted after it in
    the shard.  Records already parsed are always kept — per-record
    isolation, same contract as the extractor's row-level FAILED
    handling.  A WELL-FRAMED record's payload is never rescanned — its
    bytes are skipped wholesale by ``Content-Length``.  The malformed
    record's own bytes ARE rescanned (that is what resync is), with the
    documented consequence: if a torn record's payload happens to
    contain a well-formed embedded WARC record, that embedded record is
    emitted as real — the standard warcio-style recovery trade.
    Framing of OUR shards (`warc_chunks`) is always exact, so this path
    only runs on externally produced WARC files, whose producer
    controls record framing (and thus could emit any records directly)
    anyway — resync adds recovery, not a new trust boundary.
    """
    out: List[Tuple[str, _dt.datetime, bytes]] = []
    pos = 0
    n = len(data)

    def _resync(from_pos: int) -> int:
        nxt = data.find(b"WARC/1.0\r\n", from_pos)
        return nxt if nxt >= 0 else n

    while pos < n:
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        lines = data[pos:hdr_end].decode("utf-8", "replace").split(_CRLF)
        if not lines or not lines[0].startswith("WARC/"):
            pos = _resync(pos + 1)
            continue
        fields = {}
        for line in lines[1:]:
            k, sep, v = line.partition(":")
            if sep:
                fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
            url = fields["warc-target-uri"]
            ts = _dt.datetime.strptime(fields["warc-date"], _PY_DATE_FMT)
        except (KeyError, ValueError):
            pos = _resync(pos + 1)
            continue
        if length < 0:
            # A negative length would slice back INTO the header (the
            # terminator check would then pass vacuously on the header's
            # own CRLFCRLF and emit a phantom empty record): malformed.
            pos = _resync(pos + 1)
            continue
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end + 4 > n or data[body_end : body_end + 4] != b"\r\n\r\n":
            pos = _resync(pos + 1)
            continue
        out.append((url, ts, data[body_start:body_end]))
        pos = body_end + 4
    return out


def parse_warc(chunks: DataFrame) -> DataFrame:
    """Distributed WARC parse: ``(chunk_id, data)`` → one row per record.

    ``mapInPandas`` so each task decodes its shards in one Arrow batch;
    no shuffle — parallelism is the shard partitioning itself.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: List[str] = []
            tss: List[_dt.datetime] = []
            htmls: List[bytes] = []
            for data in pdf["data"]:
                for url, ts, html in parse_warc_blob(bytes(data)):
                    urls.append(url)
                    tss.append(ts)
                    htmls.append(html)
            yield pd.DataFrame({"url": urls, "warc_ts": tss, "html": htmls})

    return chunks.mapInPandas(gen, schema=PARSED_SCHEMA)


def warc_roundtrip_report(pages: DataFrame, n_chunks: int = 8) -> DataFrame:
    """Serialize → shard → parse → fingerprint, one row per page.

    The output is byte-derived from the parsed payloads (length + md5),
    so a green oracle comparison proves the whole encode/decode path is
    lossless — the round-trip twin of the reference's byte-identity
    fixture contract.
    """
    parsed = parse_warc(warc_chunks(pages, n_chunks=n_chunks))
    return parsed.select(
        "url",
        "warc_ts",
        F.length("html").cast("long").alias("n_bytes"),
        F.md5("html").alias("payload_md5"),
    )


def wet_chunks(
    extracted: DataFrame, n_chunks: int = 8, text_col: str = "markdown"
) -> DataFrame:
    """WET sidecar shards: ``conversion`` records carrying the
    EXTRACTED text per url — the third Common Crawl artifact (WARC =
    raw capture, WAT = link metadata via `operators.graph`, WET = the
    ``*.warc.wet`` extracted-text files most corpus pipelines actually
    consume).  Same deterministic chunking, framing, and ordering
    contract as :func:`warc_chunks`; payload bytes are the UTF-8 text,
    so a parse round-trip recovers the extraction byte-exactly.
    """
    rec = warc_record_bytes(
        html=F.col(text_col),
        rec_type="conversion",
        content_type="text/plain",
    )
    return warc_chunks(
        extracted.select("url", "warc_ts", F.col(text_col)),
        n_chunks=n_chunks,
        record=rec,
    )
