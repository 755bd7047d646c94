"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full extraction pipeline over a pages
corpus derived from the sf0.001 ``documents`` table.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
family (SURVEY.md §2 + the training-data operators).  Every
SQL-expressible operator carries a DuckDB oracle whose results are
bit-identical to the Spark implementation (all hashes are md5-derived,
all floats rounded, all ranks deterministically tie-broken).  The
extraction pipeline itself is not SQL-expressible (the extractor is the
engine under test) — those entries are rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# The driver may load this module by file path; make the package
# importable regardless of cwd.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepseek_ocr_customvllm_spark.operators import (
    curation,
    dedup,
    scrub,
    similarity,
    textstats,
)
from deepseek_ocr_customvllm_spark.operators import graph
from deepseek_ocr_customvllm_spark.operators.extract import extract_pages
from deepseek_ocr_customvllm_spark.operators.multimodal import inspect_payloads
from deepseek_ocr_customvllm_spark.sources.pages import pages_from_documents
from deepseek_ocr_customvllm_spark.sources.tables import load_table, register_views
from deepseek_ocr_customvllm_spark.sources.warc import warc_roundtrip_report

SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _ensure_utc(spark: SparkSession) -> None:
    """Timestamp literals parse in the SESSION timezone; the DuckDB
    oracle is UTC-naive.  The driver may hand us a session with a local
    timezone, so pin UTC before building any timestamp-sensitive plan."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _augmented_docs(docs: DataFrame) -> DataFrame:
    """Documents plus planted near- and exact duplicates, so the dedup
    operators have guaranteed hits.  Mirrored verbatim in the oracle's
    ``aug`` CTE."""
    base = docs.select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 37 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" near duplicate tail marker tokens appended")
        ).alias("text"),
    )
    exact = docs.filter(F.col("doc_id") % 41 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), F.col("text")
    )
    return base.unionByName(near).unionByName(exact)


_AUG_CTE = """
aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         text || ' near duplicate tail marker tokens appended' AS text
  FROM documents WHERE doc_id % 37 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 41 = 0
)
"""

# DuckDB-dialect normalized text (Spark twin: textstats.norm_text).
# same explicit class as functions.columns.WHITESPACE_RE (see there)
_NORM_DUCK = "regexp_replace(trim(lower(text)), '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')"

# The driver compares oracles at sf0.01; VALUES-literal oracles (computed
# driver-side in pure Python, no Spark) must read the same tables.  The
# local parity test overrides this to its own SF via the env var.
_ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def _sql_lit(v) -> str:
    """A DuckDB literal for a Python value.  Floats get an ``e0`` suffix so
    DuckDB parses them as DOUBLE directly (a bare ``0.3658`` parses as
    DECIMAL first; the decimal->double conversion can be off by 1 ulp from
    the correctly-rounded strtod of the repr)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        r = repr(v)
        return r if "e" in r or "E" in r else r + "e0"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def _values_oracle(rows, cols, casts=None) -> str:
    """``SELECT ... FROM (VALUES ...)`` oracle from precomputed rows.

    Used for operators whose semantics are pure Python (zlib, the
    extractor) — the expected rows are computed driver-side with NO Spark
    involved, so the check still exercises the entire distributed path:
    scan, repartition, Arrow batching, UDF plumbing, and determinism
    across partitionings.
    """
    casts = casts or {}
    body = ",\n".join("(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows)
    sel = ", ".join(
        f"cast({c} as {casts[c]}) AS {c}" if c in casts else c for c in cols
    )
    return f"SELECT {sel} FROM (VALUES\n{body}\n) AS t({', '.join(cols)})"


def _oracle_docs_rows(columns):
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(_ORACLE_SF_DIR, "documents.parquet"), columns=list(columns)
    )
    return zip(*(t[c].to_pylist() for c in columns))


def _oracle_compression_quality() -> str:
    import math
    import zlib

    rows = []
    for did, text in _oracle_docs_rows(("doc_id", "text")):
        enc = (text or "").encode("utf-8")
        b = len(enc)
        z = len(zlib.compress(enc, textstats.ZLIB_LEVEL))
        ratio = math.floor((z * 1.0 / max(b, 1)) * 10000) / 10000
        rows.append((did, b, z, ratio))
    return _values_oracle(
        rows,
        ["doc_id", "n_bytes", "n_bytes_z", "compress_ratio"],
        {"doc_id": "bigint", "n_bytes_z": "bigint", "compress_ratio": "double"},
    )


def _oracle_image_features() -> str:
    from deepseek_ocr_customvllm_spark.operators.multimodal import image_feature_row

    rows = []
    for (did,) in _oracle_docs_rows(("doc_id",)):
        r = image_feature_row(did, _media_payload(did))
        rows.append(
            (
                r["media_id"], r["media_type"], r["width"], r["height"],
                r["sum_r"], r["sum_g"], r["sum_b"], r["thumb_hash"],
            )
        )
    return _values_oracle(
        rows,
        [
            "media_id", "media_type", "width", "height",
            "sum_r", "sum_g", "sum_b", "thumb_hash",
        ],
        {
            "media_id": "bigint", "width": "int", "height": "int",
            "sum_r": "bigint", "sum_g": "bigint", "sum_b": "bigint",
        },
    )


def _oracle_corpus_filter() -> str:
    """Hybrid oracle: the SQL-expressible signals (tokens, multi-language
    argmax, quality score) recompute in DuckDB; only the zlib ratio joins
    in as a Python-computed VALUES table."""
    import math
    import zlib

    zrows = []
    for did, text in _oracle_docs_rows(("doc_id", "text")):
        enc = (text or "").encode("utf-8")
        z = len(zlib.compress(enc, textstats.ZLIB_LEVEL))
        zrows.append((did, math.floor((z * 1.0 / max(len(enc), 1)) * 10000) / 10000))
    zvals = _values_oracle(
        zrows, ["doc_id", "compress_ratio"], {"doc_id": "bigint", "compress_ratio": "double"}
    )
    counts = ",\n         ".join(
        f"len(regexp_extract_all(t, '{pat}')) AS n_{lang}"
        for lang, pat in textstats.LANG_MARKERS
    )
    langs = [lang for lang, _ in textstats.LANG_MARKERS]
    best = f"greatest({', '.join('n_' + lg for lg in langs)})"
    argmax = " ".join(f"WHEN n_{lg} = best THEN '{lg}'" for lg in langs)
    return f"""
WITH z AS ({zvals}),
norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
c AS (
  SELECT doc_id,
         {counts},
         CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS n_words,
         len(regexp_extract_all(t, '{_STOP_RE}')) AS n_stop,
         length(t) AS n_chars
  FROM norm
),
b AS (SELECT *, {best} AS best,
             floor(n_chars * 1.0 / greatest(n_words, 1) * 10000) / 10000 AS awl,
             floor(n_stop * 1.0 / greatest(n_words, 1) * 10000) / 10000 AS sr
      FROM c),
s AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words = 0 THEN 'und'
              WHEN best * 20 < n_words THEN 'und'
              ELSE CASE {argmax} ELSE 'und' END
         END AS pred_lang,
         floor((least(1.0, n_words / 100.0) * 0.5 + sr * 0.3 +
                CASE WHEN awl >= 3 AND awl <= 8 THEN 0.2 ELSE 0.0 END) * 10000)
           / 10000 AS quality_score
  FROM b
),
j AS (SELECT s.*, z.compress_ratio FROM s JOIN z ON z.doc_id = s.doc_id)
SELECT doc_id, n_words, pred_lang, quality_score, compress_ratio,
       CASE WHEN n_words < {textstats.FILTER_MIN_WORDS} THEN 'too_short'
            WHEN pred_lang = 'und' THEN 'lang_unknown'
            WHEN quality_score < {textstats.FILTER_MIN_QUALITY} THEN 'low_quality'
            WHEN compress_ratio < {textstats.FILTER_RATIO_LO}
              OR compress_ratio > {textstats.FILTER_RATIO_HI} THEN 'compress_anomaly'
            ELSE 'kept'
       END AS reason,
       (CASE WHEN n_words < {textstats.FILTER_MIN_WORDS} THEN 'too_short'
            WHEN pred_lang = 'und' THEN 'lang_unknown'
            WHEN quality_score < {textstats.FILTER_MIN_QUALITY} THEN 'low_quality'
            WHEN compress_ratio < {textstats.FILTER_RATIO_LO}
              OR compress_ratio > {textstats.FILTER_RATIO_HI} THEN 'compress_anomaly'
            ELSE 'kept'
       END) = 'kept' AS keep
FROM j
"""


def _oracle_lang_id_multi() -> str:
    counts = ",\n         ".join(
        f"len(regexp_extract_all(t, '{pat}')) AS n_{lang}"
        for lang, pat in textstats.LANG_MARKERS
    )
    langs = [lang for lang, _ in textstats.LANG_MARKERS]
    best = f"greatest({', '.join('n_' + lg for lg in langs)})"
    argmax = " ".join(f"WHEN n_{lg} = best THEN '{lg}'" for lg in langs)
    return f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
c AS (
  SELECT doc_id,
         {counts},
         CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS n_ws_tokens
  FROM norm
),
b AS (SELECT *, {best} AS best FROM c)
SELECT doc_id, {', '.join('n_' + lg for lg in langs)}, n_ws_tokens,
       CASE WHEN n_ws_tokens = 0 THEN 'und'
            WHEN best * 20 < n_ws_tokens THEN 'und'
            ELSE CASE {argmax} ELSE 'und' END
       END AS pred_lang
FROM b
"""


def _oracle_audio_features() -> str:
    from deepseek_ocr_customvllm_spark.operators.multimodal import audio_feature_row

    cols = [
        "media_id", "media_type", "sample_rate", "channels",
        "duration_ms", "energy", "n_samples",
    ]
    rows = []
    for (did,) in _oracle_docs_rows(("doc_id",)):
        r = audio_feature_row(did, _audio_payload(did))
        rows.append(tuple(r[c] for c in cols))
    return _values_oracle(
        rows,
        cols,
        {
            "media_id": "bigint", "sample_rate": "int", "channels": "int",
            "duration_ms": "int", "energy": "bigint", "n_samples": "bigint",
        },
    )


def _oracle_extract_documents_pipeline() -> str:
    from deepseek_ocr_customvllm_spark.extractor.engine import extract_document
    from deepseek_ocr_customvllm_spark.sources.pages import _FOOTER_HTML, _NAV_HTML

    rows = []
    for did, src, text in _oracle_docs_rows(("doc_id", "source", "text")):
        url = f"https://docs.test/{src}/{did}"
        html = (
            f"<html><head><title>doc</title></head><body>{_NAV_HTML}"
            f"<article><h1>Document {did}</h1><p>{text}</p></article>"
            f"{_FOOTER_HTML}</body></html>"
        ).encode("utf-8")
        r = extract_document(url, html)
        rows.append((url, r.content_type, r.status, r.n_pages, r.n_blocks, r.n_chars))
    return _values_oracle(
        rows, ["url", "content_type", "status", "n_pages", "n_blocks", "n_chars"]
    )


def _oracle_warc_roundtrip() -> str:
    """Pure-SQL twin of the WARC round-trip: rebuild the page html
    template (same concat as sources.pages.pages_from_documents) and
    fingerprint it directly — the round-trip being lossless means the
    parsed output must equal this straight-from-documents projection."""
    from deepseek_ocr_customvllm_spark.sources.pages import _FOOTER_HTML, _NAV_HTML

    nav = _NAV_HTML.replace("'", "''")
    footer = _FOOTER_HTML.replace("'", "''")
    return f"""
WITH h AS (
  SELECT 'https://docs.test/' || source || '/' || cast(doc_id AS varchar) AS url,
         TIMESTAMP '2025-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND AS warc_ts,
         '<html><head><title>doc</title></head><body>{nav}<article><h1>Document '
           || cast(doc_id AS varchar) || '</h1><p>' || text || '</p></article>'
           || '{footer}</body></html>' AS html
  FROM documents
)
SELECT url, warc_ts,
       cast(octet_length(encode(html)) AS bigint) AS n_bytes,
       md5(html) AS payload_md5
FROM h
"""


def _extract_synth_results(n_docs: int = 300, max_bytes: int = 64 * 1024):
    from deepseek_ocr_customvllm_spark.extractor.engine import extract_document
    from deepseek_ocr_customvllm_spark.sources.pagegen import synth_page

    for i in range(n_docs):
        p = synth_page(i, 1)
        yield extract_document(p["url"], p["html"], max_bytes=max_bytes)


def _oracle_extract_block_histogram() -> str:
    counts: dict[str, int] = {}
    vals: dict[str, set] = {}
    for r in _extract_synth_results():
        for page in r.pages:
            for b in page["blocks"]:
                bt = b["type"]
                counts[bt] = counts.get(bt, 0) + 1
                v = b.get("validation")
                if v is not None:
                    vals.setdefault(bt, set()).add(v)
    rows = [(bt, counts[bt], len(vals.get(bt, ()))) for bt in sorted(counts)]
    return _values_oracle(
        rows,
        ["block_type", "n_blocks", "n_validation_states"],
        {"n_blocks": "bigint", "n_validation_states": "bigint"},
    )


def _oracle_extract_synth_summary() -> str:
    agg: dict[tuple, list] = {}
    for r in _extract_synth_results():
        key = (r.content_type, r.status)
        a = agg.setdefault(key, [0, 0, 0, 0])
        a[0] += 1
        a[1] += r.n_pages
        a[2] += r.n_blocks
        a[3] += len(r.spans)
    rows = [(ct, st, *agg[(ct, st)]) for ct, st in sorted(agg)]
    return _values_oracle(
        rows,
        ["content_type", "status", "n_docs", "n_pages", "n_blocks", "n_spans"],
        {
            "n_docs": "bigint",
            "n_pages": "bigint",
            "n_blocks": "bigint",
            "n_spans": "bigint",
        },
    )
_BPE_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
_STOP_RE = "\\b(the|and|of|a|to|in)\\b"
_PUNCT_RE = "[.,;:!?]"


def _simhash_duck_sql(source_cte: str, table: str) -> str:
    """DuckDB simhash signature query (twin of dedup.simhash_signatures).

    Integer division (``//``) throughout: the 60-bit values exceed
    double's 53-bit mantissa, so float division would corrupt low bits.
    """
    v = dedup.hex_to_bigint_sql("tok", 15)
    nbits = dedup.SIMHASH_BITS
    bit_aggs = ",\n    ".join(
        f"sum(case when (v // {2 ** b}) % 2 = 1 then 1 else -1 end) AS b{b}"
        for b in range(nbits)
    )
    sim = " + ".join(
        f"(case when b{b} > 0 then {2 ** b} else 0 end)" for b in range(nbits)
    )
    return f"""
WITH {source_cte}
norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM {table}),
toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm WHERE t <> ''),
vals AS (SELECT doc_id, {v} AS v FROM toks),
bits AS (SELECT doc_id, {bit_aggs} FROM vals GROUP BY doc_id)
"""


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract a pages corpus derived from sf0.001 documents,
    roll up by source / content type / status (the per-site extraction
    health report a crawl operator reads)."""
    docs = _docs(spark, SF0001)
    pages = pages_from_documents(docs)
    extracted = extract_pages(pages, num_partitions=8)
    source = F.regexp_extract(F.col("url"), r"^https://docs\.test/([^/]+)/", 1)
    return (
        extracted.groupBy(
            source.alias("source"), "content_type", "status"
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_pages").alias("n_pages"),
            F.sum("n_blocks").alias("n_blocks"),
            F.sum("n_chars").alias("n_chars"),
            F.sum(F.size("spans")).alias("n_spans"),
        )
        .orderBy("source", "content_type", "status")
    )


# ---------------------------------------------------------------------------
# queries (Spark side)
# ---------------------------------------------------------------------------

def _q_flagship_doc_stats(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            (F.floor(F.avg("n_chars") * 100) / 100).alias("avg_chars"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


def _q_token_count(spark, sf_dir):
    return textstats.token_counts(_docs(spark, sf_dir))


def _q_lang_id(spark, sf_dir):
    return textstats.language_id(_docs(spark, sf_dir))


def _q_lang_id_multi(spark, sf_dir):
    return textstats.language_id_multi(_docs(spark, sf_dir))


def _q_quality_score(spark, sf_dir):
    return textstats.quality_scores(_docs(spark, sf_dir))


def _q_corpus_filter(spark, sf_dir):
    return textstats.corpus_filter(_docs(spark, sf_dir))


def _q_vocab_topk(spark, sf_dir):
    return textstats.vocab_topk(_docs(spark, sf_dir))


def _q_doc_sample(spark, sf_dir):
    return textstats.doc_sample(_docs(spark, sf_dir)).select(
        "doc_id", "source", "n_chars"
    )


def _q_domain_stats(spark, sf_dir):
    # the documents table carries no url; derive deterministic per-source
    # hosts (with a www. prefix so the strip rule is exercised)
    docs = _docs(spark, sf_dir).withColumn(
        "url",
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".test/doc/"), F.col("doc_id")
        ),
    )
    return textstats.domain_stats(docs)


def _q_doc_fingerprint(spark, sf_dir):
    return textstats.fingerprints(_docs(spark, sf_dir))


_ROLL_MOD = 2147483647  # 2^31-1: keeps acc*31+byte inside bigint
_ROLL_BASE = 31


def _q_doc_rolling_fingerprint(spark, sf_dir):
    """Rabin-style rolling-hash fingerprints, computed as a JVM-side
    higher-order fold (``aggregate`` over the character array): the whole
    -document hash plus the minimum shingle hash (winnowing-style
    selection over word-3-gram hashes)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\\\s+', ' ') AS t
  FROM documents
),
doc_hash AS (
  SELECT doc_id,
         aggregate(transform(split(t, ''), c -> cast(ascii(c) as bigint)),
                   0L, (acc, x) -> (acc * {_ROLL_BASE} + x) % {_ROLL_MOD}) AS rolling_fp
  FROM norm
),
toks AS (SELECT doc_id, split(t, ' ') AS ts FROM norm WHERE t <> ''),
sh AS (
  SELECT doc_id,
         explode(transform(sequence(0, size(ts) - 3),
                 i -> concat(ts[i], ' ', ts[i+1], ' ', ts[i+2]))) AS sh
  FROM toks WHERE size(ts) >= 3
),
sh_hash AS (
  SELECT doc_id,
         min(aggregate(transform(split(sh, ''), c -> cast(ascii(c) as bigint)),
                       0L, (acc, x) -> (acc * {_ROLL_BASE} + x) % {_ROLL_MOD})) AS min_shingle_fp
  FROM sh GROUP BY doc_id
)
SELECT d.doc_id, d.rolling_fp, s.min_shingle_fp
FROM doc_hash d JOIN sh_hash s ON s.doc_id = d.doc_id
"""
    )


def _q_dedup_recall_report(spark, sf_dir):
    """Pair recall of the MinHash-LSH and SimHash tiers vs the exact
    shingle-join Jaccard ground truth on a bounded subset — the dedup
    family's acceptance metric (the twin of ann_recall_report)."""
    return dedup.dedup_recall_report(_augmented_docs(_docs(spark, sf_dir)))


def _q_dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_augmented_docs(_docs(spark, sf_dir)))


def _q_dedup_minhash_lsh(spark, sf_dir):
    return dedup.minhash_lsh_duplicates(_augmented_docs(_docs(spark, sf_dir)))


def _q_dedup_incremental(spark, sf_dir):
    """Snapshot-vs-corpus dedup: old = the base documents; the new
    snapshot = the planted near/exact duplicates (every one must be
    dropped against the old corpus) plus fresh reversed-text rows
    (none may drop).  The two-corpus banded join — never a self-join —
    is the shape each crawl dump runs against the accumulated store."""
    docs = _docs(spark, sf_dir)
    fresh = docs.filter(F.col("doc_id") % 43 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"),
    )
    corpus = _augmented_docs(docs).unionByName(fresh)
    return dedup.incremental_dedup(corpus)


def _q_dedup_simhash(spark, sf_dir):
    return dedup.simhash_signatures(_docs(spark, sf_dir))


def _q_dedup_simhash_pairs(spark, sf_dir):
    sig = dedup.simhash_signatures(_augmented_docs(_docs(spark, sf_dir)))
    return dedup.simhash_near_pairs(sig)


def _q_dedup_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_augmented_docs(_docs(spark, sf_dir)))


def _q_dedup_components(spark, sf_dir):
    """Duplicate-cluster canonicalization: connected components (min-label
    propagation, iterative distributed rounds) over the MinHash-LSH
    verified pair set."""
    pairs = dedup.minhash_lsh_duplicates(_augmented_docs(_docs(spark, sf_dir)))
    comp = dedup.duplicate_components(pairs.select("id_a", "id_b"))
    # components are eagerly materialized; drop the MinHash caches so
    # they cannot slow every later query's cache lookups in this session
    dedup.release_caches(pairs)
    return comp


def _q_dup_cluster_histogram(spark, sf_dir):
    """Near-dup cluster-size histogram (template-farm telemetry) over
    the MinHash components — two tiny aggregates past the pair set."""
    pairs = dedup.minhash_lsh_duplicates(_augmented_docs(_docs(spark, sf_dir)))
    comp = dedup.duplicate_components(pairs.select("id_a", "id_b"))
    dedup.release_caches(pairs)  # components materialized; caches done
    return dedup.cluster_size_report(comp)


def _q_lang_stratified_sample(spark, sf_dir):
    """Deterministic per-language quota sample (balanced multilingual
    subset selection, reproducible at any partitioning)."""
    return textstats.language_stratified_sample(_docs(spark, sf_dir), per_lang=15)


def _q_domain_quota_sample(spark, sf_dir):
    """Per-domain document cap (anti-spam corpus balancing): keep the 10
    smallest-md5 docs per source, a pure function of doc_id."""
    return textstats.domain_quota_sample(_docs(spark, sf_dir), per_domain=10)


def _q_repetition_signals(spark, sf_dir):
    """Gopher-style repetition signals: top word-2-gram char fraction +
    duplicated-3-gram char fraction per document."""
    return textstats.repetition_signals(_docs(spark, sf_dir))


def _q_sequence_pack(spark, sf_dir):
    """Concat-and-chunk sequence packing (T5/GPT-3 layout): per-doc
    shard, token offset, and pack span in the packed training stream."""
    return curation.sequence_pack(_docs(spark, sf_dir))


def _q_sequence_pack_rows(spark, sf_dir):
    """Materialized packed training sequences (seq_len=64): the actual
    64-token packs, gapless per shard, trailing partials dropped —
    the writer side of sequence_pack."""
    return curation.sequence_pack_rows(_docs(spark, sf_dir), seq_len=64)


def _q_token_count_subword(spark, sf_dir):
    """Deterministic frozen greedy-merge subword token counts (the
    tokenizer-shaped budget behind sequence packing) next to the
    whitespace counts; the segmentation recursive-CTE text is shared
    verbatim with the DuckDB oracle."""
    return textstats.subword_token_counts(_docs(spark, sf_dir))


def _q_dsir_select(spark, sf_dir):
    """DSIR-style targeted selection: hashed-unigram importance scores
    toward the src0 slice, top-50 raw docs (integer-exact variant)."""
    return curation.dsir_select(_docs(spark, sf_dir))


_LENGTH_REPORT_SQL = """
WITH r AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS cnt
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       max(CASE WHEN rn = (cnt + 1) // 2 THEN n_chars END) AS median_chars,
       max(CASE WHEN rn = greatest(1, (cnt * 9) // 10) THEN n_chars END)
         AS p90_chars
FROM r GROUP BY lang
"""


def _q_corpus_length_report_hist(spark, sf_dir):
    """The two-pass histogram strategy for the SAME length report — the
    scale escape when a single language's rows exceed one partition
    sort.  Same oracle as corpus_length_report: the result is
    bit-identical by construction (rank values depend only on the
    n_chars multiset)."""
    return textstats.corpus_length_report(_docs(spark, sf_dir), mode="histogram")


def _q_corpus_length_report(spark, sf_dir):
    """Per-language length distribution with EXACT median/p90 order
    statistics (deterministic ranks, never approx_percentile)."""
    return textstats.corpus_length_report(_docs(spark, sf_dir))


def _q_duplicate_spans(spark, sf_dir):
    """Exact substring-duplicate spans (Lee et al. 2022): starts of
    20-gram windows appearing in >= 2 documents."""
    return dedup.duplicate_spans(_augmented_docs(_docs(spark, sf_dir)), n=20)


def _q_dedup_spans_apply(spark, sf_dir):
    """Exact substring dedup APPLIED: min-doc_id keeps each duplicated
    20-gram span, every other document drops the covered tokens; the
    rebuilt corpus is the output a training pipeline feeds downstream."""
    return dedup.dedup_spans_apply(_augmented_docs(_docs(spark, sf_dir)), n=20)


def _q_decontaminate(spark, sf_dir):
    """Eval-set decontamination: training docs sharing word 3-grams with
    the held-out slice (doc_id % 97 == 0 plays the eval set; the planted
    near/exact duplicates of those docs are the guaranteed hits)."""
    aug = _augmented_docs(_docs(spark, sf_dir))
    eval_docs = aug.filter(F.col("doc_id") % 97 == 0)
    train = aug.filter(F.col("doc_id") % 97 != 0)
    return dedup.contaminated_docs(train, eval_docs)


def _q_eval_contamination_report(spark, sf_dir):
    """Eval-side contamination audit (GPT-3 appendix-C accounting): per
    eval doc (doc_id % 97 == 0, as in `decontaminate`), the fraction of
    its distinct 3-grams found anywhere in the training split, with the
    10%-dirty flag computed in pure integers."""
    aug = _augmented_docs(_docs(spark, sf_dir))
    eval_docs = aug.filter(F.col("doc_id") % 97 == 0)
    train = aug.filter(F.col("doc_id") % 97 != 0)
    return dedup.eval_contamination_report(train, eval_docs)


def _q_lsh_bucket_audit(spark, sf_dir):
    """Per-band LSH bucket-skew telemetry: exact candidate-pair volume
    the banded self-join would produce, uncapped vs under the production
    cap of 100 — computed arithmetically from bucket counts, never by
    materializing a pair."""
    return dedup.lsh_bucket_audit(_augmented_docs(_docs(spark, sf_dir)), cap=100)


def _q_doc_novelty(spark, sf_dir):
    """Per-document shingle novelty vs the corpus in doc_id (admission)
    order: the fraction of a doc's distinct 3-grams first seen in the
    doc itself.  The planted duplicates (augmented rows) score ~0."""
    return dedup.doc_novelty(_augmented_docs(_docs(spark, sf_dir)))


def _q_dedup_keep_best(spark, sf_dir):
    """Quality-priority dedup retention: in every near-dup cluster keep
    the highest-quality member (tie: lowest doc_id) instead of the
    earliest-crawled one; returns the surviving (doc_id, quality_score)."""
    aug = _augmented_docs(_docs(spark, sf_dir))
    quality = textstats.quality_scores(aug).select("doc_id", "quality_score")
    return dedup.dedup_keep_best(aug, quality)


def _q_domain_dup_report(spark, sf_dir):
    """Per-domain near-duplicate rate (template-farm telemetry): the
    planted duplicates inherit their original's source via the
    doc_id % 1000000 offset convention."""
    docs = _docs(spark, sf_dir)
    aug = _augmented_docs(docs)
    dom = docs.select(F.col("doc_id").alias("base_id"), "source")
    with_domain = aug.join(
        dom, aug.doc_id % 1000000 == F.col("base_id")
    ).select("doc_id", "text", F.col("source").alias("domain"))
    return dedup.domain_dup_report(with_domain)


def _q_snapshot_dedup_report(spark, sf_dir):
    """Cross-snapshot exact re-crawl rate: dumps of 100 consecutive
    doc_ids; the planted +1000000/+2000000 copies land in later dumps
    and count as redundant."""
    return dedup.snapshot_dedup_report(
        _augmented_docs(_docs(spark, sf_dir)), dump_size=100
    )


def _q_doc_chunks(spark, sf_dir):
    """Fixed-size token windows with overlap (training-sample prep):
    40-token chunks every 32 tokens."""
    return scrub.chunk_documents(_docs(spark, sf_dir), chunk_tokens=40, overlap=8)


def _q_corpus_dedup_apply(spark, sf_dir):
    """Dedup APPLIED end to end: MinHash-LSH near-dup pairs -> connected
    components -> drop every non-canonical member; returns the surviving
    corpus (the output a training pipeline actually feeds downstream)."""
    aug = _augmented_docs(_docs(spark, sf_dir))
    pairs = dedup.minhash_lsh_duplicates(aug)
    comp = dedup.duplicate_components(pairs.select("id_a", "id_b"))
    dedup.release_caches(pairs)  # components materialized; caches done
    non_canon = comp.filter(F.col("doc_id") != F.col("component_id")).select(
        "doc_id"
    )
    return aug.join(non_canon, "doc_id", "left_anti").select(
        "doc_id", F.length("text").alias("n_chars")
    )


def _q_pipeline_kept_corpus(spark, sf_dir):
    """The per-dump pipeline's kept corpus (round-7 composition,
    `pipeline_job.run_pipeline(near_dedup="best")`'s document set):
    funnel gates (nonempty → Gopher → exact-dedup canonical; the
    English lang gate off, the pipeline's multilingual default) THEN
    the MinHash near-dup keeper with quality-priority retention —
    `dedup_job.run_dedup_job(keep="best")` over the funnel survivors.
    Exact-recall configuration (max_bucket=None) per the standing
    oracle rule.  Pins the composed semantics the production CLI runs:
    canonical selection restricted to gate survivors, keeper = argmax
    quality_score (tie min doc_id) per near-dup cluster."""
    from deepseek_ocr_customvllm_spark.dedup_job import run_dedup_job

    aug = _augmented_docs(_docs(spark, sf_dir))
    kept = curation.funnel_apply(aug, lang_gate=False)
    survivors = run_dedup_job(kept, max_bucket=None, keep="best")
    return survivors.select("doc_id", F.length("text").alias("n_chars"))


def _q_embedding_kmeans(spark, sf_dir):
    """Iterative distributed k-means (Lloyd's) over quantized embeddings:
    broadcast-literal assignment (map-only) + aggregated centroid update
    per round, deterministic init and tie-breaks."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.kmeans_clusters(emb)


def _oracle_kmeans(k: int = 8, n_iter: int = 2) -> str:
    """The same Lloyd's iterations unrolled as chained CTEs.  Integer
    arithmetic end to end; centroid division truncates toward zero in
    both engines.  The CASE keeps that explicit and sign-safe rather
    than leaning on DuckDB's integer ``//`` semantics (1.0.0 truncates
    like Spark ``div`` — verified — but floor-vs-truncate is exactly
    the kind of engine choice an oracle must not hinge on; see NOTES
    "integer division" rule)."""
    tzdiv = "cast(CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS bigint)"
    parts = [
        f"""
q AS (
  SELECT vec_id,
         list_transform(embedding, x -> cast(round(x * 1000) AS bigint)) AS qe
  FROM embeddings
),
dims AS (
  SELECT vec_id, unnest(qe) AS v, generate_subscripts(qe, 1) AS dim FROM q
),
seeds AS (
  SELECT vec_id, cast(row_number() OVER (ORDER BY vec_id) - 1 AS bigint) AS c
  FROM (SELECT DISTINCT vec_id FROM q)
  QUALIFY row_number() OVER (ORDER BY vec_id) <= {k}
),
c0 AS (SELECT s.c, d.dim, d.v AS cv FROM seeds s JOIN dims d USING (vec_id))"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(f""",
d{i} AS (
  SELECT d.vec_id, c.c, sum((d.v - c.cv) * (d.v - c.cv)) AS dist
  FROM dims d JOIN c{i - 1} c USING (dim)
  GROUP BY 1, 2
),
asg{i} AS (
  SELECT vec_id, cast(min(dist * {k} + c) % {k} AS int) AS cluster
  FROM d{i} GROUP BY 1
),
s{i} AS (
  SELECT a.cluster AS c, d.dim, sum(d.v) AS s, count(*) AS n
  FROM dims d JOIN asg{i} a USING (vec_id)
  GROUP BY 1, 2
),
c{i} AS (
  SELECT c, dim, {tzdiv} AS cv FROM s{i}
  UNION ALL
  SELECT c, dim, cv FROM c{i - 1}
  WHERE c NOT IN (SELECT DISTINCT c FROM s{i})
)""")
    fin = n_iter + 1
    parts.append(f""",
d{fin} AS (
  SELECT d.vec_id, c.c, sum((d.v - c.cv) * (d.v - c.cv)) AS dist
  FROM dims d JOIN c{n_iter} c USING (dim)
  GROUP BY 1, 2
),
a{fin} AS (
  SELECT vec_id, cast(min(dist * {k} + c) AS bigint) AS key FROM d{fin} GROUP BY 1
)
SELECT vec_id, cast(key % {k} AS int) AS cluster,
       cast(key // {k} AS bigint) AS dist
FROM a{fin}""")
    return "WITH " + "".join(parts)


def _q_events_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by first-activity week,
    counted once per (cohort, week-offset) they return in — the classic
    growth-analytics triangle.  Two hash aggregations and one key join;
    integer week arithmetic end to end (portable + deterministic)."""
    _ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    # floor(), not div: the oracle buckets with floor(epoch/604800),
    # which FLOORS, while Spark div truncates toward zero — they would
    # disagree for pre-1970 timestamps, so both engines use floor()
    e = ev.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / F.lit(604800)).cast("long").alias("week"),
    )
    first = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = (
        e.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    ret = activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_users")
    )
    sizes = first.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return ret.join(sizes, "cohort_week").select(
        "cohort_week", "week_offset", "n_users", "cohort_size"
    )


def _gopher_docs(docs: DataFrame) -> DataFrame:
    """Documents with planted bullet lines and duplicate lines so the
    line-level Gopher signals have guaranteed hits (the base corpus is
    single-line).  Mirrored verbatim in the oracle CTE."""
    extra_bullets = F.when(
        F.col("doc_id") % 4 == 0, F.lit("\n- bullet one\n- bullet two")
    ).otherwise(F.lit(""))
    extra_dups = F.when(
        F.col("doc_id") % 6 == 0, F.lit("\nrepeated line\nrepeated line")
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(F.col("text"), extra_bullets, extra_dups).alias("text")
    )


def _q_gopher_quality(spark, sf_dir):
    """Gopher-rule quality signals (word length, symbol ratio, bullet and
    duplicate-line fractions) with the paper's keep thresholds."""
    return textstats.gopher_quality(_gopher_docs(_docs(spark, sf_dir)))


def _q_tfidf_top_terms(spark, sf_dir):
    """Top-5 distinctive terms per source by integer-scaled TF-IDF."""
    return textstats.tfidf_top_terms(_docs(spark, sf_dir), k=5)


# --- corpus-scrubbing inputs (derived deterministically; the documents
# table has no paragraph structure / urls / PII, so both engines build the
# same synthetic ones — mirrored verbatim in the oracle CTEs) -------------

def _para_docs(docs: DataFrame) -> DataFrame:
    """Per-source boilerplate header/footer around each doc's body (the
    body is empty for doc_id % 25 == 0 — pure-boilerplate pages exist on
    the real web and must survive as empty rows, not vanish)."""
    body = F.when(F.col("doc_id") % 25 == 0, F.lit("")).otherwise(F.col("text"))
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("cookie banner for "), F.col("source"), F.lit(" accept all\n\n"),
            body,
            F.lit("\n\nsite footer "), F.col("source"),
            F.lit(" all rights reserved"),
        ).alias("text"),
    )


def _q_paragraph_dedup(spark, sf_dir):
    """CCNet-style corpus-frequency boilerplate removal: paragraphs seen
    in more than max_df documents are dropped from every document."""
    return scrub.paragraph_dedup(_para_docs(_docs(spark, sf_dir)), max_df=10)


def _synth_urls(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".example.com/page/"),
            (F.col("doc_id") % 40).cast("string"),
            F.lit("?utm_source=feed&id="), (F.col("doc_id") % 7).cast("string"),
            F.lit("&utm_campaign=x#sec"), (F.col("doc_id") % 3).cast("string"),
        ).alias("url"),
    )


def _q_url_canonical_dedup(spark, sf_dir):
    """Crawl-frontier dedup by canonical URL (tracking params + fragments
    stripped): groups that differ only in utm_*/#fragment collapse."""
    return scrub.url_duplicates(_synth_urls(_docs(spark, sf_dir)))


def _pii_docs(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), (F.col("doc_id") % 50).cast("string"),
            F.lit("@mail."), F.col("source"), F.lit(".com"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" or call 555-123-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def _q_pii_redact(spark, sf_dir):
    """Email/phone redaction with per-document match counts."""
    return scrub.pii_redact(_pii_docs(_docs(spark, sf_dir)))


def _augmented_embeddings(emb: DataFrame) -> DataFrame:
    """Embeddings plus planted exact-duplicate vectors (dedup hits)."""
    base = emb.select("vec_id", "embedding")
    dups = emb.filter(F.col("vec_id") % 29 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), F.col("embedding")
    )
    return base.unionByName(dups)


_EMB_AUG_CTE = """
emb_aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding
  FROM embeddings WHERE vec_id % 29 = 0
)
"""


def _q_dedup_embedding_cosine(spark, sf_dir):
    emb = _augmented_embeddings(load_table(spark, sf_dir, "embeddings"))
    return similarity.embedding_cosine_duplicates(emb)


def _q_ann_topk_dot(spark, sf_dir):
    return similarity.topk_dot_neighbors(load_table(spark, sf_dir, "embeddings"))


def _q_ann_lsh_bucket(spark, sf_dir):
    return similarity.lsh_buckets(load_table(spark, sf_dir, "embeddings"))


def _q_ann_lsh_topk(spark, sf_dir):
    return similarity.lsh_topk_neighbors(load_table(spark, sf_dir, "embeddings"))


def _q_compression_quality(spark, sf_dir):
    return textstats.compression_quality(_docs(spark, sf_dir))


def _q_ann_ivf_topk(spark, sf_dir):
    return similarity.ivf_topk_neighbors(load_table(spark, sf_dir, "embeddings"))


def _q_ann_recall_report(spark, sf_dir):
    """Recall@k of the LSH and IVF tiers vs the exact tier — the
    metric that justifies turning brute force off at corpus scale."""
    return similarity.ann_recall_report(load_table(spark, sf_dir, "embeddings"))


def _q_ann_recall_clustered(spark, sf_dir):
    """Recall@k of the approximate tiers on a CLUSTERED corpus — the
    regime real embedding corpora live in and the evidence that the
    LSH/IVF tier design is usable (measured: IVF 1.0, LSH 0.8 at
    sf0.01, vs 0.22/0.02 on the raw random vectors, which are locality
    hashing's worst case).  The corpus is derived deterministically
    from the embeddings table (integer center lattice + truncating-div
    noise), so the DuckDB oracle reproduces it bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_recall_report(similarity.clustered_embeddings(emb))


def _q_semdedup_prune(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): semantic dedup scoped to coarse-
    quantizer cells — cluster assignment is a broadcast-literal
    map-only projection, pairwise cosine runs INSIDE each cell only,
    and every epsilon-pair keeps its farthest-from-centroid member.
    Runs over the clustered corpus with planted near-duplicate twins
    (deterministic union-all derivation) so the drop set has a ground
    truth; returns the dropped rows with cluster, centroid distance,
    and epsilon-partner count."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semdedup_prune(
        similarity.semdedup_corpus(similarity.clustered_embeddings(emb))
    )


def _q_temperature_sample(spark, sf_dir):
    """Temperature (alpha = 0.5) multilingual resampling: per-language
    quotas proportional to isqrt(n_l) — the mT5/XLM-R corpus-mixing
    step — selected by deterministic md5 rank.  Integer square root via
    portable floor(sqrt(double)); one Exchange (quota broadcast joins
    the rank window's lang partitioning)."""
    return curation.temperature_sample(_docs(spark, sf_dir))


def _q_ccnet_bucket(spark, sf_dir):
    """CCNet head/middle/tail perplexity bucketing: per-language unigram
    surprisal (bit-width of inverse relative frequency — the portable
    integer log2), mean bits per token per doc, exact per-language
    terciles."""
    return curation.ccnet_bucket(_docs(spark, sf_dir))


def _q_bigram_surprisal(spark, sf_dir):
    """Order-2 LM surprisal: per-doc mean bigram bits under the corpus's
    own conditional bigram model, bigint-exact end to end."""
    return curation.bigram_surprisal(_docs(spark, sf_dir))


def _q_warc_roundtrip(spark, sf_dir):
    """WARC shard encode → distributed parse → per-page byte fingerprint.
    The oracle recomputes length+md5 straight from the documents table,
    so a green row proves the serialize/shard/parse path is lossless."""
    _ensure_utc(spark)
    return warc_roundtrip_report(pages_from_documents(_docs(spark, sf_dir)))


def _q_host_pagerank(spark, sf_dir):
    """3 rounds of integer-exact damped PageRank over the derived host
    graph (broadcast rank table; per-round lineage truncation)."""
    return graph.host_pagerank(_docs(spark, sf_dir))


def _q_warc_extract_pipeline(spark, sf_dir):
    """The full Common-Crawl path as ONE lineage: pages → WARC shard
    blobs → distributed record parse → fused extraction.  The oracle is
    the SAME driver-side `extract_document` VALUES literal the direct
    pipeline uses — a green row proves extraction through the WARC
    round-trip is byte-identical to extraction straight from the table
    (reference ingest analogue: `app/main.py` upload → worker; here the
    corpus arrives as shards, the way Common Crawl actually ships it)."""
    from deepseek_ocr_customvllm_spark.sources.warc import parse_warc, warc_chunks

    _ensure_utc(spark)
    pages = pages_from_documents(_docs(spark, sf_dir))
    parsed = parse_warc(warc_chunks(pages, n_chunks=8))
    return extract_pages(parsed, num_partitions=8).select(
        "url", "content_type", "status", "n_pages", "n_blocks", "n_chars"
    )


def _q_c4_line_filter(spark, sf_dir):
    """C4 §2.2 cleaning (Raffel 2020) over the deterministically
    line-structured corpus: terminal-punctuation / min-words /
    javascript line rules, lorem-ipsum + '{' page poison, 3-kept-lines
    floor, ordered newline reassembly.  One narrow explode + ONE
    map-side-combinable groupBy."""
    from deepseek_ocr_customvllm_spark.operators.scrub import (
        c4_line_filter,
        lined_corpus,
    )

    return c4_line_filter(lined_corpus(_docs(spark, sf_dir)))


def _q_inverted_index(spark, sf_dir):
    """Posting-list index shard: term → exact df/cf + the k-smallest
    doc_id posting head; the window and the final groupBy share one
    term-keyed Exchange, and the posting cap lives inside the
    aggregation (bounded memory under stopword skew)."""
    return textstats.inverted_index(_docs(spark, sf_dir))


def _q_bm25_topk(spark, sf_dir):
    """BM25 ranked retrieval (Okapi, Lucene '+1' idf) for the frozen
    query over the corpus: one explode→groupBy(doc_id) shuffle with a
    conditional tf column per query term, a bounded 1-row stats
    collect, driver-side exact-integer idf folded back as literals,
    TakeOrdered top-k."""
    return textstats.bm25_topk(_docs(spark, sf_dir))


def _q_output_shard_plan(spark, sf_dir):
    """Size-balanced output-file layout: content-keyed writer routing +
    cumulative-bytes roll policy as ONE writer-keyed Exchange shared by
    the window and the final per-file aggregate."""
    return curation.output_shard_plan(_docs(spark, sf_dir))


def _q_unicode_normalize(spark, sf_dir):
    """ftfy-style unicode hygiene over the planted accented corpus: NFC
    composition (Arrow pandas_udf vs DuckDB utf8proc — two independent
    Unicode implementations must agree byte-for-byte), change flag, and
    JVM-side mojibake detection.  Narrow map, no shuffle."""
    from deepseek_ocr_customvllm_spark.operators.scrub import (
        accented_corpus,
        unicode_normalize,
    )

    return unicode_normalize(accented_corpus(_docs(spark, sf_dir)))


def _oracle_unicode_normalize() -> str:
    from deepseek_ocr_customvllm_spark.operators.scrub import (
        MOJI_TAIL,
        MOJIBAKE_MARKERS,
        NFC_TAIL,
        NFD_TAIL,
    )

    detect = " OR ".join(
        f"contains(text, '{m}')" for m in MOJIBAKE_MARKERS
    )
    return f"""
WITH aug AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 5 = 0 THEN '{NFD_TAIL}' ELSE '' END
    || CASE WHEN doc_id % 11 = 0 THEN '{NFC_TAIL}' ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN '{MOJI_TAIL}' ELSE '' END AS text
  FROM documents
)
SELECT doc_id, nfc_normalize(text) AS text_nfc,
       nfc_normalize(text) <> text AS nfc_changed,
       ({detect}) AS mojibake_suspect
FROM aug
"""


def _q_outlink_summary(spark, sf_dir):
    """WAT-style outlink extraction over the synthetic HTML corpus:
    per-page ``<a href>`` + anchor-text scan (JVM regex, map-only) →
    link-target popularity rollup.  The oracle is a pure-Python ``re``
    twin over the same pure-function corpus, so a green row proves the
    whole distributed path — binary cast, regexp_extract_all, transform,
    explode, one Exchange — against an independent regex engine."""
    from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df

    return graph.outlink_summary(synth_pages_df(spark, 300))


def _oracle_outlink_summary(n_docs: int = 300) -> str:
    import re

    from deepseek_ocr_customvllm_spark.operators.graph import (
        A_TAG_RE,
        ANCHOR_RE,
        HREF_RE,
        URL_HOST_RE,
    )
    from deepseek_ocr_customvllm_spark.sources.pagegen import synth_page

    agg: dict[str, list] = {}
    for i in range(n_docs):
        r = synth_page(i)
        html = r["html"].decode("utf-8", errors="replace")
        if not html.startswith("<html"):
            continue
        host = re.match(URL_HOST_RE, r["url"]).group(1)
        for tag in re.findall(A_TAG_RE, html):
            href_m = re.search(HREF_RE, tag)
            anchor_m = re.search(ANCHOR_RE, tag)
            href = href_m.group(1) if href_m else ""
            anchor = anchor_m.group(1) if anchor_m else ""
            a = agg.setdefault(href, [0, set(), set(), anchor])
            a[0] += 1
            a[1].add(host)
            a[2].add(r["url"])
            a[3] = min(a[3], anchor)
    rows = [
        (href, a[0], len(a[1]), len(a[2]), a[3])
        for href, a in sorted(agg.items())
    ]
    return _values_oracle(
        rows,
        ["href", "n_links", "n_hosts", "n_pages", "sample_anchor"],
        {"n_links": "bigint", "n_hosts": "bigint", "n_pages": "bigint"},
    )


def _q_curation_funnel(spark, sf_dir):
    """Stage-by-stage survival funnel of the standard curation cascade
    (nonempty → lang_id → Gopher thresholds → exact dedup), the
    RefinedWeb/FineWeb-style per-dump report, over the planted funnel
    probes (passes-everything rows, exact twins, lang-pass/Gopher-fail
    bullet poison) so every stage has guaranteed hits.  One corpus scan
    for all flags, one fp-keyed aggregate+join, one 1-row agg → stack."""
    return curation.curation_funnel(
        curation.funnel_corpus(_docs(spark, sf_dir))
    )


def _oracle_curation_funnel() -> str:
    good = curation.FUNNEL_GOOD
    poison = curation.FUNNEL_POISON.replace("\n", "' || chr(10) || '")
    return f"""
WITH fun AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000, '{good} v' || cast(doc_id AS varchar)
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 4000000, '{good} v' || cast(doc_id AS varchar)
  FROM documents WHERE doc_id % 6 = 0
  UNION ALL
  SELECT doc_id + 5000000, '{poison} v' || cast(doc_id AS varchar)
  FROM documents WHERE doc_id % 5 = 0
),
norm AS (SELECT doc_id, text, {_NORM_DUCK} AS t FROM fun),
m AS (
  SELECT doc_id, t, md5(t) AS fp,
    CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS n_tok,
    len(regexp_extract_all(t, '{_STOP_RE}')) AS n_stop,
    length(regexp_replace(t, ' ', '', 'g')) AS n_word_chars,
    length(t) - length(regexp_replace(t, '#', '', 'g'))
      + len(regexp_extract_all(t, '\\.\\.\\.')) AS n_symbols,
    len(list_filter(string_split(text, chr(10)), l -> l <> '')) AS n_lines,
    len(list_filter(string_split(text, chr(10)),
                    l -> regexp_matches(l, '^[ \t]*[-*•]'))) AS n_bullets,
    len(list_filter(string_split(text, chr(10)), l -> l <> ''))
      - len(list_distinct(list_filter(string_split(text, chr(10)),
                                      l -> l <> ''))) AS n_dup
  FROM norm
),
f AS (
  SELECT doc_id, fp,
    (t <> '') AS s1,
    (t <> '') AND (n_stop * 10 >= n_tok) AS s2,
    (t <> '') AND (n_stop * 10 >= n_tok)
      AND (3 * n_tok <= n_word_chars) AND (n_word_chars <= 10 * n_tok)
      AND (10 * n_symbols <= n_tok)
      AND (10 * n_bullets <= 9 * n_lines)
      AND (10 * n_dup <= 3 * n_lines) AS s3
  FROM m
),
keepers AS (
  SELECT fp, min(doc_id) AS keep_doc_id FROM f WHERE s3 GROUP BY fp
),
agg AS (
  SELECT count(*) AS n0,
         cast(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS bigint) AS n1,
         cast(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS bigint) AS n2,
         cast(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS bigint) AS n3,
         cast(sum(CASE WHEN s3 AND doc_id = keep_doc_id THEN 1 ELSE 0 END)
              AS bigint) AS n4
  FROM f LEFT JOIN keepers USING (fp)
)
SELECT cast(1 AS int) AS stage_idx, 'nonempty' AS stage, n0 AS n_in, n1 AS n_kept FROM agg
UNION ALL SELECT 2, 'lang_en', n1, n2 FROM agg
UNION ALL SELECT 3, 'gopher_keep', n2, n3 FROM agg
UNION ALL SELECT 4, 'exact_dedup', n3, n4 FROM agg
"""


def _oracle_pipeline_kept_corpus() -> str:
    """Twin of `_q_pipeline_kept_corpus` — the composed per-dump kept
    set: funnel survivors (nonempty → Gopher → exact-dedup canonical,
    lang gate OFF) feed the MinHash components and the quality-priority
    keeper.  The funnel-flag expressions are the `_oracle_curation_funnel`
    ones minus the lang stage; the minhash/verify/components scaffolds
    are the shared `_shingle_cte`/`_INTER_SIZES_CTE`/walk shapes, run
    over the ``kept`` CTE instead of ``aug``."""
    min_aggs = _minhash_min_aggs()
    band_selects = _minhash_band_selects()
    return f"""
WITH RECURSIVE {_AUG_CTE.strip().rstrip()},
fnorm AS (SELECT doc_id, text, {_NORM_DUCK} AS t FROM aug),
fm AS (
  SELECT doc_id, text, t, md5(t) AS fp,
    CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS n_tok,
    length(regexp_replace(t, ' ', '', 'g')) AS n_word_chars,
    length(t) - length(regexp_replace(t, '#', '', 'g'))
      + len(regexp_extract_all(t, '\\.\\.\\.')) AS n_symbols,
    len(list_filter(string_split(text, chr(10)), l -> l <> '')) AS n_lines,
    len(list_filter(string_split(text, chr(10)),
                    l -> regexp_matches(l, '^[ \t]*[-*•]'))) AS n_bullets,
    len(list_filter(string_split(text, chr(10)), l -> l <> ''))
      - len(list_distinct(list_filter(string_split(text, chr(10)),
                                      l -> l <> ''))) AS n_dup
  FROM fnorm
),
ff AS (
  SELECT doc_id, text, fp,
    (t <> '')
      AND (3 * n_tok <= n_word_chars) AND (n_word_chars <= 10 * n_tok)
      AND (10 * n_symbols <= n_tok)
      AND (10 * n_bullets <= 9 * n_lines)
      AND (10 * n_dup <= 3 * n_lines) AS s3
  FROM fm
),
fkeep AS (SELECT fp, min(doc_id) AS keep_doc_id FROM ff WHERE s3 GROUP BY fp),
kept AS (
  SELECT f.doc_id, f.text
  FROM ff f JOIN fkeep k USING (fp)
  WHERE f.s3 AND f.doc_id = k.keep_doc_id
),
{_shingle_cte('kept')},
sig AS (SELECT doc_id, {min_aggs} FROM sh GROUP BY doc_id),
bands AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
),
{_INTER_SIZES_CTE},
vpairs AS (
  SELECT i.id_a, i.id_b
  FROM inter i
  JOIN sizes na ON na.doc_id = i.id_a
  JOIN sizes nb ON nb.doc_id = i.id_b
  WHERE floor(i.n_int * 10000.0 / (na.n + nb.n - i.n_int)) / 10000
        >= {dedup.JACCARD_MIN}
),
sym AS (
  SELECT id_a, id_b FROM vpairs
  UNION
  SELECT id_b AS id_a, id_a AS id_b FROM vpairs
),
walk(doc_id, comp) AS (
  SELECT DISTINCT id_a AS doc_id, id_a AS comp FROM sym
  UNION
  SELECT s.id_a AS doc_id, w.comp
  FROM sym s JOIN walk w ON w.doc_id = s.id_b
),
components AS (
  SELECT doc_id, min(comp) AS component_id FROM walk GROUP BY doc_id
),
{_oracle_quality_cte('kept')},
ranked AS (
  SELECT c.doc_id,
         row_number() OVER (PARTITION BY c.component_id
                            ORDER BY q.quality_score DESC, c.doc_id ASC)
           AS rn
  FROM components c JOIN q USING (doc_id)
)
SELECT k.doc_id, length(k.text) AS n_chars
FROM kept k
WHERE k.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
"""


def _q_snapshot_term_drift(spark, sf_dir):
    """Term-distribution drift (integer TV over ppm-quantized hashed-
    unigram rates) between consecutive synthetic dumps — the data-shift
    monitor next to snapshot_dedup_report's redundancy curve."""
    return curation.snapshot_term_drift(_docs(spark, sf_dir))


def _oracle_snapshot_term_drift(
    dump_size: int = 100, n_buckets: int = 64, ppm: int = 1_000_000
) -> str:
    bucket = dedup.hex_to_bigint_sql("'drift-v1' || term", 8)
    return f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
toks AS (
  SELECT doc_id // {dump_size} AS dump, unnest(string_split(t, ' ')) AS term
  FROM norm WHERE t <> ''
),
counts AS (
  SELECT dump, cast({bucket} % {n_buckets} AS int) AS bucket, count(*) AS c
  FROM toks WHERE term <> '' GROUP BY 1, 2
),
totals AS (SELECT dump, cast(sum(c) AS bigint) AS n_tok FROM counts GROUP BY 1),
grid AS (
  SELECT dump, n_tok, unnest(range(0, {n_buckets})) AS bucket FROM totals
),
rates AS (
  SELECT g.dump, g.bucket, g.n_tok,
         (coalesce(c.c, 0) * {ppm}) // g.n_tok AS rate
  FROM grid g LEFT JOIN counts c ON c.dump = g.dump AND c.bucket = g.bucket
)
SELECT r1.dump AS dump_from, r2.dump AS dump_to,
       r1.n_tok AS n_tok_from, r2.n_tok AS n_tok_to,
       cast(sum(abs(r1.rate - r2.rate)) AS bigint) // 2 AS tv_ppm
FROM rates r1 JOIN rates r2
  ON r1.dump + 1 = r2.dump AND r1.bucket = r2.bucket
GROUP BY 1, 2, 3, 4
"""


def _q_script_profile(spark, sf_dir):
    """Unicode-script histogram + priority-argmax dominant script over
    the planted multi-script corpus (Cyrillic/CJK/Greek tails).  Literal
    codepoint-range classes, so Java regex and RE2 count identically."""
    return textstats.script_profile(
        textstats.scripted_corpus(_docs(spark, sf_dir))
    )


def _oracle_script_profile() -> str:
    from deepseek_ocr_customvllm_spark.operators.textstats import (
        CJK_REPEAT,
        CJK_TAIL,
        CYR_TAIL,
        GREEK_TAIL,
        SCRIPT_PRIORITY,
        SCRIPT_RANGES,
    )

    counts = ",\n         ".join(
        f"length(regexp_replace(t, '[^{SCRIPT_RANGES[n]}]', '', 'g')) AS n_{n}"
        for n in SCRIPT_PRIORITY
    )
    best = "greatest(" + ", ".join(f"n_{n}" for n in SCRIPT_PRIORITY) + ")"
    dom = " ".join(
        f"WHEN {best} > 0 AND n_{n} = {best} THEN '{n}'"
        for n in SCRIPT_PRIORITY
    )
    return f"""
WITH scripted AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 4 = 0 THEN '{CYR_TAIL}' ELSE '' END
    || CASE WHEN doc_id % 9 = 0 THEN repeat('{CJK_TAIL}', {CJK_REPEAT}) ELSE '' END
    || CASE WHEN doc_id % 13 = 0 THEN '{GREEK_TAIL}' ELSE '' END AS text
  FROM documents
),
norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM scripted),
c AS (
  SELECT doc_id,
         {counts}
  FROM norm
)
SELECT doc_id, {", ".join(f"n_{n}" for n in SCRIPT_PRIORITY)},
       CASE {dom} ELSE 'und' END AS dominant_script
FROM c
"""


def _fixture_expectations(n_docs: int = 300):
    """Per-url expected markdown hashes from the pure-Python extractor
    twin — the same driver-side core every extraction VALUES oracle
    uses (no Spark involved)."""
    import hashlib

    rows = []
    for r in _extract_synth_results(n_docs):
        rows.append(
            (
                r.url,
                r.content_type,
                hashlib.md5(r.markdown.encode("utf-8")).hexdigest(),
                hashlib.md5(r.markdown_raw.encode("utf-8")).hexdigest(),
            )
        )
    return rows


def _q_fixture_match_report(spark, sf_dir):
    """THE north-rule metric as a first-class distributed query:
    byte-identical extracted-markdown rate per url, measured by joining
    the fused mapInPandas extraction against the pure-Python twin's
    md5 expectations (broadcast — 1 row per doc).  A green row proves
    the whole distributed path reproduces the reference semantics
    byte-for-byte at every url; any divergence shows up as a dropped
    match count, per content type."""
    from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df

    pages = synth_pages_df(spark, 300)
    ext = extract_pages(pages, num_partitions=8, max_bytes=64 * 1024)
    expected = spark.createDataFrame(
        _fixture_expectations(300),
        "url string, exp_ct string, exp_md string, exp_raw string",
    )
    got = ext.select(
        "url",
        "content_type",
        F.md5("markdown").alias("got_md"),
        F.md5("markdown_raw").alias("got_raw"),
    )
    ok_md = (F.col("got_md") == F.col("exp_md")).cast("bigint")
    ok_raw = (F.col("got_raw") == F.col("exp_raw")).cast("bigint")
    joined = got.join(F.broadcast(expected), "url")
    return (
        joined.groupBy("content_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(ok_md).alias("n_match_clean"),
            F.sum(ok_raw).alias("n_match_raw"),
        )
        .select(
            "content_type",
            "n_docs",
            "n_match_clean",
            "n_match_raw",
            F.expr("(n_match_clean * 1000000) div n_docs").alias(
                "match_ppm"
            ),
        )
    )


def _oracle_fixture_match_report() -> str:
    agg: dict[str, int] = {}
    for _, ct, _, _ in _fixture_expectations(300):
        agg[ct] = agg.get(ct, 0) + 1
    rows = [(ct, n, n, n, 1_000_000) for ct, n in sorted(agg.items())]
    return _values_oracle(
        rows,
        ["content_type", "n_docs", "n_match_clean", "n_match_raw", "match_ppm"],
        {
            "n_docs": "bigint",
            "n_match_clean": "bigint",
            "n_match_raw": "bigint",
            "match_ppm": "bigint",
        },
    )


BPE_MERGES = 8
BPE_TOP_N = 200


def _q_bpe_induce(spark, sf_dir):
    """Distributed BPE tokenizer training: 8 merge rounds over the
    vocabulary-sized distinct-word table (pair count → 1-row argmax →
    pure-SQL non-overlapping merge fold), RoundCheckpointer lineage
    truncation; returns the resulting symbol inventory.  Twin oracle:
    longhand Sennrich BPE in pure Python over the same corpus."""
    return textstats.bpe_induce(
        _docs(spark, sf_dir), n_merges=BPE_MERGES, top_n=BPE_TOP_N
    )


def _oracle_bpe_induce(n_merges: int = BPE_MERGES, top_n: int = BPE_TOP_N) -> str:
    import re

    words: dict[str, int] = {}
    for (text,) in _oracle_docs_rows(("text",)):
        t = re.sub(r"[ \t\n\r\f\x0b]+", " ", (text or "").lower().strip())
        if not t:
            continue
        for w in t.split(" "):
            if w:
                words[w] = words.get(w, 0) + 1
    syms = {w: list(w) for w in words}
    for _ in range(n_merges):
        cnt: dict[tuple, int] = {}
        for w, n in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + n
        if not cnt:
            break
        (left, right), _ = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, s in syms.items():
            out, pend = [], None
            for x in s:
                if pend is None:
                    pend = x
                elif pend == left and x == right:
                    out.append(left + right)
                    pend = None
                else:
                    out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            syms[w] = out
    totals: dict[str, int] = {}
    for w, n in words.items():
        for x in syms[w]:
            totals[x] = totals.get(x, 0) + n
    rows = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    return _values_oracle(
        rows, ["symbol", "n_tokens"], {"n_tokens": "bigint"}
    )


def _q_embedding_drift(spark, sf_dir):
    """Embedding-space drift between consecutive dumps: integer
    centroid means + cross-multiplied squared cosine in basis points —
    the representation-level twin of snapshot_term_drift."""
    return similarity.embedding_drift(
        load_table(spark, sf_dir, "embeddings")
    )


def _oracle_embedding_drift(dump_size: int = 100) -> str:
    return f"""
WITH q AS (
  SELECT vec_id // {dump_size} AS dump,
         list_transform(embedding, x -> cast(round(x * {similarity.QUANT}) AS bigint)) AS qe
  FROM embeddings
),
comps AS (
  SELECT dump, u.i - 1 AS dim, u.x AS x
  FROM (
    SELECT dump,
           unnest(list_transform(qe, (x, i) -> {{'x': x, 'i': i}})) AS u
    FROM q
  )
),
sums AS (
  SELECT dump, dim, cast(sum(x) AS bigint) AS s, count(*) AS n
  FROM comps GROUP BY 1, 2
),
cent AS (
  -- sign-safe toward-zero division (the kmeans-oracle CASE): per-dim
  -- sums are frequently negative, and the installed DuckDB 1.0.0's
  -- integer // happens to truncate like Spark div, but parity must not
  -- hinge on that engine choice (see NOTES "integer division" rule)
  SELECT dump, dim, n,
         CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS c
  FROM sums
),
joined AS (
  SELECT a.dump AS dump_from, b.dump AS dump_to,
         a.n AS n_from, b.n AS n_to,
         cast(sum(a.c * b.c) AS bigint) AS dot,
         cast(sum(a.c * a.c) AS bigint) AS na,
         cast(sum(b.c * b.c) AS bigint) AS nb
  FROM cent a JOIN cent b ON a.dump + 1 = b.dump AND a.dim = b.dim
  GROUP BY 1, 2, 3, 4
),
scaled AS (
  SELECT dump_from, dump_to, n_from, n_to, dot,
         CASE WHEN dot >= 0 THEN dot // 1000
              ELSE -((-dot) // 1000) END AS dk,
         na // 1000 AS nak, nb // 1000 AS nbk
  FROM joined
)
SELECT dump_from, dump_to, n_from, n_to,
       cast(sign(dot) AS int) AS dot_sign,
       (10000 * (dk * dk)) // greatest(nak * nbk, 1) AS cos2_x10000
FROM scaled
"""


MIXTURE_BUDGET = 1_000_000


def _q_mixture_plan(spark, sf_dir):
    """GPT-3 Table-2.2-style mixture planner: per-source token quotas +
    repeat/subsample factors from integer mixture weights (derived
    deterministically from the source name so both engines build the
    identical weights table)."""
    docs = _docs(spark, sf_dir)
    weights = docs.select("source").distinct().select(
        "source",
        F.expr("cast(substring(source, 4, 8) as bigint) % 5 + 1").alias(
            "weight"
        ),
    )
    return curation.mixture_plan(docs, weights, MIXTURE_BUDGET)


def _oracle_mixture_plan() -> str:
    return f"""
WITH norm AS (SELECT source, {_NORM_DUCK} AS t FROM documents),
toks AS (
  SELECT source,
         cast(sum(CASE WHEN t = '' THEN 0
                       ELSE len(string_split(t, ' ')) END) AS bigint)
           AS n_tokens
  FROM norm GROUP BY 1
),
w AS (
  SELECT source,
         cast(substr(source, 4) AS bigint) % 5 + 1 AS weight
  FROM (SELECT DISTINCT source FROM documents)
),
tw AS (SELECT cast(sum(weight) AS bigint) AS total_w FROM w)
SELECT t.source, t.n_tokens, w.weight,
       ({MIXTURE_BUDGET} * w.weight) // total_w AS target_tokens,
       CASE WHEN t.n_tokens > 0
            THEN ((({MIXTURE_BUDGET} * w.weight) // total_w) * 1000)
                 // t.n_tokens
            ELSE NULL END AS repeat_x1000
FROM toks t JOIN w USING (source), tw
"""


PROFILE_ORDERS_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderdate",
    "o_orderpriority",
]


def _q_table_profile(spark, sf_dir):
    """Ingestion trust check: per-column null/cardinality/range profile
    of the orders table in ONE aggregation (typed min/max, exact
    distincts via a single Expand).  Floats are excluded by design —
    their stringification is not dialect-portable."""
    from deepseek_ocr_customvllm_spark.operators.profile import table_profile

    _ensure_utc(spark)
    return table_profile(
        load_table(spark, sf_dir, "orders"), PROFILE_ORDERS_COLS
    )


def _log2fx_duck_ctes(
    src: str, inputs: dict, keys: str = "bucket", f: int = 8
) -> str:
    """DuckDB twin of ``curation.log2_fx_int`` as a chain of CTEs: the
    identical mantissa-squaring spec, one CTE per step so every
    intermediate is a REAL column.  (A lateral-alias one-SELECT version
    expands by substitution — ~3^f tree — and hangs the binder; CTE
    steps are linear.)  Keep in LOCKSTEP with the Python spec —
    ``TestLog2Fx`` sweeps them equal.

    ``inputs``: ``{suffix: expr}`` — each expr (over ``src``'s columns,
    must be >= 1) gets a ``lg_<suffix>`` column in the final CTE
    ``wl{f}``; ``keys`` columns are carried through.
    """
    sfx = list(inputs)
    x_items = ", ".join(f"{inputs[s]} AS x_{s}" for s in sfx)
    i_items = ", ".join(f"length(bin(x_{s})) - 1 AS i_{s}" for s in sfx)
    xs = ", ".join(f"x_{s}" for s in sfx)
    m0 = ", ".join(
        f"CASE WHEN i_{s} >= 20 THEN x_{s} // (1::BIGINT << (i_{s} - 20))"
        f" ELSE x_{s} * (1::BIGINT << (20 - i_{s})) END AS m_{s}"
        for s in sfx
    )
    i_cols = ", ".join(f"i_{s}" for s in sfx)
    a0 = ", ".join(f"0::BIGINT AS a_{s}" for s in sfx)
    ctes = [
        f"wlx AS (SELECT {keys}, {x_items} FROM {src})",
        f"wli AS (SELECT {keys}, {xs}, {i_items} FROM wlx)",
        f"wl0 AS (SELECT {keys}, {i_cols}, {a0}, {m0} FROM wli)",
    ]
    for k in range(1, f + 1):
        step = ", ".join(
            f"a_{s} + CASE WHEN (m_{s} * m_{s}) // 1048576 >= 2097152"
            f" THEN {2 ** (f - k)} ELSE 0 END AS a_{s},"
            f" CASE WHEN (m_{s} * m_{s}) // 1048576 >= 2097152"
            f" THEN ((m_{s} * m_{s}) // 1048576) // 2"
            f" ELSE (m_{s} * m_{s}) // 1048576 END AS m_{s}"
            for s in sfx
        )
        ctes.append(
            f"wl{k} AS (SELECT {keys}, {i_cols}, {step} FROM wl{k - 1})"
        )
    lg = ", ".join(f"i_{s} * {2 ** f} + a_{s} AS lg_{s}" for s in sfx)
    ctes.append(f"wl{f + 1} AS (SELECT {keys}, {lg} FROM wl{f})")
    return ",\n".join(ctes)


def _oracle_bm25() -> str:
    """DuckDB twin of ``textstats.bm25_topk`` for the frozen query
    terms: same one-pass (doc_id → dl, tf_i) aggregate, same integer
    BM25 arithmetic, idf through the shared fixed-point log2 chain."""
    from deepseek_ocr_customvllm_spark.operators.textstats import (
        BM25_QUERY_TERMS,
        BM25_TF_SCALE,
        BM25_TOPK,
    )

    terms = list(BM25_QUERY_TERMS)
    s = BM25_TF_SCALE
    tf_cols = ", ".join(
        f"sum(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"coalesce(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END), 0) AS df{i}"
        for i in range(len(terms))
    )
    lg_inputs = {"num": "2 * n + 2"}
    for i in range(len(terms)):
        lg_inputs[f"b{i}"] = f"2 * df{i} + 1"
    logchain = _log2fx_duck_ctes("st2", lg_inputs, keys="avgdl10")
    hit = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(terms))
    )
    contrib = " + ".join(
        f"(lg_num - lg_b{i}) * ((22 * tf{i} * avgdl10 * {s}) // "
        f"(10 * tf{i} * avgdl10 + 3 * avgdl10 + 90 * d.dl))"
        for i in range(len(terms))
    )
    return f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
words AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS term
  FROM norm WHERE t <> ''
),
da AS (
  SELECT doc_id, count(*) AS dl, {tf_cols}
  FROM words WHERE term <> '' GROUP BY 1
),
st AS (
  SELECT greatest(count(*), 1) AS n, coalesce(sum(dl), 0) AS tot, {df_cols}
  FROM da
),
st2 AS (
  SELECT n, greatest((10 * tot) // n, 1) AS avgdl10,
         {', '.join(f'df{i}' for i in range(len(terms)))}
  FROM st
),
{logchain},
sc AS (
  SELECT d.doc_id, cast(d.dl AS bigint) AS dl,
         cast({hit} AS int) AS n_hit_terms,
         cast({contrib} AS bigint) AS score_fx
  FROM da d CROSS JOIN wl9 w
)
SELECT doc_id, dl, n_hit_terms, score_fx FROM sc
WHERE n_hit_terms > 0
ORDER BY score_fx DESC, doc_id LIMIT {BM25_TOPK}
"""


# DuckDB twin of curation.nb_quality_classifier's NB chain, shared by
# the raw-corpus oracle and the planted-truth eval oracle.  Expects a
# preceding CTE `norm(doc_id, is_pos, t)`; yields `scores(doc_id,
# n_terms, score)`.  Interpolated smoothing + the fixed-point log2
# chain — see the operator docstring for the arithmetic.
_NBQ_CHAIN_TMPL = """words AS (
  SELECT doc_id, is_pos, unnest(string_split(t, ' ')) AS term
  FROM norm WHERE t <> ''
),
feat AS (
  SELECT doc_id, is_pos,
         cast({h} % 256 AS int) AS bucket,
         count(*) AS cnt
  FROM words WHERE term <> '' GROUP BY 1, 2, 3
),
dist AS (
  SELECT bucket,
         cast(sum(CASE WHEN is_pos THEN cnt ELSE 0 END) AS bigint) AS cp,
         cast(sum(CASE WHEN NOT is_pos THEN cnt ELSE 0 END) AS bigint) AS cn
  FROM feat GROUP BY 1
),
tot AS (SELECT cast(sum(cp) AS bigint) AS tp, cast(sum(cn) AS bigint) AS tn FROM dist),
{logchain},
wt AS (SELECT bucket, cast(lg_a - lg_b - lg_c + lg_d AS bigint) AS w FROM wl{flast}),
scores AS (
  SELECT f.doc_id, cast(sum(f.cnt) AS bigint) AS n_terms,
         cast(sum(f.cnt * w.w) AS bigint) AS score
  FROM feat f JOIN wt w USING (bucket) GROUP BY 1
)"""


def _nbq_chain(f: int = 8) -> str:
    K = curation.NBQ_ALPHA_K
    return _NBQ_CHAIN_TMPL.format(
        h=dedup.hex_to_bigint_sql("'nbq-v1' || term", 8),
        flast=f + 1,
        logchain=_log2fx_duck_ctes(
            "dist CROSS JOIN tot",
            {
                "a": f"greatest(cp * {K} + tp, 1)",
                "b": f"greatest(cn * {K} + tn, 1)",
                "c": "greatest(tp, 1)",
                "d": "greatest(tn, 1)",
            },
            f=f,
        ),
    )


BLOCKLIST = (
    "site13.com",        # domain + all subdomains
    "sub6.site13.com",   # MORE specific twin: must win on site13 sub6 docs
    "site55.org",
    "sub3.site89.net",   # subdomain-only rule: other subs of site89 kept
)


def _q_domain_blocklist(spark, sf_dir):
    """UT1-style suffix blocklist audit over the derived host frame:
    suffix explode (bounded by label count) equi-joins the broadcast
    rule list; blocked_by = most specific matching rule, NULL = kept."""
    from deepseek_ocr_customvllm_spark.operators.scrub import (
        domain_blocklist_report,
        synthetic_hosts,
    )

    return domain_blocklist_report(
        synthetic_hosts(_docs(spark, sf_dir)), BLOCKLIST
    )


def _q_quality_classifier(spark, sf_dir):
    """GPT-3 Appendix-A model-based quality filter: NB trained on
    source seed labels with interpolated smoothing, every doc scored in
    fixed-point integer log2-space (`log2_fx_int`, 2^-8-bit units),
    labeled high/low at score 0."""
    return curation.nb_quality_classifier(_docs(spark, sf_dir))


def _q_quality_classifier_eval(spark, sf_dir):
    """The classifier's acceptance metric: confusion matrix + integer
    precision/recall vs the planted truth of labeled_quality_corpus
    (curated seed positives, noisy 50/50 crawl negatives)."""
    return curation.quality_classifier_eval(_docs(spark, sf_dir))


def _q_training_set_assembly(spark, sf_dir):
    """The curation capstone as one composed lineage: exact dedup
    (fingerprint keeper) → min-length gate → temperature (alpha=0.5)
    language rebalancing → concat-and-chunk packed layout.  Every
    stage is a sibling operator's core, so the composite is
    bit-reproducible and fully oracle-checked end to end."""
    return curation.training_set_assembly(_docs(spark, sf_dir))


def _q_source_quality_report(spark, sf_dir):
    return textstats.source_quality_report(_docs(spark, sf_dir))


def _q_embedding_norm_stats(spark, sf_dir):
    return similarity.embedding_norm_stats(load_table(spark, sf_dir, "embeddings"))


def _q_resume_anti_join(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    done = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    return (
        docs.join(done, "doc_id", "left_anti")
        .groupBy("source")
        .agg(F.count("*").alias("n_pending"))
    )


def _q_status_counts(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    status = (
        F.when(F.col("n_chars") % 97 == 0, F.lit("FAILED"))
        .when(F.col("n_chars") > 500, F.lit("REJECTED"))
        .otherwise(F.lit("SUCCESS"))
    )
    return docs.select(status.alias("status")).groupBy("status").agg(
        F.count("*").alias("n_docs")
    )


def _q_quarantine_oversize(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .filter(F.col("n_chars") > 450)
        .groupBy("source")
        .agg(F.count("*").alias("n_oversize"), F.max("n_chars").alias("max_chars"))
    )


def _q_lineage_rollup(spark, sf_dir):
    from deepseek_ocr_customvllm_spark.operators.textstats import dsum, dtrunc

    _ensure_utc(spark)
    ev = load_table(spark, sf_dir, "events")
    total = dsum(F.col("value"), 2)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        total.alias("total_value"),
        dtrunc(total / F.count("*"), 4).alias("avg_value"),
        F.unix_timestamp(F.min("ts")).alias("first_ts"),
        F.unix_timestamp(F.max("ts")).alias("last_ts"),
    )


def _q_tpch_q1(spark, sf_dir):
    from deepseek_ocr_customvllm_spark.operators.textstats import dsum, dtrunc
    from deepseek_ocr_customvllm_spark.plans.layout import spread_input

    _ensure_utc(spark)
    # narrow projection, then the layout guard: the exact decimal sums
    # (dsum) are the per-row cost here, and a single-row-group source
    # otherwise serializes them onto one task (guide §2.5; no-op on a
    # properly split table — decimal sums are order-independent exact
    # integer arithmetic, so results are unchanged by placement)
    li = spread_input(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        )
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            dtrunc(dsum(F.col("l_quantity"), 2) / n, 4).alias("avg_qty"),
            dtrunc(dsum(F.col("l_extendedprice"), 2) / n, 4).alias("avg_price"),
            dtrunc(dsum(F.col("l_discount"), 2) / n, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


_TOP_CUSTOMERS_SQL = """
WITH rev AS (
  SELECT o_custkey,
         cast(sum(cast(o_totalprice as decimal(28,2))) as double) AS revenue,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT /*+ BROADCAST(n, r) */
         r.r_name AS region, c.c_custkey, c.c_name, rev.revenue, rev.n_orders
  FROM rev
  JOIN customer c ON c.c_custkey = rev.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
),
rk AS (
  SELECT region, c_custkey, c_name, revenue, n_orders,
         row_number() OVER (PARTITION BY region ORDER BY revenue DESC, c_custkey) AS rnk
  FROM j
)
SELECT region, c_custkey, c_name, revenue, n_orders, rnk FROM rk WHERE rnk <= 3
"""


def _q_top_customers_per_region(spark, sf_dir):
    # nation/region are pinned broadcast via the /*+ BROADCAST(n, r) */ hint
    # (a comment to DuckDB, so the SQL text stays dialect-portable).
    # customer is deliberately NOT hinted: customer ⋈ rev is large-large at
    # scale and must stay a shuffle join (AQE may still broadcast it at
    # small SF, which is the right call there).
    register_views(spark, sf_dir)
    return spark.sql(_TOP_CUSTOMERS_SQL)


def _funnel_sql(ts_diff: str) -> str:
    """Dialect-shared funnel query; ``ts_diff`` is the engine's
    seconds-between expression (Spark unix_timestamp vs DuckDB epoch)."""
    return f"""
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
s AS (
  SELECT user_id, ts, event_id, event_type,
         sum(CASE WHEN prev IS NULL OR ({ts_diff}) > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM e
),
o AS (
  SELECT user_id, session_id, event_type,
         row_number() OVER (PARTITION BY user_id, session_id
                            ORDER BY ts, event_id) AS ord
  FROM s
),
conv AS (
  SELECT user_id, session_id,
         min(CASE WHEN event_type = 'view' THEN ord END) AS first_view_ord,
         max(CASE WHEN event_type = 'purchase' THEN ord END) AS last_purchase_ord
  FROM o GROUP BY user_id, session_id
)
SELECT user_id,
       count(*) AS n_sessions,
       cast(sum(CASE WHEN first_view_ord IS NOT NULL THEN 1 ELSE 0 END) AS bigint)
         AS n_view_sessions,
       cast(sum(CASE WHEN first_view_ord IS NOT NULL
                      AND last_purchase_ord > first_view_ord
                     THEN 1 ELSE 0 END) AS bigint) AS n_converted
FROM conv GROUP BY user_id
"""


def _q_events_funnel(spark, sf_dir):
    """View -> purchase conversion per 30-minute session: sessionize
    (gap windows), order within session, flag sessions where a purchase
    follows the first view."""
    _ensure_utc(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        _funnel_sql("unix_timestamp(ts) - unix_timestamp(prev)")
    )


def _q_events_sessionize(spark, sf_dir):
    _ensure_utc(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
WITH e AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
s AS (
  SELECT user_id,
         CASE WHEN prev IS NULL
                   OR (unix_timestamp(ts) - unix_timestamp(prev)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM e
)
SELECT user_id, sum(new_session) AS n_sessions, count(*) AS n_events
FROM s GROUP BY user_id
"""
    )


def _q_multimodal_inspect(spark, sf_dir):
    return inspect_payloads(_docs(spark, sf_dir))


def _media_payload(doc_id: int) -> bytes:
    from deepseek_ocr_customvllm_spark.operators.multimodal import synth_media_payload

    return synth_media_payload(doc_id)


def _audio_payload(doc_id: int) -> bytes:
    from deepseek_ocr_customvllm_spark.operators.multimodal import synth_audio_payload

    return synth_audio_payload(doc_id)


def _q_audio_features(spark, sf_dir):
    """Real PCM audio decode as a pipeline stage (stdlib RIFF parser)."""
    from deepseek_ocr_customvllm_spark.operators import multimodal

    docs = _docs(spark, sf_dir).select("doc_id")

    def gen(it):
        # imports INSIDE the closure: executors import the (py-files
        # shipped) package, never this driver-contract module
        import pandas as pd

        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            synth_audio_payload,
        )

        for pdf in it:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {"media_id": ids, "payload": [synth_audio_payload(i) for i in ids]}
            )

    media = docs.mapInPandas(gen, schema="media_id long, payload binary")
    return multimodal.audio_features(media)


def _q_image_features(spark, sf_dir):
    """Real image decode as a pipeline stage: synthesize the deterministic
    media corpus executor-side from doc ids, decode (BMP/PPM stdlib
    decoders), emit exact integer channel sums + thumbnail hash."""
    from deepseek_ocr_customvllm_spark.operators import multimodal

    docs = _docs(spark, sf_dir).select("doc_id")

    def gen(it):
        # imports INSIDE the closure: executors import the (py-files
        # shipped) package, never this driver-contract module
        import pandas as pd

        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            synth_media_payload,
        )

        for pdf in it:
            ids = pdf["doc_id"].tolist()
            yield pd.DataFrame(
                {"media_id": ids, "payload": [synth_media_payload(i) for i in ids]}
            )

    media = docs.mapInPandas(gen, schema="media_id long, payload binary")
    return multimodal.image_features(media)


def _q_lineitem_rollup(spark, sf_dir):
    """ROLLUP over (returnflag, linestatus): subtotal + grand-total rows."""
    from deepseek_ocr_customvllm_spark.operators.textstats import dsum

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), dsum(F.col("l_quantity"), 2).alias("sum_qty"))
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _q_events_pivot(spark, sf_dir):
    """Per-user event-type pivot (fixed value list -> stable schema)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
    )


def _q_events_asof_join(spark, sf_dir):
    """As-of join: for each purchase, the user's most recent prior view.

    Spark has no native as-of join; the standard composition is a
    union-tag + window over event time (the applyInPandas/merge_asof
    alternative shuffles the same way but leaves the JVM)."""
    _ensure_utc(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'view' THEN ts END AS view_ts
  FROM events WHERE event_type IN ('view', 'purchase')
),
filled AS (
  SELECT user_id, ts, event_id, event_type,
         max(view_ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS last_view_ts
  FROM tagged
)
SELECT user_id, event_id,
       cast(unix_timestamp(ts) as bigint) AS purchase_ts,
       cast(unix_timestamp(last_view_ts) as bigint) AS last_view_ts
FROM filled WHERE event_type = 'purchase'
"""
    )


def _q_customer_running_revenue(spark, sf_dir):
    """Running per-customer revenue over order time (window frame agg)."""
    _ensure_utc(spark)
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = F.sum(F.col("o_totalprice").cast("decimal(28,2)")).over(w).cast("double")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.unix_timestamp("o_orderdate").alias("order_ts"),
        running.alias("running_revenue"),
    )


# -- extraction pipeline (rows-only: the extractor IS the engine under test)

def _q_extract_documents_pipeline(spark, sf_dir):
    pages = pages_from_documents(_docs(spark, sf_dir))
    return extract_pages(pages, num_partitions=8).select(
        "url", "content_type", "status", "n_pages", "n_blocks", "n_chars"
    )


def _q_extract_block_histogram(spark, sf_dir):
    # synthetic corpus: exercises every block type (headings, paragraphs,
    # tables incl. validation states, images from grounding tags)
    from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df

    pages = synth_pages_df(spark, 300)
    extracted = extract_pages(pages, num_partitions=8, max_bytes=64 * 1024)
    blocks = extracted.select(
        F.explode("blocks").alias("page")
    ).select(F.explode("page.blocks").alias("b"))
    return blocks.groupBy(F.col("b.type").alias("block_type")).agg(
        F.count("*").alias("n_blocks"),
        F.countDistinct("b.validation").alias("n_validation_states"),
    )


def _q_extract_synth_summary(spark, sf_dir):
    from deepseek_ocr_customvllm_spark.sources.pages import synth_pages_df

    pages = synth_pages_df(spark, 300)
    extracted = extract_pages(pages, num_partitions=8, max_bytes=64 * 1024)
    return (
        extracted.groupBy("content_type", "status")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_pages").alias("n_pages"),
            F.sum("n_blocks").alias("n_blocks"),
            F.sum(F.size("spans")).alias("n_spans"),
        )
        .orderBy("content_type", "status")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry ORDER is deliberate — the driver records ~the first 50
    # entries per round (always exactly the registry-order prefix; see
    # NOTES.md "driver query budget").  STANDING ROTATION RULE: every
    # entry WITHOUT a row in round N runs in the first 50 of round N+1,
    # so no entry's driver row is ever more than one round stale.
    # Round 7 order (the concrete target pre-planned in NOTES.md at the
    # end of round 6; CORRECTNESS_r06.json had exactly 50 rows, so the
    # addition budget was one retirement):
    # 1-49   every entry without an r06 driver row (positions 51-100
    #        last round, all r05-green) — must get an r07 row;
    #        `corpus_length_report_hist` RETIRED from the registry (its
    #        oracle was identical to `corpus_length_report`'s; the
    #        operator + property tests remain) to fund the round-7
    #        addition;
    # 50     round-7 addition (near-dup application composed into the
    #        per-dump pipeline) slots in right behind the rotated group;
    # 51+    the round-6 prefix (all r06-green) in its present order.
    return {
        # --- 1-49: r05-green, no r06 row — must get an r07 row ---
        "dedup_recall_report": _q_dedup_recall_report,
        "dedup_simhash_pairs": _q_dedup_simhash_pairs,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_minhash_lsh": _q_dedup_minhash_lsh,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "dedup_components": _q_dedup_components,
        "dedup_embedding_cosine": _q_dedup_embedding_cosine,
        "dedup_incremental": _q_dedup_incremental,
        "dedup_spans_apply": _q_dedup_spans_apply,
        "duplicate_spans": _q_duplicate_spans,
        "decontaminate": _q_decontaminate,
        "corpus_dedup_apply": _q_corpus_dedup_apply,
        "sequence_pack": _q_sequence_pack,
        "dsir_select": _q_dsir_select,
        "semdedup_prune": _q_semdedup_prune,
        "temperature_sample": _q_temperature_sample,
        "ccnet_bucket": _q_ccnet_bucket,
        "training_set_assembly": _q_training_set_assembly,
        "token_count": _q_token_count,
        "lang_id": _q_lang_id,
        "lang_id_multi": _q_lang_id_multi,
        "quality_score": _q_quality_score,
        "corpus_filter": _q_corpus_filter,
        "vocab_topk": _q_vocab_topk,
        "doc_sample": _q_doc_sample,
        "domain_stats": _q_domain_stats,
        "doc_fingerprint": _q_doc_fingerprint,
        "doc_rolling_fingerprint": _q_doc_rolling_fingerprint,
        "lang_stratified_sample": _q_lang_stratified_sample,
        "ann_recall_clustered": _q_ann_recall_clustered,
        "paragraph_dedup": _q_paragraph_dedup,
        "url_canonical_dedup": _q_url_canonical_dedup,
        "pii_redact": _q_pii_redact,
        "doc_chunks": _q_doc_chunks,
        "embedding_kmeans": _q_embedding_kmeans,
        "events_retention": _q_events_retention,
        "gopher_quality": _q_gopher_quality,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "events_sessionize": _q_events_sessionize,
        "events_funnel": _q_events_funnel,
        "lineitem_rollup": _q_lineitem_rollup,
        "events_pivot": _q_events_pivot,
        "lineage_rollup": _q_lineage_rollup,
        "status_counts": _q_status_counts,
        "quarantine_oversize": _q_quarantine_oversize,
        "multimodal_inspect": _q_multimodal_inspect,
        "image_features": _q_image_features,
        "audio_features": _q_audio_features,
        # --- 50: round-7 addition, behind the rotated group ---
        "pipeline_kept_corpus": _q_pipeline_kept_corpus,
        # --- 51+: round-6 prefix, all r06-green, present order ---
        "ann_topk_dot": _q_ann_topk_dot,
        "ann_lsh_bucket": _q_ann_lsh_bucket,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "compression_quality": _q_compression_quality,
        "source_quality_report": _q_source_quality_report,
        "embedding_norm_stats": _q_embedding_norm_stats,
        "resume_anti_join": _q_resume_anti_join,
        "events_asof_join": _q_events_asof_join,
        "customer_running_revenue": _q_customer_running_revenue,
        "extract_documents_pipeline": _q_extract_documents_pipeline,
        "extract_block_histogram": _q_extract_block_histogram,
        "extract_synth_summary": _q_extract_synth_summary,
        "domain_quota_sample": _q_domain_quota_sample,
        "repetition_signals": _q_repetition_signals,
        "corpus_length_report": _q_corpus_length_report,
        "ann_recall_report": _q_ann_recall_report,
        "flagship_doc_stats": _q_flagship_doc_stats,
        "tpch_q1": _q_tpch_q1,
        "top_customers_per_region": _q_top_customers_per_region,
        "sequence_pack_rows": _q_sequence_pack_rows,
        "token_count_subword": _q_token_count_subword,
        "eval_contamination_report": _q_eval_contamination_report,
        "lsh_bucket_audit": _q_lsh_bucket_audit,
        "doc_novelty": _q_doc_novelty,
        "dedup_keep_best": _q_dedup_keep_best,
        "domain_dup_report": _q_domain_dup_report,
        "snapshot_dedup_report": _q_snapshot_dedup_report,
        "bigram_surprisal": _q_bigram_surprisal,
        "warc_roundtrip": _q_warc_roundtrip,
        "host_pagerank": _q_host_pagerank,
        "warc_extract_pipeline": _q_warc_extract_pipeline,
        "c4_line_filter": _q_c4_line_filter,
        "quality_classifier": _q_quality_classifier,
        "inverted_index": _q_inverted_index,
        "domain_blocklist": _q_domain_blocklist,
        "quality_classifier_eval": _q_quality_classifier_eval,
        "bm25_topk": _q_bm25_topk,
        "output_shard_plan": _q_output_shard_plan,
        "table_profile": _q_table_profile,
        "unicode_normalize": _q_unicode_normalize,
        "outlink_summary": _q_outlink_summary,
        "curation_funnel": _q_curation_funnel,
        "snapshot_term_drift": _q_snapshot_term_drift,
        "script_profile": _q_script_profile,
        "mixture_plan": _q_mixture_plan,
        "fixture_match_report": _q_fixture_match_report,
        "bpe_induce": _q_bpe_induce,
        "dup_cluster_histogram": _q_dup_cluster_histogram,
        "embedding_drift": _q_embedding_drift,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB dialect)
# ---------------------------------------------------------------------------

def _minhash_min_aggs() -> str:
    """The m0..m7 min-hash aggregate list — ONE definition for every
    dedup oracle (Spark twin: dedup.minhash_signatures)."""
    return ", ".join(
        f"min(md5('{i}|' || sh)) AS m{i}" for i in range(dedup.N_HASHES)
    )


def _minhash_band_selects(sig: str = "sig") -> str:
    """The banded-signature UNION block over ``sig`` — ONE definition
    (Spark twin: dedup._banded)."""
    return "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, md5(m{2 * b} || m{2 * b + 1}) AS bk FROM {sig}"
        for b in range(dedup.N_BANDS)
    )


def _shingle_cte(source: str) -> str:
    """norm -> toks -> sh (distinct 3-gram shingles) over ``source`` —
    ONE definition shared by the dedup oracles (Spark twin:
    dedup.shingles; DuckDB range() is 1-based where Spark sequence()
    is 0-based, hence ts[i]..ts[i+2] from range(1, len(ts) - 1))."""
    return f"""norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM {source}),
toks AS (SELECT doc_id, string_split(t, ' ') AS ts FROM norm WHERE t <> ''),
sh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS sh
  FROM toks, LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i) r
  WHERE len(ts) >= 3
)"""


# the exact-Jaccard verify core over ``cand`` — shared verbatim by the
# minhash / ngram / incremental oracles (Spark twin: dedup.jaccard_verify)
_INTER_SIZES_CTE = """inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_int
  FROM cand c
  JOIN sh s1 ON s1.doc_id = c.id_a
  JOIN sh s2 ON s2.doc_id = c.id_b AND s2.sh = s1.sh
  GROUP BY c.id_a, c.id_b
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id)"""


def _oracle_components_cte() -> str:
    """Shared recursive connected-components scaffold over the minhash
    pairs (twin of ``dedup.duplicate_components``): defines CTEs
    ``pairs``/``sym``/``walk``/``comp`` with ``comp(doc_id,
    component_id)``.  Callers splice it directly after WITH RECURSIVE."""
    return f"""pairs AS (
  SELECT id_a, id_b FROM ({_oracle_minhash().strip()}) mh
),
sym AS (
  SELECT id_a, id_b FROM pairs
  UNION
  SELECT id_b AS id_a, id_a AS id_b FROM pairs
),
walk(doc_id, comp) AS (
  SELECT DISTINCT id_a AS doc_id, id_a AS comp FROM sym
  UNION
  SELECT s.id_a AS doc_id, w.comp
  FROM sym s JOIN walk w ON w.doc_id = s.id_b
),
comp AS (SELECT doc_id, min(comp) AS component_id FROM walk GROUP BY doc_id)"""


def _oracle_quality_cte(src: str) -> str:
    """The quality_score computation as splice-able CTEs over ``src``
    (twin of ``textstats.quality_scores``, identical expressions to the
    standalone ``quality_score`` oracle): defines ``qnorm``/``qc``/
    ``qd``/``q`` with ``q(doc_id, quality_score)``."""
    return f"""qnorm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM {src}),
qc AS (
  SELECT doc_id,
         CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS n_words,
         len(regexp_extract_all(t, '{_STOP_RE}')) AS n_stop,
         length(t) AS n_chars
  FROM qnorm
),
qd AS (
  SELECT doc_id, n_words,
         floor((n_chars * 1.0 / greatest(n_words, 1)) * 10000) / 10000 AS awl,
         floor((n_stop * 1.0 / greatest(n_words, 1)) * 10000) / 10000 AS sr
  FROM qc
),
q AS (
  SELECT doc_id,
         floor((least(1.0, n_words / 100.0) * 0.5 + sr * 0.3 +
                CASE WHEN awl >= 3 AND awl <= 8 THEN 0.2 ELSE 0.0 END)
               * 10000) / 10000 AS quality_score
  FROM qd
)"""


def _oracle_minhash() -> str:
    min_aggs = _minhash_min_aggs()
    band_selects = _minhash_band_selects()
    return f"""
WITH {_AUG_CTE.strip().rstrip()},
{_shingle_cte('aug')},
sig AS (SELECT doc_id, {min_aggs} FROM sh GROUP BY doc_id),
bands AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
),
{_INTER_SIZES_CTE}
SELECT i.id_a, i.id_b,
       floor(i.n_int * 10000.0 / (na.n + nb.n - i.n_int)) / 10000 AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE floor(i.n_int * 10000.0 / (na.n + nb.n - i.n_int)) / 10000 >= {dedup.JACCARD_MIN}
"""


def _oracle_incremental() -> str:
    """Twin of dedup.incremental_dedup over aug + fresh-reversed rows:
    per-doc signatures over the shared shingle CTE (identical to
    per-side signatures — min over a doc's own shingles), band keys,
    the new-vs-old two-corpus join (id_a >= boundary > id_b), the
    exact-Jaccard verify, and the per-new-doc match rollup."""
    min_aggs = _minhash_min_aggs()
    band_selects = _minhash_band_selects()
    bd = 1_000_000
    return f"""
WITH {_AUG_CTE.strip().rstrip()},
corpus AS (
  SELECT doc_id, text FROM aug
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, reverse(text) AS text
  FROM documents WHERE doc_id % 43 = 0
),
{_shingle_cte('corpus')},
sig AS (SELECT doc_id, {min_aggs} FROM sh GROUP BY doc_id),
bands AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT n.doc_id AS id_a, o.doc_id AS id_b
  FROM bands n JOIN bands o
    ON n.band = o.band AND n.bk = o.bk
   AND n.doc_id >= {bd} AND o.doc_id < {bd}
),
{_INTER_SIZES_CTE},
ver AS (
  SELECT i.id_a, i.id_b,
         floor(i.n_int * 10000.0 / (na.n + nb.n - i.n_int)) / 10000 AS jaccard
  FROM inter i
  JOIN sizes na ON na.doc_id = i.id_a
  JOIN sizes nb ON nb.doc_id = i.id_b
  WHERE floor(i.n_int * 10000.0 / (na.n + nb.n - i.n_int)) / 10000
        >= {dedup.JACCARD_MIN}
)
SELECT id_a AS doc_id, count(*) AS n_old_matches,
       min(id_b) AS first_old_id, max(jaccard) AS max_jaccard
FROM ver GROUP BY id_a ORDER BY doc_id
"""


def _oracle_dedup_recall() -> str:
    """Twin of dedup.dedup_recall_report: exhaustive shingle-join truth
    + the minhash-LSH and simhash tiers on the doc_id % 4 == 0 subset,
    then pair recall per method.  Division order mirrors Spark's
    dtrunc(n_hits / greatest(n_truth, 1), 4) — the greatest() guard keeps
    a zero-ground-truth corpus from diverging (Spark NULL vs DuckDB
    division-by-zero error)."""
    min_aggs = _minhash_min_aggs()
    band_selects = _minhash_band_selects("msig")
    v = dedup.hex_to_bigint_sql("tok", 15)
    nbits = dedup.SIMHASH_BITS
    bit_aggs = ",\n    ".join(
        f"sum(case when (v // {2 ** b}) % 2 = 1 then 1 else -1 end) AS b{b}"
        for b in range(nbits)
    )
    sim = " + ".join(
        f"(case when b{b} > 0 then {2 ** b} else 0 end)" for b in range(nbits)
    )
    band_mod = 2 ** dedup.SIMHASH_BAND_BITS
    sband_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, simhash, {k} AS band,"
        f" (simhash // {band_mod ** k}) % {band_mod} AS bk FROM ssig"
        for k in range(dedup.SIMHASH_BANDS)
    )
    # second, independent signature family (the x2 tier): identical
    # machinery over the salted token hash
    v2 = dedup.hex_to_bigint_sql(
        f"'{dedup.SIMHASH_X2_SALT}' || tok", 15
    )
    s2band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, simhash, {k} AS band,"
        f" (simhash // {band_mod ** k}) % {band_mod} AS bk FROM s2sig"
        for k in range(dedup.SIMHASH_BANDS)
    )
    jm = dedup.JACCARD_MIN
    jacc = "floor(i.n_int * 10000.0 / (na.n + nb.n - i.n_int)) / 10000"
    return f"""
WITH {_AUG_CTE.strip().rstrip()},
sub AS (SELECT doc_id, text FROM aug WHERE doc_id % 4 = 0),
{_shingle_cte('sub')},
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
tcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
),
tinter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_int
  FROM tcand c
  JOIN sh s1 ON s1.doc_id = c.id_a
  JOIN sh s2 ON s2.doc_id = c.id_b AND s2.sh = s1.sh
  GROUP BY c.id_a, c.id_b
),
truth AS (
  SELECT i.id_a, i.id_b FROM tinter i
  JOIN sizes na ON na.doc_id = i.id_a
  JOIN sizes nb ON nb.doc_id = i.id_b
  WHERE {jacc} >= {jm}
),
msig AS (SELECT doc_id, {min_aggs} FROM sh GROUP BY doc_id),
mbands AS (
{band_selects}
),
mcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM mbands a JOIN mbands b
    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
),
minter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_int
  FROM mcand c
  JOIN sh s1 ON s1.doc_id = c.id_a
  JOIN sh s2 ON s2.doc_id = c.id_b AND s2.sh = s1.sh
  GROUP BY c.id_a, c.id_b
),
mh AS (
  SELECT i.id_a, i.id_b FROM minter i
  JOIN sizes na ON na.doc_id = i.id_a
  JOIN sizes nb ON nb.doc_id = i.id_b
  WHERE {jacc} >= {jm}
),
stoks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm WHERE t <> ''),
svals AS (SELECT doc_id, {v} AS v FROM stoks),
sbits AS (SELECT doc_id, {bit_aggs} FROM svals GROUP BY doc_id),
ssig AS (SELECT doc_id, cast({sim} as bigint) AS simhash FROM sbits),
sbands AS (
{sband_selects}
),
spairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM sbands a JOIN sbands b
    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
),
sh_pairs AS (
  SELECT id_a, id_b FROM spairs
  WHERE bit_count(xor(sim_a, sim_b)) <= {dedup.HAMMING_MAX}
),
s2vals AS (SELECT doc_id, {v2} AS v FROM stoks),
s2bits AS (SELECT doc_id, {bit_aggs} FROM s2vals GROUP BY doc_id),
s2sig AS (SELECT doc_id, cast({sim} as bigint) AS simhash FROM s2bits),
s2bands AS (
{s2band_selects}
),
s2pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM s2bands a JOIN s2bands b
    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
),
s2h_pairs AS (
  SELECT id_a, id_b FROM s2pairs
  WHERE bit_count(xor(sim_a, sim_b)) <= {dedup.HAMMING_MAX}
),
x2_pairs AS (
  SELECT id_a, id_b FROM sh_pairs
  UNION
  SELECT id_a, id_b FROM s2h_pairs
),
tstats AS (SELECT count(*) AS n_truth FROM truth)
SELECT 'minhash_lsh' AS method, n_truth,
       (SELECT count(*) FROM mh) AS n_found,
       (SELECT count(*) FROM truth t JOIN mh USING (id_a, id_b)) AS n_hits,
       floor((SELECT count(*) FROM truth t JOIN mh USING (id_a, id_b))
             / greatest(n_truth, 1) * 10000) / 10000 AS recall
FROM tstats
UNION ALL
SELECT 'simhash' AS method, n_truth,
       (SELECT count(*) FROM sh_pairs) AS n_found,
       (SELECT count(*) FROM truth t JOIN sh_pairs USING (id_a, id_b)) AS n_hits,
       floor((SELECT count(*) FROM truth t JOIN sh_pairs USING (id_a, id_b))
             / greatest(n_truth, 1) * 10000) / 10000 AS recall
FROM tstats
UNION ALL
SELECT 'simhash_x2' AS method, n_truth,
       (SELECT count(*) FROM x2_pairs) AS n_found,
       (SELECT count(*) FROM truth t JOIN x2_pairs USING (id_a, id_b)) AS n_hits,
       floor((SELECT count(*) FROM truth t JOIN x2_pairs USING (id_a, id_b))
             / greatest(n_truth, 1) * 10000) / 10000 AS recall
FROM tstats
"""


def _oracle_ngram_jaccard() -> str:
    """Twin of dedup.ngram_jaccard_pairs: m0-blocking + exact Jaccard."""
    min_aggs = _minhash_min_aggs()
    return f"""
WITH {_AUG_CTE.strip().rstrip()},
{_shingle_cte('aug')},
sig AS (SELECT doc_id, {min_aggs} FROM sh GROUP BY doc_id),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sig a JOIN sig b ON a.m0 = b.m0 AND a.doc_id < b.doc_id
),
{_INTER_SIZES_CTE}
SELECT i.id_a, i.id_b,
       floor(i.n_int * 10000.0 / (na.n + nb.n - i.n_int)) / 10000 AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.id_a
JOIN sizes nb ON nb.doc_id = i.id_b
WHERE floor(i.n_int * 10000.0 / (na.n + nb.n - i.n_int)) / 10000 >= 0.2
"""


def _oracle_embedding_cosine() -> str:
    """Twin of similarity.embedding_cosine_duplicates over emb_aug."""
    planes = similarity.hyperplanes()
    bucket_terms = " + ".join(
        f"(case when cast(list_dot_product(qe, {plane}) as bigint) > 0 then {2 ** k} else 0 end)"
        for k, plane in enumerate(planes)
    )
    ds = similarity.COSINE_DOWNSCALE
    return f"""
WITH {_EMB_AUG_CTE.strip().rstrip()},
q AS (
  SELECT vec_id,
         list_transform(embedding, x -> cast(round(x * {similarity.QUANT}) as bigint)) AS qe
  FROM emb_aug
),
vec AS (
  SELECT vec_id, qe,
         cast(list_dot_product(qe, qe) as bigint) AS sq,
         cast({bucket_terms} as bigint) AS bucket
  FROM q
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         cast(list_dot_product(a.qe, b.qe) as bigint) AS dot,
         a.sq AS sq_a, b.sq AS sq_b
  FROM vec a JOIN vec b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, dot, sq_a, sq_b
FROM pairs
WHERE dot > 0
  AND {similarity.COSINE_DEN} * ((dot // {ds}) * (dot // {ds}))
      >= {similarity.COSINE_NUM} * (sq_a // {ds}) * (sq_b // {ds})
"""


def _oracle_ann_lsh_topk() -> str:
    planes = similarity.hyperplanes()
    bucket_terms = " + ".join(
        f"(case when cast(list_dot_product(qe, {plane}) as bigint) > 0 then {2 ** k} else 0 end)"
        for k, plane in enumerate(planes)
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> cast(round(x * {similarity.QUANT}) as bigint)) AS qe
  FROM embeddings
),
vec AS (SELECT vec_id, qe, cast({bucket_terms} as bigint) AS bucket FROM q),
qs AS (
  SELECT vec_id AS query_id, qe AS qv, bucket AS qb
  FROM vec WHERE vec_id % {similarity.QUERY_MOD} = 0
),
pairs AS (
  SELECT query_id, vec_id AS neighbor_id,
         cast(list_dot_product(qv, qe) as bigint) AS dot
  FROM qs JOIN vec ON vec.bucket = qs.qb AND vec.vec_id <> qs.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, dot,
         row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, dot, rank FROM ranked WHERE rank <= {similarity.TOP_K}
"""


def _clustered_cte() -> str:
    """DuckDB twin of similarity.clustered_embeddings: same bigint
    center + truncating-div noise arithmetic (DuckDB // and Spark div
    both truncate toward zero — verified for negatives), 1-based lambda
    index aligned to Spark's 0-based via (i - 1)."""
    nc, step, nd, qq = (
        similarity.SYNTH_CLUSTERS,
        similarity.CENTER_STEP,
        similarity.NOISE_DIV,
        similarity.QUANT,
    )
    return f"""cl AS (
  SELECT vec_id,
         list_transform(embedding, (x, i) ->
           cast((((vec_id % {nc}) * 37 + (i - 1) * 101) % 13 - 6) * {step}
                + (cast(round(x * {qq}) as bigint) // {nd}) as double) / {qq}
         ) AS embedding
  FROM embeddings
)"""


def _oracle_ann_recall(source: str = "embeddings", prefix_cte: str = "") -> str:
    """Exact + LSH + IVF tiers as CTE blocks, then recall@k per method.
    Division order mirrors Spark's dtrunc(n_hits / n_exact, 4).
    ``source``/``prefix_cte`` let the clustered-corpus variant reuse the
    identical tier SQL over the derived table."""
    planes = similarity.hyperplanes()
    bucket_terms = " + ".join(
        f"(case when cast(list_dot_product(qe, {plane}) as bigint) > 0 then {2 ** k} else 0 end)"
        for k, plane in enumerate(planes)
    )
    k, qm, cm = similarity.TOP_K, similarity.QUERY_MOD, similarity.CENTROID_MOD
    return f"""
WITH {prefix_cte}q AS (
  SELECT vec_id,
         list_transform(embedding, x -> cast(round(x * {similarity.QUANT}) as bigint)) AS qe
  FROM {source}
),
vec AS (SELECT vec_id, qe, cast({bucket_terms} as bigint) AS bucket FROM q),
exq AS (SELECT vec_id AS query_id, qe AS qv FROM q WHERE vec_id % {qm} = 0),
expairs AS (
  SELECT query_id, vec_id AS neighbor_id,
         cast(list_dot_product(qv, qe) as bigint) AS dot
  FROM exq CROSS JOIN q WHERE vec_id <> query_id
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
    FROM expairs
  ) WHERE rank <= {k}
),
lqs AS (SELECT vec_id AS query_id, qe AS qv, bucket AS qb FROM vec WHERE vec_id % {qm} = 0),
lpairs AS (
  SELECT query_id, vec_id AS neighbor_id,
         cast(list_dot_product(qv, qe) as bigint) AS dot
  FROM lqs JOIN vec ON vec.bucket = lqs.qb AND vec.vec_id <> lqs.query_id
),
lsh AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
    FROM lpairs
  ) WHERE rank <= {k}
),
cent AS (SELECT vec_id AS cid, qe AS ce FROM q WHERE vec_id % {cm} = 1),
cscored AS (
  SELECT q.vec_id, q.qe, cent.cid,
         cast(list_dot_product(q.qe, cent.ce) as bigint) AS cdot
  FROM q CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, qe, cid FROM (
    SELECT vec_id, qe, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS r
    FROM cscored
  ) WHERE r = 1
),
iqs AS (SELECT vec_id AS query_id, qe AS qv, cid FROM assigned WHERE vec_id % {qm} = 0),
ipairs AS (
  SELECT iqs.query_id, a.vec_id AS neighbor_id,
         cast(list_dot_product(iqs.qv, a.qe) as bigint) AS dot
  FROM iqs JOIN assigned a ON a.cid = iqs.cid AND a.vec_id <> iqs.query_id
),
ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
    FROM ipairs
  ) WHERE rank <= {k}
),
ex_stats AS (
  SELECT count(DISTINCT query_id) AS n_queries, count(*) AS n_exact FROM exact
)
SELECT 'ivf' AS method, n_queries, n_exact,
       (SELECT count(*) FROM exact e JOIN ivf USING (query_id, neighbor_id)) AS n_hits,
       floor((SELECT count(*) FROM exact e JOIN ivf USING (query_id, neighbor_id))
             / n_exact * 10000) / 10000 AS recall
FROM ex_stats
UNION ALL
SELECT 'lsh' AS method, n_queries, n_exact,
       (SELECT count(*) FROM exact e JOIN lsh USING (query_id, neighbor_id)) AS n_hits,
       floor((SELECT count(*) FROM exact e JOIN lsh USING (query_id, neighbor_id))
             / n_exact * 10000) / 10000 AS recall
FROM ex_stats
"""


def _oracle_semdedup() -> str:
    """DuckDB twin of semdedup_prune over semdedup_corpus(clustered):
    the twin union, the frozen-lattice nearest-centroid assignment
    (dist = sq - 2*dot + |c|^2, same bigint value as Spark's zip_with
    (x-y)^2 fold), the cell-local epsilon-pairs with the downscaled
    integer cosine compare, and the farthest-from-centroid keeper rule."""
    nc = similarity.SYNTH_CLUSTERS
    qq = similarity.QUANT
    ds = similarity.COSINE_DOWNSCALE
    num, den = similarity.SEMDEDUP_NUM, similarity.SEMDEDUP_DEN
    tm, tr = similarity.TWIN_MOD, similarity.TWIN_RES
    toff, tstep = similarity.TWIN_OFFSET, similarity.TWIN_STEP
    cents = similarity.lattice_centroids()
    # key term per centroid: (sq - 2*dot(qe, c) + |c|^2) * nc + c
    key_terms = ", ".join(
        f"(sq - 2 * cast(list_dot_product(qe, {c}) as bigint)"
        f" + {sum(v * v for v in c)}) * {nc} + {j}"
        for j, c in enumerate(cents)
    )
    return f"""
WITH {_clustered_cte()},
tw AS (
  SELECT vec_id, embedding FROM cl
  UNION ALL
  SELECT vec_id + {toff} AS vec_id,
         list_transform(embedding, (x, j) ->
           cast(cast(round(x * {qq}) as bigint)
                + ((vec_id + (j - 1) * 7) % 13 - 6) * {tstep}
                as double) / {qq}) AS embedding
  FROM cl WHERE vec_id % {tm} = {tr}
),
q AS (
  SELECT vec_id,
         list_transform(embedding, x -> cast(round(x * {qq}) as bigint)) AS qe
  FROM tw
),
qs AS (SELECT vec_id, qe, cast(list_dot_product(qe, qe) as bigint) AS sq FROM q),
asg AS (SELECT vec_id, qe, least({key_terms}) AS key FROM qs),
vecs AS (
  SELECT vec_id, qe, cast(key % {nc} AS int) AS cluster,
         cast(key // {nc} AS bigint) AS dist
  FROM asg
),
p AS (
  SELECT a.vec_id AS vec_id, a.cluster AS cluster, a.dist AS dist,
         b.vec_id AS o_id, b.dist AS o_dist,
         cast(list_dot_product(a.qe, b.qe) as bigint) AS dot,
         cast(list_dot_product(a.qe, a.qe) as bigint) AS sq_a,
         cast(list_dot_product(b.qe, b.qe) as bigint) AS sq_b
  FROM vecs a JOIN vecs b
    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
),
e AS (
  SELECT * FROM p
  WHERE dot > 0
    AND {den} * ((dot // {ds}) * (dot // {ds}))
        >= {num} * (sq_a // {ds}) * (sq_b // {ds})
)
SELECT vec_id, cluster, dist, count(*) AS n_dup_partners
FROM e
GROUP BY vec_id, cluster, dist
HAVING max(CASE WHEN o_dist > dist OR (o_dist = dist AND o_id < vec_id)
           THEN 1 ELSE 0 END) = 1
ORDER BY vec_id
"""


def _oracle_simhash() -> str:
    sim = " + ".join(
        f"(case when b{b} > 0 then {2 ** b} else 0 end)"
        for b in range(dedup.SIMHASH_BITS)
    )
    return (
        _simhash_duck_sql("norm_src AS (SELECT doc_id, text FROM documents),", "norm_src")
        + f"SELECT doc_id, cast({sim} as bigint) AS simhash FROM bits"
    )


def _oracle_simhash_pairs() -> str:
    sim = " + ".join(
        f"(case when b{b} > 0 then {2 ** b} else 0 end)"
        for b in range(dedup.SIMHASH_BITS)
    )
    band_mod = 2 ** dedup.SIMHASH_BAND_BITS
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, simhash, {k} AS band, "
        f"(simhash // {band_mod ** k}) % {band_mod} AS bk FROM sig"
        for k in range(dedup.SIMHASH_BANDS)
    )
    return (
        _simhash_duck_sql(_AUG_CTE.strip().rstrip() + ",", "aug")
        + f""", sig AS (SELECT doc_id, cast({sim} as bigint) AS simhash FROM bits),
bands AS (
{band_selects}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(sim_a, sim_b)) AS hamming
FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= {dedup.HAMMING_MAX}
"""
    )


def _oracle_ann_lsh_bucket() -> str:
    planes = similarity.hyperplanes()
    bucket_terms = " + ".join(
        f"(case when cast(list_dot_product(qe, {plane}) as bigint) > 0 then {2 ** k} else 0 end)"
        for k, plane in enumerate(planes)
    )
    return f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> cast(round(x * {similarity.QUANT}) as bigint)) AS qe
  FROM embeddings
)
SELECT vec_id, cast({bucket_terms} as bigint) AS bucket FROM q
"""


def oracle_sql() -> dict[str, str]:
    aug = _AUG_CTE.strip().rstrip()
    return {
        "flagship_doc_stats": """
SELECT source, count(*) AS n_docs,
       floor(avg(n_chars) * 100) / 100 AS avg_chars,
       cast(sum(n_chars) AS bigint) AS total_chars, count(DISTINCT lang) AS n_langs
FROM documents GROUP BY source
""",
        "token_count": f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents)
SELECT doc_id, length(t) AS n_chars_norm,
       CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS n_ws_tokens,
       len(regexp_extract_all(t, '{_BPE_RE}')) AS n_bpe_tokens
FROM norm
""",
        "lang_id": f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
c AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '{_STOP_RE}')) AS n_stopwords,
         CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS n_ws_tokens
  FROM norm
)
SELECT doc_id, n_stopwords, n_ws_tokens,
       CASE WHEN n_stopwords * 10 >= n_ws_tokens THEN 'en' ELSE 'und' END AS pred_lang
FROM c
""",
        "lang_id_multi": _oracle_lang_id_multi(),
        "corpus_filter": _oracle_corpus_filter(),
        "vocab_topk": f"""
WITH norm AS (SELECT {_NORM_DUCK} AS t FROM documents),
toks AS (SELECT unnest(string_split(t, ' ')) AS token FROM norm WHERE t <> '')
SELECT token, count(*) AS n FROM toks GROUP BY token
ORDER BY n DESC, token LIMIT 100
""",
        "doc_sample": f"""
WITH b AS (
  SELECT doc_id, source, n_chars,
         {dedup.hex_to_bigint_sql("'sample-v1' || cast(doc_id as varchar)", 8)} % 100 AS bucket
  FROM documents
)
SELECT doc_id, source, n_chars FROM b WHERE bucket < 10
""",
        "domain_stats": """
WITH u AS (
  SELECT regexp_replace(
           regexp_extract('https://www.' || source || '.test/doc/' || doc_id,
                          '^[a-z]+://([^/]+)', 1),
           '^www\\.', '') AS domain,
         n_chars
  FROM documents
)
SELECT domain, count(*) AS n_docs,
       cast(sum(n_chars) as bigint) AS total_chars,
       floor(avg(n_chars) * 100) / 100 AS avg_chars
FROM u GROUP BY domain
""",
        "quality_score": f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
c AS (
  SELECT doc_id, length(t) AS n_chars_norm,
         CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS n_words,
         len(regexp_extract_all(t, '{_STOP_RE}')) AS n_stop,
         len(regexp_extract_all(t, '{_PUNCT_RE}')) AS n_punct
  FROM norm
),
d AS (
  SELECT doc_id, n_chars_norm, n_words, n_punct,
         floor((n_chars_norm * 1.0 / greatest(n_words, 1)) * 10000) / 10000 AS avg_word_len,
         floor((n_stop * 1.0 / greatest(n_words, 1)) * 10000) / 10000 AS stop_ratio
  FROM c
)
SELECT doc_id, n_chars_norm, n_words, n_punct, avg_word_len, stop_ratio,
       floor((least(1.0, n_words / 100.0) * 0.5 + stop_ratio * 0.3 +
              CASE WHEN avg_word_len >= 3 AND avg_word_len <= 8 THEN 0.2 ELSE 0.0 END)
             * 10000) / 10000 AS quality_score
FROM d
""",
        "doc_fingerprint": f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents)
SELECT doc_id, md5(t) AS fp, md5(substr(t, 1, 64)) AS fp_head,
       length(t) AS n_chars_norm
FROM norm
""",
        "doc_rolling_fingerprint": f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
doc_hash AS (
  SELECT doc_id,
         list_reduce(list_prepend(0::BIGINT,
                     list_transform(string_split(t, ''), c -> ascii(c)::BIGINT)),
                     (acc, x) -> (acc * {_ROLL_BASE} + x) % {_ROLL_MOD}) AS rolling_fp
  FROM norm
),
toks AS (SELECT doc_id, string_split(t, ' ') AS ts FROM norm WHERE t <> ''),
sh AS (
  SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS sh
  FROM toks, LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i) r
  WHERE len(ts) >= 3
),
sh_hash AS (
  SELECT doc_id,
         min(list_reduce(list_prepend(0::BIGINT,
             list_transform(string_split(sh, ''), c -> ascii(c)::BIGINT)),
             (acc, x) -> (acc * {_ROLL_BASE} + x) % {_ROLL_MOD})) AS min_shingle_fp
  FROM sh GROUP BY doc_id
)
SELECT d.doc_id, d.rolling_fp, s.min_shingle_fp
FROM doc_hash d JOIN sh_hash s ON s.doc_id = d.doc_id
""",
        "lang_stratified_sample": """
WITH keyed AS (
  SELECT doc_id, lang, source,
         md5('stratify-v1|' || doc_id) AS sort_key
  FROM documents
),
ranked AS (
  SELECT *, cast(row_number() OVER (
      PARTITION BY lang ORDER BY sort_key, doc_id) AS int) AS rank
  FROM keyed
)
SELECT doc_id, lang, source, sort_key, rank FROM ranked WHERE rank <= 15
""",
        "domain_quota_sample": """
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         md5('domcap-v1|' || doc_id) AS sort_key
  FROM documents
),
ranked AS (
  SELECT *, cast(row_number() OVER (
      PARTITION BY source ORDER BY sort_key, doc_id) AS int) AS rank
  FROM keyed
)
SELECT doc_id, source, n_chars, sort_key, rank FROM ranked WHERE rank <= 10
""",
        "repetition_signals": f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
toks AS (SELECT doc_id, t, string_split(t, ' ') AS ts FROM norm WHERE t <> ''),
g2 AS (
  SELECT doc_id, length(t) AS n_chars_norm,
         unnest(list_transform(range(1, len(ts)),
                               i -> ts[i] || ' ' || ts[i+1])) AS gram
  FROM toks WHERE len(ts) >= 2
),
c2 AS (SELECT doc_id, n_chars_norm, gram, count(*) AS cnt
       FROM g2 GROUP BY 1, 2, 3),
top2 AS (
  SELECT doc_id, gram AS top_2gram,
         floor(cnt * length(gram) / n_chars_norm * 10000) / 10000
           AS top_2gram_char_frac
  FROM c2
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram) = 1
),
g3 AS (
  SELECT doc_id, length(t) AS n_chars_norm,
         unnest(list_transform(range(1, len(ts) - 1),
                               i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
           AS gram
  FROM toks WHERE len(ts) >= 3
),
c3 AS (SELECT doc_id, n_chars_norm, gram, count(*) AS cnt
       FROM g3 GROUP BY 1, 2, 3),
dup3 AS (
  SELECT doc_id,
         floor(cast(sum(cnt * length(gram)) AS bigint)
               / n_chars_norm * 10000) / 10000 AS dup_3gram_char_frac
  FROM c3 WHERE cnt > 1 GROUP BY doc_id, n_chars_norm
)
SELECT d.doc_id,
       coalesce(top_2gram, '') AS top_2gram,
       coalesce(top_2gram_char_frac, 0.0) AS top_2gram_char_frac,
       coalesce(dup_3gram_char_frac, 0.0) AS dup_3gram_char_frac
FROM documents d
LEFT JOIN top2 USING (doc_id)
LEFT JOIN dup3 USING (doc_id)
""",
        # corpus_length_report_hist retired from the registry in round 7
        # (its oracle was this identical SQL — a duplicate driver row);
        # the histogram-mode operator + its bit-identity property tests
        # remain in force (tests/test_properties.py).
        "corpus_length_report": _LENGTH_REPORT_SQL,
        "duplicate_spans": f"""
WITH {{aug}},
norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM aug),
toks AS (SELECT doc_id, string_split(t, ' ') AS ts FROM norm WHERE t <> ''),
big AS (SELECT doc_id, ts FROM toks WHERE len(ts) >= 20),
grams AS (
  SELECT doc_id, cast(i AS int) AS start_tok,
         md5(array_to_string(list_slice(ts, i + 1, i + 20), ' ')) AS span_hash
  FROM big, LATERAL (SELECT unnest(range(0, len(ts) - 20 + 1)) AS i) r
),
hot AS (
  SELECT span_hash FROM grams GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
)
SELECT g.doc_id, g.start_tok, g.span_hash
FROM grams g JOIN hot USING (span_hash)
""".replace("{aug}", aug),
        "dedup_spans_apply": f"""
WITH {{aug}},
norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM aug),
toks AS (SELECT doc_id, string_split(t, ' ') AS ts FROM norm WHERE t <> ''),
big AS (SELECT doc_id, ts FROM toks WHERE len(ts) >= 20),
grams AS (
  SELECT doc_id, cast(i AS int) AS start_tok,
         md5(array_to_string(list_slice(ts, i + 1, i + 20), ' ')) AS span_hash
  FROM big, LATERAL (SELECT unnest(range(0, len(ts) - 20 + 1)) AS i) r
),
hot AS (
  SELECT span_hash FROM grams GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
),
spans AS (SELECT g.* FROM grams g JOIN hot USING (span_hash)),
keeper AS (SELECT span_hash, min(doc_id) AS keep_doc FROM spans GROUP BY 1),
drops AS (
  SELECT s.doc_id, s.start_tok FROM spans s JOIN keeper USING (span_hash)
  WHERE s.doc_id <> keeper.keep_doc
),
cover AS (
  SELECT DISTINCT doc_id, start_tok + unnest(range(0, 20)) AS pos FROM drops
),
tokpos AS (
  SELECT tk.doc_id, generate_subscripts(tk.ts, 1) - 1 AS pos, unnest(tk.ts) AS tok
  FROM toks tk JOIN (SELECT DISTINCT doc_id FROM cover) td USING (doc_id)
),
kept AS (
  SELECT tp.doc_id, tp.pos, tp.tok
  FROM tokpos tp LEFT JOIN cover c ON tp.doc_id = c.doc_id AND tp.pos = c.pos
  WHERE c.doc_id IS NULL
),
reb AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS _text,
         count(*) AS _n_kept
  FROM kept GROUP BY doc_id
),
nd AS (SELECT doc_id, count(*) AS _n_dropped FROM cover GROUP BY doc_id)
SELECT n.doc_id,
       CASE WHEN nd._n_dropped IS NOT NULL THEN coalesce(reb._text, '')
            ELSE n.t END AS text,
       cast(CASE WHEN nd._n_dropped IS NOT NULL THEN coalesce(reb._n_kept, 0)
                 ELSE CASE WHEN n.t = '' THEN 0
                      ELSE len(string_split(n.t, ' ')) END
            END AS bigint) AS n_kept,
       cast(coalesce(nd._n_dropped, 0) AS bigint) AS n_dropped
FROM norm n
LEFT JOIN reb USING (doc_id)
LEFT JOIN nd USING (doc_id)
""".replace("{aug}", aug),
        "decontaminate": f"""
WITH {{aug}},
{_shingle_cte('aug')},
eval_sh AS (
  SELECT DISTINCT doc_id AS eval_id, sh FROM sh WHERE doc_id % 97 = 0
),
train_sh AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0)
SELECT t.doc_id, count(DISTINCT t.sh) AS n_hits,
       count(DISTINCT e.eval_id) AS n_eval_docs
FROM train_sh t JOIN eval_sh e USING (sh)
GROUP BY t.doc_id HAVING count(DISTINCT t.sh) >= 2
""".replace("{aug}", aug),
        "eval_contamination_report": f"""
WITH {{aug}},
{_shingle_cte('aug')},
eval_sh AS (
  SELECT DISTINCT doc_id AS eval_id, sh FROM sh WHERE doc_id % 97 = 0
),
train_sh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 <> 0),
totals AS (
  SELECT i.eval_id, coalesce(c.n_shingles, 0) AS n_shingles
  FROM (SELECT DISTINCT doc_id AS eval_id FROM aug WHERE doc_id % 97 = 0) i
  LEFT JOIN (
    SELECT eval_id, count(*) AS n_shingles FROM eval_sh GROUP BY 1
  ) c USING (eval_id)
),
hits AS (
  SELECT e.eval_id, count(DISTINCT e.sh) AS n_hit
  FROM eval_sh e JOIN train_sh t USING (sh)
  GROUP BY 1
)
SELECT t.eval_id, t.n_shingles,
       coalesce(h.n_hit, 0) AS n_hit,
       CASE WHEN t.n_shingles = 0 THEN 0.0
            ELSE floor(coalesce(h.n_hit, 0) * 1.0 / t.n_shingles * 10000)
                 / 10000 END AS overlap_frac,
       t.n_shingles > 0
         AND coalesce(h.n_hit, 0) * 10000 >= 1000 * t.n_shingles
         AS is_dirty
FROM totals t LEFT JOIN hits h USING (eval_id)
""".replace("{aug}", aug),
        "lsh_bucket_audit": f"""
WITH {{aug}},
{_shingle_cte('aug')},
sig AS (SELECT doc_id, {_minhash_min_aggs()} FROM sh GROUP BY doc_id),
bands AS (
{_minhash_band_selects()}
),
buckets AS (SELECT band, bk, count(*) AS k FROM bands GROUP BY 1, 2)
SELECT band,
       cast(sum(k) AS bigint) AS n_docs,
       count(*) AS n_buckets,
       cast(max(k) AS bigint) AS max_bucket,
       cast(sum(k * (k - 1) // 2) AS bigint)
         AS n_pairs_uncapped,
       cast(sum(CASE WHEN k > 100 THEN 1 ELSE 0 END) AS bigint)
         AS n_buckets_over_cap,
       cast(sum(CASE WHEN k > 100 THEN k ELSE 0 END) AS bigint)
         AS n_docs_over_cap,
       cast(sum(CASE WHEN k > 100 THEN 0
           ELSE k * (k - 1) // 2 END) AS bigint)
         AS n_pairs_capped
FROM buckets GROUP BY band
""".replace("{aug}", aug),
        "doc_novelty": f"""
WITH {{aug}},
{_shingle_cte('aug')},
first_seen AS (SELECT sh, min(doc_id) AS first_id FROM sh GROUP BY 1)
SELECT s.doc_id,
       count(*) AS n_shingles,
       cast(sum(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END) AS bigint)
         AS n_novel,
       floor(sum(CASE WHEN f.first_id = s.doc_id THEN 1 ELSE 0 END)
             * 1.0 / count(*) * 10000) / 10000 AS novelty_frac
FROM sh s JOIN first_seen f USING (sh)
GROUP BY s.doc_id
""".replace("{aug}", aug),
        "doc_chunks": f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
sp AS (SELECT doc_id, string_split(t, ' ') AS ts FROM norm WHERE t <> ''),
idx AS (
  SELECT doc_id, ts,
         unnest(range(0, greatest((len(ts) - 8 - 1) // 32 + 1, 1))) AS ci
  FROM sp
)
SELECT doc_id, cast(ci AS int) AS chunk_idx,
       array_to_string(list_slice(ts, ci * 32 + 1, ci * 32 + 40), ' ')
         AS chunk_text,
       cast(len(list_slice(ts, ci * 32 + 1, ci * 32 + 40)) AS int) AS n_tokens
FROM idx
""",
        "corpus_dedup_apply": f"""
WITH RECURSIVE {aug},
mh_pairs AS (
  SELECT id_a, id_b FROM ({_oracle_minhash().strip()}) mh
),
sym AS (
  SELECT id_a, id_b FROM mh_pairs
  UNION
  SELECT id_b AS id_a, id_a AS id_b FROM mh_pairs
),
walk(doc_id, comp) AS (
  SELECT DISTINCT id_a AS doc_id, id_a AS comp FROM sym
  UNION
  SELECT s.id_a AS doc_id, w.comp
  FROM sym s JOIN walk w ON w.doc_id = s.id_b
),
components AS (
  SELECT doc_id, min(comp) AS component_id FROM walk GROUP BY doc_id
)
SELECT a.doc_id, length(a.text) AS n_chars
FROM aug a
WHERE a.doc_id NOT IN (
  SELECT doc_id FROM components WHERE doc_id <> component_id
)
""",
        "pipeline_kept_corpus": _oracle_pipeline_kept_corpus(),
        "embedding_kmeans": _oracle_kmeans(),
        "events_retention": """
WITH e AS (
  SELECT user_id, cast(floor(floor(epoch(ts)) / 604800) AS bigint) AS week
  FROM events
),
f AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1),
a AS (
  SELECT DISTINCT e.user_id, f.cohort_week, e.week - f.cohort_week AS week_offset
  FROM e JOIN f USING (user_id)
),
r AS (
  SELECT cohort_week, week_offset, count(*) AS n_users FROM a GROUP BY 1, 2
),
cs AS (SELECT cohort_week, count(*) AS cohort_size FROM f GROUP BY 1)
SELECT r.cohort_week, r.week_offset, r.n_users, cs.cohort_size
FROM r JOIN cs USING (cohort_week)
""",
        "gopher_quality": f"""
WITH gdocs AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 4 = 0
                 THEN chr(10) || '- bullet one' || chr(10) || '- bullet two'
                 ELSE '' END
         || CASE WHEN doc_id % 6 = 0
                 THEN chr(10) || 'repeated line' || chr(10) || 'repeated line'
                 ELSE '' END AS text
  FROM documents
),
sig AS (
  SELECT doc_id,
         {_NORM_DUCK} AS t,
         string_split(text, chr(10)) AS lines
  FROM gdocs
),
m AS (
  SELECT doc_id,
         CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS n_words,
         length(regexp_replace(t, ' ', '', 'g')) AS n_word_chars,
         length(t) - length(regexp_replace(t, '#', '', 'g'))
           + len(regexp_extract_all(t, '\\.\\.\\.')) AS n_symbols,
         len(lines) AS n_lines,
         len(list_filter(lines, l -> regexp_matches(l, '^[ \t]*[-*•]'))) AS n_bullets,
         len(lines) - len(list_distinct(lines)) AS n_dup_lines
  FROM sig
),
r AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words = 0 THEN 0e0
              ELSE floor(n_word_chars / n_words * 10000) / 10000 END AS mean_word_len,
         CASE WHEN n_words = 0 THEN 0e0
              ELSE floor(n_symbols / n_words * 10000) / 10000 END AS symbol_word_ratio,
         floor(n_bullets / n_lines * 10000) / 10000 AS bullet_line_ratio,
         floor(n_dup_lines / n_lines * 10000) / 10000 AS dup_line_ratio
  FROM m
)
SELECT *,
       (mean_word_len >= 3.0e0 AND mean_word_len <= 10.0e0
        AND symbol_word_ratio <= 0.1e0
        AND bullet_line_ratio <= 0.9e0
        AND dup_line_ratio <= 0.3e0) AS keep
FROM r
""",
        "tfidf_top_terms": f"""
WITH norm AS (SELECT source, {_NORM_DUCK} AS t FROM documents WHERE {_NORM_DUCK} <> ''),
words AS (SELECT source, unnest(string_split(t, ' ')) AS term FROM norm),
tf AS (
  SELECT source, term, count(*) AS tf FROM words WHERE term <> '' GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
ns AS (SELECT count(DISTINCT source) AS n FROM tf),
scored AS (
  SELECT tf.source, tf.term, tf.tf, dfreq.df,
         tf.tf * ((ns.n * 10000) // dfreq.df) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN ns
),
ranked AS (
  SELECT *, cast(row_number() OVER (
      PARTITION BY source ORDER BY score DESC, term) AS int) AS rank
  FROM scored
)
SELECT source, term, tf, df, score, rank FROM ranked WHERE rank <= 5
""",
        "paragraph_dedup": """
WITH pdocs AS (
  SELECT doc_id,
         'cookie banner for ' || source || ' accept all' || chr(10) || chr(10)
         || CASE WHEN doc_id % 25 = 0 THEN '' ELSE text END
         || chr(10) || chr(10) || 'site footer ' || source
         || ' all rights reserved' AS text
  FROM documents
),
sp AS (SELECT doc_id, string_split(text, chr(10)||chr(10)) AS ps FROM pdocs),
paras AS (
  SELECT doc_id, unnest(ps) AS para, generate_subscripts(ps, 1) AS idx FROM sp
),
paras2 AS (SELECT * FROM paras WHERE trim(para) <> ''),
freq AS (
  SELECT md5(para) AS ph FROM paras2
  GROUP BY 1 HAVING count(DISTINCT doc_id) > 10
),
kept AS (SELECT * FROM paras2 WHERE md5(para) NOT IN (SELECT ph FROM freq)),
rej AS (
  SELECT doc_id, string_agg(para, chr(10)||chr(10) ORDER BY idx) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n_paras FROM paras2 GROUP BY doc_id)
SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
       cast(coalesce(r.n_kept, 0) AS int) AS n_kept,
       cast(t.n_paras - coalesce(r.n_kept, 0) AS int) AS n_dropped
FROM tot t LEFT JOIN rej r USING (doc_id)
""",
        "url_canonical_dedup": """
WITH urls AS (
  SELECT doc_id,
         'https://www.' || source || '.example.com/page/' || (doc_id % 40)
         || '?utm_source=feed&id=' || (doc_id % 7)
         || '&utm_campaign=x#sec' || (doc_id % 3) AS url
  FROM documents
),
c0 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS raw FROM urls),
ch AS (
  SELECT doc_id, raw,
         regexp_extract(raw, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*') AS pre
  FROM c0
),
cl AS (
  SELECT doc_id,
         regexp_replace(lower(pre), '://www\\.', '://')
           || substr(raw, length(pre) + 1) AS c
  FROM ch
),
c1 AS (
  SELECT doc_id,
         regexp_replace(split_part(c, '?', 1), '/$', '') AS base,
         CASE WHEN contains(c, '?') THEN substr(c, instr(c, '?') + 1)
              ELSE '' END AS q
  FROM cl
),
c2 AS (
  SELECT doc_id, base,
         array_to_string(
           list_filter(string_split(q, '&'),
             p -> p <> '' AND NOT regexp_matches(p, '(?i)^(utm_[a-z]+|fbclid|gclid)=')),
           '&') AS newq
  FROM c1
),
canon AS (
  SELECT doc_id,
         CASE WHEN newq = '' THEN base ELSE base || '?' || newq END
           AS canonical_url
  FROM c2
)
SELECT canonical_url, count(*) AS n_dups, min(doc_id) AS keep_doc_id
FROM canon GROUP BY canonical_url HAVING count(*) > 1
""",
        "pii_redact": f"""
WITH pdocs AS (
  SELECT doc_id,
         text || ' contact user' || (doc_id % 50) || '@mail.' || source || '.com'
         || CASE WHEN doc_id % 3 = 0
                 THEN ' or call 555-123-'
                      || lpad(cast(doc_id % 10000 AS varchar), 4, '0')
                 ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(text, '{scrub.EMAIL_RE}', '<EMAIL>', 'g'),
                      '{scrub.PHONE_RE}', '<PHONE>', 'g') AS redacted,
       cast(len(regexp_extract_all(text, '{scrub.EMAIL_RE}')) AS int) AS n_emails,
       cast(len(regexp_extract_all(text, '{scrub.PHONE_RE}')) AS int) AS n_phones
FROM pdocs
""",
        "dedup_exact": f"""
WITH {aug},
fps AS (SELECT doc_id, md5({_NORM_DUCK}) AS fp FROM aug)
SELECT fp, count(*) AS n_dups, min(doc_id) AS keep_doc_id
FROM fps GROUP BY fp HAVING count(*) > 1
""",
        "dedup_minhash_lsh": _oracle_minhash(),
        "dedup_recall_report": _oracle_dedup_recall(),
        "sequence_pack": f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
toks AS (
  SELECT doc_id,
         cast(CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END
              AS bigint) AS n_tokens
  FROM norm
),
sharded AS (
  SELECT doc_id, n_tokens,
         cast({dedup.hex_to_bigint_sql("'pack-v1' || cast(doc_id as varchar)", 8)} % 8 AS int) AS shard,
         md5('pack-v1' || cast(doc_id as varchar)) AS sort_key
  FROM toks WHERE n_tokens > 0
),
cum AS (
  SELECT doc_id, shard, n_tokens,
         cast(sum(n_tokens) OVER (PARTITION BY shard
              ORDER BY sort_key, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS bigint) AS e
  FROM sharded
)
SELECT doc_id, shard, n_tokens, e - n_tokens AS start_tok,
       (e - n_tokens) // 2048 AS pack_first,
       (e - 1) // 2048 AS pack_last,
       cast((e - 1) // 2048 - (e - n_tokens) // 2048 + 1 AS int) AS n_packs
FROM cum
""",
        "token_count_subword": f"""
WITH RECURSIVE norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
occs0 AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS word0
  FROM norm WHERE t <> ''
),
occs AS (
  SELECT doc_id,
         substring(word0, 1, {textstats.SUBWORD_MAX_WORD_CHARS}) AS word
  FROM occs0
),
per_word AS (
  SELECT doc_id, word, count(*) AS cnt FROM occs GROUP BY 1, 2
),
vocab AS (SELECT DISTINCT word FROM per_word),
{textstats.subword_segment_sql('vocab')},
per_doc AS (
  SELECT pw.doc_id,
         cast(sum(pw.cnt * p.n_pieces) AS bigint) AS n_subword_tokens
  FROM per_word pw JOIN pieces p USING (word)
  GROUP BY 1
)
SELECT n.doc_id,
       cast(CASE WHEN n.t = '' THEN 0
            ELSE len(string_split(n.t, ' ')) END AS bigint) AS n_ws_tokens,
       cast(coalesce(d.n_subword_tokens, 0) AS bigint) AS n_subword_tokens
FROM norm n LEFT JOIN per_doc d USING (doc_id)
""",
        "sequence_pack_rows": f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
toks AS (
  SELECT doc_id, t,
         cast(CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END
              AS bigint) AS n_tokens
  FROM norm
),
sharded AS (
  SELECT doc_id, t, n_tokens,
         cast({dedup.hex_to_bigint_sql("'pack-v1' || cast(doc_id as varchar)", 8)} % 8 AS int) AS shard,
         md5('pack-v1' || cast(doc_id as varchar)) AS sort_key
  FROM toks WHERE n_tokens > 0
),
cum AS (
  SELECT doc_id, t, shard, n_tokens,
         cast(sum(n_tokens) OVER (PARTITION BY shard
              ORDER BY sort_key, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS bigint) AS e
  FROM sharded
),
placed AS (
  SELECT doc_id, shard,
         (e - n_tokens) + generate_subscripts(string_split(t, ' '), 1) - 1
             AS gpos,
         unnest(string_split(t, ' ')) AS tok
  FROM cum
),
packs AS (
  SELECT shard, gpos // 64 AS pack_id,
         cast(count(*) AS bigint) AS n_tokens,
         cast(count(DISTINCT doc_id) AS bigint) AS n_docs,
         string_agg(tok, ' ' ORDER BY gpos) AS text
  FROM placed GROUP BY 1, 2
)
SELECT shard, pack_id, n_docs, n_tokens, text
FROM packs WHERE n_tokens = 64
""",
        "quality_classifier_eval": f"""
WITH corpus AS (
  SELECT doc_id,
         text || ' ' || CASE WHEN doc_id % 2 = 0
           THEN '{curation.NBQ_POS_MARKERS}'
           ELSE '{curation.NBQ_NEG_MARKERS}' END AS text,
         (doc_id % 2 = 0 AND doc_id % 5 = 0) AS is_pos
  FROM documents
),
norm AS (SELECT doc_id, is_pos, {_NORM_DUCK} AS t FROM corpus),
{_nbq_chain()},
ev AS (
  SELECT doc_id, score >= 0 AS pred, (doc_id % 2 = 0) AS truth FROM scores
),
cm AS (
  SELECT cast(count(*) AS bigint) AS n_docs,
         cast(coalesce(sum(CASE WHEN pred AND truth THEN 1 ELSE 0 END), 0) AS bigint) AS tp,
         cast(coalesce(sum(CASE WHEN pred AND NOT truth THEN 1 ELSE 0 END), 0) AS bigint) AS fp,
         cast(coalesce(sum(CASE WHEN NOT pred AND truth THEN 1 ELSE 0 END), 0) AS bigint) AS fn,
         cast(coalesce(sum(CASE WHEN NOT pred AND NOT truth THEN 1 ELSE 0 END), 0) AS bigint) AS tn
  FROM ev
)
SELECT n_docs, tp, fp, fn, tn,
       (tp * 10000) // greatest(tp + fp, 1) AS precision_x10000,
       (tp * 10000) // greatest(tp + fn, 1) AS recall_x10000
FROM cm
""",
        "bm25_topk": _oracle_bm25(),
        "unicode_normalize": _oracle_unicode_normalize(),
        "outlink_summary": _oracle_outlink_summary(),
        "curation_funnel": _oracle_curation_funnel(),
        "snapshot_term_drift": _oracle_snapshot_term_drift(),
        "script_profile": _oracle_script_profile(),
        "mixture_plan": _oracle_mixture_plan(),
        "fixture_match_report": _oracle_fixture_match_report(),
        "bpe_induce": _oracle_bpe_induce(),
        "table_profile": "\nUNION ALL\n".join(
            f"""SELECT '{c}' AS col_name, cast(count(*) AS bigint) AS n_rows,
  cast(count({c}) AS bigint) AS n_nonnull,
  cast(count(DISTINCT {c}) AS bigint) AS n_distinct,
  cast(min({c}) AS varchar) AS min_val, cast(max({c}) AS varchar) AS max_val
FROM orders"""
            for c in PROFILE_ORDERS_COLS
        ),
        "output_shard_plan": f"""
WITH k AS (
  SELECT doc_id, cast(n_chars AS bigint) AS b,
         cast({dedup.hex_to_bigint_sql("'shard-v1' || cast(doc_id AS varchar)")} % {curation.SHARD_PLAN_WRITERS} AS int) AS writer,
         md5('shard-v1' || cast(doc_id AS varchar)) AS key
  FROM documents
),
c AS (
  SELECT writer, b,
         coalesce(sum(b) OVER (PARTITION BY writer ORDER BY key, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
  FROM k
)
SELECT writer, cast(cumb // {curation.SHARD_PLAN_TARGET_BYTES} AS bigint) AS file_seq,
       cast(count(*) AS bigint) AS n_docs,
       cast(sum(b) AS bigint) AS file_bytes
FROM c GROUP BY 1, 2
""",
        "domain_blocklist": f"""
WITH hosts AS (
  SELECT doc_id,
         concat('sub', doc_id % 7, '.site', doc_id % 97, '.',
           CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                ELSE 'net' END) AS host
  FROM documents
),
rules AS (
  SELECT * FROM (VALUES {", ".join(f"('{r}')" for r in BLOCKLIST)}) AS t(rule)
),
sfx AS (
  SELECT doc_id,
         unnest(list_transform(range(0, len(parts)),
           i -> array_to_string(list_slice(parts, i + 1, len(parts)), '.'))) AS sfx
  FROM (SELECT doc_id, string_split(host, '.') AS parts FROM hosts)
),
hits AS (
  SELECT doc_id,
         substr(max(lpad(cast(length(rule) AS varchar), 4, '0') || ':' || rule), 6)
           AS blocked_by
  FROM sfx JOIN rules ON sfx.sfx = rules.rule GROUP BY 1
)
SELECT h.doc_id, h.host, hits.blocked_by
FROM hosts h LEFT JOIN hits USING (doc_id)
""",
        "inverted_index": f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
words AS (
  SELECT doc_id, unnest(string_split(t, ' ')) AS term
  FROM norm WHERE t <> ''
),
tf AS (
  SELECT doc_id, term, count(*) AS c
  FROM words WHERE term <> '' GROUP BY 1, 2
),
r AS (
  SELECT doc_id, term, c,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
  FROM tf
)
SELECT term, cast(count(*) AS bigint) AS df, cast(sum(c) AS bigint) AS cf,
       coalesce(string_agg(
         CASE WHEN rn <= 10 THEN cast(doc_id AS varchar) END,
         ',' ORDER BY doc_id), '') AS posting
FROM r GROUP BY term
""",
        "quality_classifier": f"""
WITH norm AS (
  SELECT doc_id, source IN ('src0', 'src1') AS is_pos, {_NORM_DUCK} AS t
  FROM documents
),
{_nbq_chain()}
SELECT doc_id, n_terms, score,
       CASE WHEN score >= 0 THEN 'high' ELSE 'low' END AS quality
FROM scores
""",
        "dsir_select": f"""
WITH norm AS (
  SELECT doc_id, source = 'src0' AS is_target, {_NORM_DUCK} AS t
  FROM documents
),
words AS (
  SELECT doc_id, is_target, unnest(string_split(t, ' ')) AS term
  FROM norm WHERE t <> ''
),
feat AS (
  SELECT doc_id, is_target,
         cast({dedup.hex_to_bigint_sql("'dsir-v1' || term", 8)} % 256 AS int) AS bucket,
         count(*) AS cnt
  FROM words WHERE term <> '' GROUP BY 1, 2, 3
),
dist AS (
  SELECT bucket,
         cast(sum(CASE WHEN is_target THEN cnt ELSE 0 END) AS bigint) AS ct,
         cast(sum(CASE WHEN NOT is_target THEN cnt ELSE 0 END) AS bigint) AS cr
  FROM feat GROUP BY 1
),
ratios AS (SELECT bucket, ((ct + 1) * 10000) // (cr + 1) AS r FROM dist),
scores AS (
  SELECT f.doc_id, cast(sum(f.cnt * r.r) AS bigint) AS score
  FROM feat f JOIN ratios r USING (bucket)
  WHERE NOT f.is_target GROUP BY 1
)
SELECT doc_id, score FROM scores ORDER BY score DESC, doc_id LIMIT 50
""",
        "temperature_sample": """
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
i AS (
  SELECT lang, n_docs,
         cast(floor(sqrt(cast(n_docs as double))) as bigint) AS isq
  FROM c
),
t AS (SELECT cast(sum(isq) AS bigint) AS s FROM i),
q AS (
  SELECT lang, n_docs, (150 * isq) // s AS quota FROM i CROSS JOIN t
),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('temp-v1' || cast(doc_id as varchar)), doc_id
         ) AS samp_rank
  FROM documents
)
SELECT r.doc_id, r.lang, q.n_docs, q.quota, r.samp_rank
FROM r JOIN q USING (lang)
WHERE samp_rank <= quota
ORDER BY doc_id
""",
        "training_set_assembly": f"""
WITH norm AS (SELECT doc_id, lang, {_NORM_DUCK} AS t FROM documents),
toks AS (
  SELECT doc_id, lang, md5(t) AS fp,
         cast(CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END
              AS bigint) AS n_tokens
  FROM norm
),
keep AS (SELECT fp, min(doc_id) AS doc_id FROM toks GROUP BY fp),
kept AS (SELECT t.* FROM toks t JOIN keep USING (fp, doc_id)),
gated AS (SELECT * FROM kept WHERE n_tokens >= 10),
c AS (SELECT lang, count(*) AS n_docs FROM gated GROUP BY lang),
i AS (
  SELECT lang, n_docs,
         cast(floor(sqrt(cast(n_docs as double))) as bigint) AS isq
  FROM c
),
tt AS (SELECT cast(sum(isq) AS bigint) AS s FROM i),
q AS (SELECT lang, (200 * isq) // s AS quota FROM i CROSS JOIN tt),
r AS (
  SELECT doc_id, lang, n_tokens,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('temp-v1' || cast(doc_id as varchar)), doc_id
         ) AS samp_rank
  FROM gated
),
sampled AS (SELECT r.* FROM r JOIN q USING (lang) WHERE samp_rank <= quota),
sharded AS (
  SELECT doc_id, lang, n_tokens,
         cast({dedup.hex_to_bigint_sql("'pack-v1' || cast(doc_id as varchar)", 8)} % 8 AS int) AS shard,
         md5('pack-v1' || cast(doc_id as varchar)) AS sort_key
  FROM sampled WHERE n_tokens > 0
),
cum AS (
  SELECT doc_id, lang, shard, n_tokens,
         cast(sum(n_tokens) OVER (PARTITION BY shard
              ORDER BY sort_key, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS bigint) AS e
  FROM sharded
)
SELECT doc_id, lang, shard, n_tokens, e - n_tokens AS start_tok,
       (e - n_tokens) // 512 AS pack_first,
       (e - 1) // 512 AS pack_last,
       cast((e - 1) // 512 - (e - n_tokens) // 512 + 1 AS int) AS n_packs
FROM cum
ORDER BY doc_id
""",
        "bigram_surprisal": f"""
WITH norm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM documents),
toks AS (
  SELECT doc_id, string_split(t, ' ') AS ts FROM norm WHERE t <> ''
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)),
                               i -> ts[i] || ' ' || ts[i+1])) AS bg
  FROM toks WHERE len(ts) >= 2
),
c12 AS (SELECT bg, count(*) AS c12 FROM bg GROUP BY 1),
c1 AS (
  SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c1 FROM bg GROUP BY 1
),
sc AS (
  SELECT b.doc_id,
         cast(length(bin(c1.c1 // c12.c12)) AS bigint) AS bits
  FROM bg b
  JOIN c12 USING (bg)
  JOIN c1 ON split_part(b.bg, ' ', 1) = c1.w1
)
SELECT doc_id, count(*) AS n_bigrams,
       cast((1000 * sum(bits)) // count(*) AS bigint) AS bits_x1000
FROM sc GROUP BY 1
""",
        "warc_roundtrip": _oracle_warc_roundtrip(),
        "host_pagerank": graph.host_pagerank_oracle_sql(),
        "c4_line_filter": f"""
WITH ws AS (SELECT doc_id, string_split({_NORM_DUCK}, ' ') AS ws FROM documents),
lines AS (
  SELECT doc_id, j,
    CASE WHEN doc_id % 97 = 0 AND j = 0
           THEN 'lorem ipsum dolor sit amet consectetur adipiscing elit.'
         WHEN doc_id % 89 = 0 AND j = 1
           THEN 'function init() {{ return window.state; }}'
         ELSE concat(
           CASE WHEN (doc_id*11 + j*5) % 11 = 0 THEN 'javascript ' ELSE '' END,
           array_to_string(list_slice(ws, j*8 + 1,
             j*8 + CASE WHEN (doc_id*7 + j*13) % 7 = 0 THEN 3 ELSE 8 END), ' '),
           CASE WHEN (doc_id*131 + j*29) % 4 != 0 THEN '.' ELSE '' END)
    END AS line
  FROM (SELECT doc_id, ws, unnest(range(0, (len(ws) + 7) // 8)) AS j FROM ws)
),
flagged AS (
  SELECT doc_id, j, line,
    (regexp_matches(line, '[.!?"]$') AND len(string_split(line, ' ')) >= 5
     AND NOT contains(lower(line), 'javascript')) AS keep,
    (contains(lower(line), 'lorem ipsum') OR contains(line, '{{')) AS poison
  FROM lines
),
agg AS (
  SELECT doc_id, count(*) AS n_lines,
         cast(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS bigint) AS n_kept,
         max(CASE WHEN poison THEN 1 ELSE 0 END) AS poisoned,
         string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY j) AS clean_text
  FROM flagged GROUP BY doc_id
)
SELECT doc_id, n_lines, n_kept, clean_text
FROM agg WHERE poisoned = 0 AND n_kept >= 3
""",
        "ccnet_bucket": f"""
WITH norm AS (SELECT doc_id, lang, {_NORM_DUCK} AS t FROM documents),
words AS (
  SELECT doc_id, lang, unnest(string_split(t, ' ')) AS term
  FROM norm WHERE t <> ''
),
tf AS (
  SELECT doc_id, lang, term, count(*) AS cnt
  FROM words WHERE term <> '' GROUP BY 1, 2, 3
),
lm AS (SELECT lang, term, cast(sum(cnt) AS bigint) AS c FROM tf GROUP BY 1, 2),
tot AS (SELECT lang, cast(sum(c) AS bigint) AS tt FROM lm GROUP BY 1),
bits AS (
  SELECT lm.lang, term, cast(length(bin(tt // c)) as int) AS bits
  FROM lm JOIN tot USING (lang)
),
doc AS (
  SELECT doc_id, tf.lang,
         (1000 * cast(sum(cnt * bits) AS bigint))
           // cast(sum(cnt) AS bigint) AS bits_x1000
  FROM tf JOIN bits USING (lang, term) GROUP BY 1, 2
),
n AS (SELECT lang, count(*) AS nl FROM doc GROUP BY 1),
r AS (
  SELECT doc_id, lang, bits_x1000,
         row_number() OVER (PARTITION BY lang ORDER BY bits_x1000, doc_id) AS r
  FROM doc
)
SELECT doc_id, r.lang, bits_x1000,
       CASE WHEN r * 3 <= nl THEN 'head'
            WHEN r * 3 <= 2 * nl THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM r JOIN n USING (lang)
ORDER BY doc_id
""",
        "dedup_components": f"""
WITH RECURSIVE {_oracle_components_cte()}
SELECT doc_id, component_id FROM comp
""",
        "embedding_drift": _oracle_embedding_drift(),
        "dup_cluster_histogram": f"""
WITH RECURSIVE {_oracle_components_cte()},
sizes AS (
  SELECT component_id, count(*) AS cluster_size FROM comp GROUP BY 1
)
SELECT cluster_size, count(*) AS n_clusters,
       cluster_size * count(*) AS n_docs
FROM sizes GROUP BY 1
""",
        "dedup_keep_best": f"""
WITH RECURSIVE {_oracle_components_cte()},
{{aug}},
{_oracle_quality_cte('aug')}
, scored AS (
  SELECT c.doc_id, c.component_id, q.quality_score,
         row_number() OVER (PARTITION BY c.component_id
                            ORDER BY q.quality_score DESC, c.doc_id ASC)
           AS rn
  FROM comp c JOIN q USING (doc_id)
),
drops AS (SELECT doc_id FROM scored WHERE rn > 1)
SELECT doc_id, quality_score FROM q
WHERE doc_id NOT IN (SELECT doc_id FROM drops)
""".replace("{aug}", aug),
        "domain_dup_report": f"""
WITH RECURSIVE {_oracle_components_cte()},
{{aug}},
dom AS (
  SELECT a.doc_id, d.source AS domain
  FROM aug a JOIN documents d ON a.doc_id % 1000000 = d.doc_id
),
nc AS (SELECT doc_id FROM comp WHERE doc_id <> component_id)
SELECT dom.domain,
       count(*) AS n_docs,
       cast(sum(CASE WHEN nc.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS bigint) AS n_dup,
       floor(sum(CASE WHEN nc.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             * 1.0 / count(*) * 10000) / 10000 AS dup_frac
FROM dom LEFT JOIN nc USING (doc_id)
GROUP BY 1
""".replace("{aug}", aug),
        "snapshot_dedup_report": f"""
WITH {{aug}},
snorm AS (SELECT doc_id, {_NORM_DUCK} AS t FROM aug),
f AS (SELECT doc_id, md5(t) AS fp FROM snorm),
fs AS (SELECT fp, min(doc_id) AS first_id FROM f GROUP BY 1)
SELECT f.doc_id // 100 AS dump,
       count(*) AS n_docs,
       cast(sum(CASE WHEN fs.first_id // 100 < f.doc_id // 100
                THEN 1 ELSE 0 END) AS bigint) AS n_redundant,
       floor(sum(CASE WHEN fs.first_id // 100 < f.doc_id // 100
                 THEN 1 ELSE 0 END)
             * 1.0 / count(*) * 10000) / 10000 AS redundant_frac
FROM f JOIN fs USING (fp)
GROUP BY 1
""".replace("{aug}", aug),
        "dedup_ngram_jaccard": _oracle_ngram_jaccard(),
        "dedup_simhash": _oracle_simhash(),
        "dedup_simhash_pairs": _oracle_simhash_pairs(),
        "dedup_embedding_cosine": _oracle_embedding_cosine(),
        "ann_topk_dot": f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> cast(round(x * {similarity.QUANT}) as bigint)) AS qe
  FROM embeddings
),
qs AS (SELECT vec_id AS query_id, qe AS qv FROM q WHERE vec_id % {similarity.QUERY_MOD} = 0),
pairs AS (
  SELECT query_id, vec_id AS neighbor_id,
         cast(list_dot_product(qv, qe) as bigint) AS dot
  FROM qs CROSS JOIN q WHERE vec_id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id, dot,
         row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, dot, rank FROM ranked WHERE rank <= {similarity.TOP_K}
""",
        "ann_lsh_bucket": _oracle_ann_lsh_bucket(),
        "ann_lsh_topk": _oracle_ann_lsh_topk(),
        "ann_recall_report": _oracle_ann_recall(),
        "ann_recall_clustered": _oracle_ann_recall(
            source="cl", prefix_cte=_clustered_cte() + ",\n"
        ),
        "semdedup_prune": _oracle_semdedup(),
        "dedup_incremental": _oracle_incremental(),
        "ann_ivf_topk": f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> cast(round(x * {similarity.QUANT}) as bigint)) AS qe
  FROM embeddings
),
cent AS (SELECT vec_id AS cid, qe AS ce FROM q WHERE vec_id % {similarity.CENTROID_MOD} = 1),
scored AS (
  SELECT q.vec_id, q.qe, cent.cid,
         cast(list_dot_product(q.qe, cent.ce) as bigint) AS cdot
  FROM q CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, qe, cid FROM (
    SELECT vec_id, qe, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cdot DESC, cid) AS r
    FROM scored
  ) WHERE r = 1
),
qs AS (SELECT vec_id AS query_id, qe AS qv, cid FROM assigned WHERE vec_id % {similarity.QUERY_MOD} = 0),
pairs AS (
  SELECT qs.query_id, a.vec_id AS neighbor_id,
         cast(list_dot_product(qs.qv, a.qe) as bigint) AS dot
  FROM qs JOIN assigned a ON a.cid = qs.cid AND a.vec_id <> qs.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, dot,
         row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, dot, rank FROM ranked WHERE rank <= {similarity.TOP_K}
""",
        "source_quality_report": """
SELECT source, count(*) AS n_docs,
       quantile_cont(n_chars, 0.5) AS median_chars,
       quantile_cont(n_chars, 0.9) AS p90_chars
FROM documents GROUP BY source
""",
        "embedding_norm_stats": f"""
WITH q AS (
  SELECT label,
         cast(list_dot_product(
           list_transform(embedding, x -> cast(round(x * {similarity.QUANT}) as bigint)),
           list_transform(embedding, x -> cast(round(x * {similarity.QUANT}) as bigint))
         ) as bigint) AS sqnorm
  FROM embeddings
)
SELECT label, count(*) AS n_vecs,
       floor(avg(sqnorm) * 100) / 100 AS avg_sqnorm,
       max(sqnorm) AS max_sqnorm
FROM q GROUP BY label
""",
        "resume_anti_join": """
SELECT source, count(*) AS n_pending
FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM documents s WHERE s.doc_id = d.doc_id AND s.doc_id % 3 = 0
)
GROUP BY source
""",
        "status_counts": """
SELECT CASE WHEN n_chars % 97 = 0 THEN 'FAILED'
            WHEN n_chars > 500 THEN 'REJECTED'
            ELSE 'SUCCESS' END AS status,
       count(*) AS n_docs
FROM documents GROUP BY 1
""",
        "quarantine_oversize": """
SELECT source, count(*) AS n_oversize, max(n_chars) AS max_chars
FROM documents WHERE n_chars > 450 GROUP BY source
""",
        "lineage_rollup": """
SELECT event_type, count(*) AS n_events,
       cast(sum(cast(value as decimal(28,2))) as double) AS total_value,
       floor((cast(sum(cast(value as decimal(28,2))) as double) / count(*)) * 10000) / 10000 AS avg_value,
       cast(floor(epoch(min(ts))) as bigint) AS first_ts,
       cast(floor(epoch(max(ts))) as bigint) AS last_ts
FROM events GROUP BY event_type
""",
        "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       cast(sum(cast(l_quantity as decimal(28,2))) as double) AS sum_qty,
       cast(sum(cast(l_extendedprice as decimal(28,2))) as double) AS sum_base_price,
       cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(28,6))) as double) AS sum_disc_price,
       cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) as decimal(28,6))) as double) AS sum_charge,
       floor((cast(sum(cast(l_quantity as decimal(28,2))) as double) / count(*)) * 10000) / 10000 AS avg_qty,
       floor((cast(sum(cast(l_extendedprice as decimal(28,2))) as double) / count(*)) * 10000) / 10000 AS avg_price,
       floor((cast(sum(cast(l_discount as decimal(28,2))) as double) / count(*)) * 10000) / 10000 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
        "top_customers_per_region": _TOP_CUSTOMERS_SQL,
        "events_sessionize": """
WITH e AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
s AS (
  SELECT user_id,
         CASE WHEN prev IS NULL
                   OR (floor(epoch(ts)) - floor(epoch(prev))) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM e
)
SELECT user_id, cast(sum(new_session) AS bigint) AS n_sessions, count(*) AS n_events
FROM s GROUP BY user_id
""",
        "events_funnel": _funnel_sql("floor(epoch(ts)) - floor(epoch(prev))"),
        "multimodal_inspect": """
SELECT doc_id, cast(strlen(text) as bigint) AS n_bytes,
       md5(substr(text, 1, 64)) AS head_hash
FROM documents
""",
        "lineitem_rollup": """
SELECT l_returnflag, l_linestatus, count(*) AS n_items,
       cast(sum(cast(l_quantity as decimal(28,2))) as double) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
        "events_pivot": """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'error') AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY user_id
""",
        "events_asof_join": """
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'view' THEN ts END AS view_ts
  FROM events WHERE event_type IN ('view', 'purchase')
),
filled AS (
  SELECT user_id, ts, event_id, event_type,
         max(view_ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS last_view_ts
  FROM tagged
)
SELECT user_id, event_id,
       cast(floor(epoch(ts)) as bigint) AS purchase_ts,
       cast(floor(epoch(last_view_ts)) as bigint) AS last_view_ts
FROM filled WHERE event_type = 'purchase'
""",
        "customer_running_revenue": """
SELECT o_custkey, o_orderkey,
       cast(floor(epoch(o_orderdate)) as bigint) AS order_ts,
       cast(sum(cast(o_totalprice as decimal(28,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) as double) AS running_revenue
FROM orders
""",
        # The extractor and zlib are pure Python, not SQL — their oracles
        # are VALUES literals computed driver-side without Spark, which
        # still checks the whole distributed path (scan, repartition,
        # Arrow batching, per-row isolation, determinism).
        "compression_quality": _oracle_compression_quality(),
        "image_features": _oracle_image_features(),
        "audio_features": _oracle_audio_features(),
        "extract_documents_pipeline": _oracle_extract_documents_pipeline(),
        # same literal: extraction THROUGH the WARC round-trip must be
        # byte-identical to extraction straight from the table
        "warc_extract_pipeline": _oracle_extract_documents_pipeline(),
        "extract_block_histogram": _oracle_extract_block_histogram(),
        "extract_synth_summary": _oracle_extract_synth_summary(),
    }
