"""Host-graph analytics over the corpus: integer-exact PageRank.

Web-corpus curation ranks hosts to prioritize crawling and to weight
quality signals (Common Crawl publishes exactly this as its host-level
webgraph ranks).  The reference repo processes one uploaded document at
a time and has no corpus-level graph view; at 10^12-document scale the
host graph is a first-class curation input, so the Spark rebuild adds
it as an operator family.

Design notes, Spark-first:

- **Edges are derived JVM-side** (`host_edges`): pure column arithmetic
  over ``doc_id`` — no UDF.  The synthetic link structure
  (``doc_id % n_hosts`` linking to two affine images) is a stand-in
  for a real outlink extraction; the PageRank itself is
  structure-agnostic.
- **Each iteration is one shuffle**: ``join(ranks, edges on src)`` →
  ``groupBy(dst).sum`` — the textbook distributed PageRank data flow
  (Page et al. 1999; GraphX's ``staticPageRank`` runs the same rounds).
  The rank table is tiny (one row per HOST, not per doc) so it is
  broadcast into the edge join: the big edge table never shuffles
  after its initial aggregation.
- **Integer-exact arithmetic**: ranks are scaled to ``SCALE = 10^12``
  and every step uses bigint ``div`` (truncating division, identical in
  Spark and DuckDB — see NOTES.md).  Floating-point PageRank is
  non-associative under Spark's nondeterministic partial-aggregation
  order; integer sums are order-independent, so the result is
  bit-reproducible at any parallelism AND oracle-checkable.
- **Lineage truncation per round** via ``plans.iterate.RoundCheckpointer``
  (same contract as ``dedup.duplicate_components``): iterative plans
  must checkpoint or the nested plan doubles per round.

Dangling hosts (in-links only) keep the teleport term; their lost
outflow is simply not redistributed — the standard simplification, and
applied identically in the DuckDB oracle so the comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.iterate import RoundCheckpointer

N_HOSTS_MOD = 53
SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100  # d = 0.85 as an exact ratio


def host_edges(docs: DataFrame, n_hosts: int = N_HOSTS_MOD) -> DataFrame:
    """Deterministic host multigraph from the documents table.

    Each doc's host is ``doc_id % n_hosts``; it links to the affine
    image ``(31*doc_id + 7) % n_hosts`` (dense mixing) and to the hub
    ``doc_id % 7`` (hosts 0-6 soak up half of all links — the power-law
    skew real host graphs have, so PageRank genuinely discriminates and
    the skewed-key aggregation path is exercised).  Self-loops are
    kept: they model intra-host links and both engines treat them
    identically.
    """
    d = F.col("doc_id")
    src = (d % n_hosts).alias("src")
    e1 = docs.select(src, ((d * 31 + 7) % n_hosts).alias("dst"))
    e2 = docs.select(src, (d % 7).alias("dst"))
    return e1.unionAll(e2)


def host_pagerank(
    docs: DataFrame,
    n_hosts: int = N_HOSTS_MOD,
    iters: int = 3,
    checkpoint: bool = True,
) -> DataFrame:
    """``iters`` rounds of damped PageRank over the synthetic host
    graph (see `_pagerank_rounds` for the update rule and plan shape).
    Returns ``(host string, rank bigint)`` on the ``SCALE`` fixed-point
    scale."""
    edges = host_edges(docs, n_hosts)
    ranks = _pagerank_rounds(edges, iters=iters, checkpoint=checkpoint)
    return ranks.select(
        F.concat(F.lit("h"), F.col("h").cast("string")).alias("host"),
        "rank",
    )


def _pagerank_rounds(
    edges: DataFrame,
    iters: int = 3,
    checkpoint: bool = True,
) -> DataFrame:
    """``iters`` rounds of damped PageRank over an ``(src, dst)``
    multigraph of any key type; returns ``(h, rank bigint)``.

    Update rule (all bigint ``div``):

        rank'(h) = (15·SCALE) div (100·n)
                 + (85 · Σ_{e: src→h} rank(src) div outdeg(src)) div 100

    The edge table is aggregated ONCE into per-(src,dst) multiplicities
    (`n_e`) — each round then joins the n-row rank table against the at
    most n²-row weight table instead of the full per-doc edge list, and
    the rank side is explicitly broadcast: iterations shuffle only
    host-cardinality data, never corpus-cardinality data.  Out-degree
    is derived FROM the collapsed table (``sum(n_e) over src``), so the
    corpus-cardinality edge list is scanned exactly once.
    """
    from pyspark.sql.window import Window

    ck = RoundCheckpointer(edges)
    # Collapse the corpus-sized multigraph once: weight = edge
    # multiplicity; out-degree = sum of multiplicities per src, a
    # window over the (at most n²-row) collapsed table — never a
    # second aggregation of the corpus-sized edge list.
    w = (
        edges.groupBy("src", "dst")
        .agg(F.count("*").alias("n_e"))
        .withColumn("d", F.sum("n_e").over(Window.partitionBy("src")))
    )
    if checkpoint:
        # Loop invariants, materialized once; released after the final
        # round's own checkpoint truncates every reference to them.
        # (checkpoint=False skips the eager pins; the hosts.count()
        # below still runs — the host count is needed driver-side — so
        # the flag trades pinned storage for per-iteration recompute,
        # not lazy construction.)
        w = ck.pin(w)
    hosts = (
        w.select(F.col("src").alias("h"))
        .unionAll(w.select(F.col("dst").alias("h")))
        .distinct()
    )
    if checkpoint:
        hosts = ck.pin(hosts)
    n = hosts.count()
    if n == 0:
        ck.release_pinned()  # nothing downstream references the pins
        return edges.sparkSession.createDataFrame(
            [], "h string, rank bigint"
        )

    base = (15 * SCALE) // (100 * n)  # driver-side ints: exact
    ranks = hosts.select("h", F.lit(SCALE // n).cast("bigint").alias("rank"))
    for _ in range(iters):
        contrib = (
            F.broadcast(ranks)
            .join(w, ranks["h"] == w["src"])
            .select(
                F.col("dst").alias("h"),
                (F.expr("rank div d") * F.col("n_e")).alias("c"),
            )
            .groupBy("h")
            .agg(F.sum("c").alias("s"))
        )
        ranks = hosts.join(contrib, "h", "left").select(
            "h",
            (
                F.lit(base)
                + F.expr(f"({DAMP_NUM} * coalesce(s, 0L)) div {DAMP_DEN}")
            ).cast("bigint").alias("rank"),
        )
        if checkpoint:
            ranks = ck.ckpt(ranks)

    if checkpoint and iters > 0:
        # The final round is checkpointed, so nothing downstream
        # references the pinned w/hosts blocks any more.  (iters=0
        # returns a projection OF hosts — the pin must then outlive us.)
        ck.release_pinned()
    return ranks


def host_pagerank_oracle_sql(
    source: str = "documents", n_hosts: int = N_HOSTS_MOD, iters: int = 3
) -> str:
    """DuckDB twin of :func:`host_pagerank`, generated for the same
    ``iters`` so the two engines can never drift on round count.

    Same integer arithmetic: DuckDB ``//`` truncates like Spark ``div``;
    hugeint intermediates are cast back to bigint each round.
    """
    edges = (
        f"SELECT doc_id % {n_hosts} AS src, (doc_id * 31 + 7) % {n_hosts} AS dst FROM {source}"
        f" UNION ALL SELECT doc_id % {n_hosts}, doc_id % 7 FROM {source}"
    )
    ctes = [
        f"edges AS ({edges})",
        "w AS (SELECT src, dst, count(*) AS n_e FROM edges GROUP BY src, dst)",
        "outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)",
        "hosts AS (SELECT DISTINCT src AS h FROM edges UNION SELECT DISTINCT dst FROM edges)",
        "nn AS (SELECT count(*) AS n FROM hosts)",
        (
            f"r0 AS (SELECT h, cast({SCALE} // (SELECT n FROM nn) AS bigint) AS rank FROM hosts)"
        ),
    ]
    for i in range(iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        ctes.append(
            f"""{cur} AS (
  SELECT hosts.h,
         cast((15 * {SCALE}) // (100 * (SELECT n FROM nn))
              + ({DAMP_NUM} * coalesce(c.s, 0)) // {DAMP_DEN} AS bigint) AS rank
  FROM hosts LEFT JOIN (
    SELECT w.dst AS h, sum((r.rank // o.d) * w.n_e) AS s
    FROM w JOIN {prev} r ON r.h = w.src JOIN outdeg o ON o.src = w.src
    GROUP BY w.dst) c ON c.h = hosts.h
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT 'h' || cast(h AS varchar) AS host, rank FROM r{iters}"
    )


# ---------------------------------------------------------------------------
# Real outlink extraction (the WAT path)
# ---------------------------------------------------------------------------

# The host-graph section above notes its synthetic edge structure is "a
# stand-in for a real outlink extraction"; this closes that gap.  Common
# Crawl ships exactly this derivation as its WAT sidecar files (per-page
# outlink + anchor-text metadata extracted from the WARC HTML), and the
# host webgraph that `host_pagerank` models is aggregated FROM it.  The
# reference repo has no corpus-level link view (it serves one uploaded
# document at a time); at 10^12-document scale the link table is a
# first-class curation input, so the rebuild adds it.
#
# Engine-portability contract: the three regexes below are deliberately
# restricted to single-character classes + literals (no backreferences,
# no lookaround, no alternation) so Java `regexp_extract_all`, DuckDB
# RE2, and Python `re` (the VALUES-oracle twin) agree exactly.

A_TAG_RE = "<a [^>]*>[^<]*</a>"
HREF_RE = "href=[\"']([^\"']*)[\"']"
ANCHOR_RE = ">([^<]*)<"
URL_HOST_RE = "^https?://([^/]+)"


def page_outlinks(pages: DataFrame) -> DataFrame:
    """Per-page outlink table ``(url, host, href, anchor)`` — one row per
    ``<a>`` tag, extracted entirely JVM-side.

    Content dispatch mirrors the engine's magic-byte gate: only
    documents whose bytes open with ``<html`` are scanned (PDF / blank /
    tag-soup rows fall through, same families `extractor.engine`
    quarantines).  The scan itself is ``regexp_extract_all`` over the
    UTF-8 cast plus a ``transform`` that pulls href + anchor out of each
    tag — a narrow projection with NO shuffle, no Python, and whole-stage
    codegen all the way down, so at 10^12 documents it is pure map work
    that scales with input splits.
    """
    h = F.col("html").cast("string")
    tags = F.regexp_extract_all(h, F.lit(A_TAG_RE), F.lit(0))
    links = F.transform(
        tags,
        lambda t: F.struct(
            F.regexp_extract(t, HREF_RE, 1).alias("href"),
            F.regexp_extract(t, ANCHOR_RE, 1).alias("anchor"),
        ),
    )
    return (
        pages.where(h.startswith("<html"))
        .select(
            "url",
            F.regexp_extract("url", URL_HOST_RE, 1).alias("host"),
            F.explode(links).alias("l"),
        )
        .select("url", "host", F.col("l.href").alias("href"), F.col("l.anchor").alias("anchor"))
    )


def outlink_summary(pages: DataFrame) -> DataFrame:
    """Link-target popularity rollup ``(href, n_links, n_hosts, n_pages,
    sample_anchor)`` — the aggregate a crawl frontier reads to decide
    which targets are navigational boilerplate (every host links them)
    versus content.

    One Exchange on ``href`` after the map-only extraction;
    ``sample_anchor`` is ``min(anchor)`` so the value is deterministic
    at any parallelism.
    """
    return (
        page_outlinks(pages)
        .groupBy("href")
        .agg(
            F.count("*").alias("n_links"),
            F.countDistinct("host").alias("n_hosts"),
            F.countDistinct("url").alias("n_pages"),
            F.min("anchor").alias("sample_anchor"),
        )
    )


def outlink_host_edges(pages: DataFrame) -> DataFrame:
    """Real ``(src, dst)`` host edges from the extracted link table:
    absolute ``http(s)://`` hrefs resolve to their own host, relative
    hrefs to the source host (RFC 3986 same-origin resolution for the
    path-only case).  This is the actual WAT → webgraph derivation —
    `host_edges`' synthetic structure with the synthesis removed."""
    links = page_outlinks(pages)
    dst = F.when(
        F.col("href").rlike("^https?://"),
        F.regexp_extract("href", URL_HOST_RE, 1),
    ).otherwise(F.col("host"))
    return links.select(
        F.col("host").alias("src"), dst.alias("dst")
    ).filter(F.col("dst") != "")


def outlink_pagerank(
    pages: DataFrame, iters: int = 3, checkpoint: bool = True
) -> DataFrame:
    """Damped PageRank over the REAL extracted link graph — the full
    Common-Crawl derivation end-to-end: HTML → ``<a href>`` scan →
    host edges → `_pagerank_rounds`.  Returns ``(host string,
    rank bigint)`` on the ``SCALE`` fixed-point scale."""
    ranks = _pagerank_rounds(
        outlink_host_edges(pages), iters=iters, checkpoint=checkpoint
    )
    return ranks.select(F.col("h").alias("host"), "rank")
