"""Similarity search over an embedding column (``array<float>``).

Two tiers, mirroring what a 100 TB training-data pipeline needs:

- **brute-force top-k** (the correctness baseline): broadcast the query
  set, score every (query, candidate) pair with an exact
  integer-quantized dot product, rank per query.  The quantization
  (``round(x * 1000)`` per component) makes the arithmetic exact
  integer math — bit-identical across engines and partitionings, no
  float-summation-order nondeterminism.
- **LSH bucketing** (the scale path): signed-random-hyperplane buckets
  (``K_PLANES`` frozen ±1 hyperplanes, seeded) so candidate generation
  becomes an equi-join on bucket id instead of a cross join.

JVM-side throughout: ``zip_with``/``aggregate`` higher-order functions,
no Python UDFs.
"""

from __future__ import annotations

import random
from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

QUANT = 1000
K_PLANES = 8
DIM = 64
HYPERPLANE_SEED = 777
TOP_K = 5
QUERY_MOD = 50  # vec_id % QUERY_MOD == 0 -> query vector


def hyperplanes(k: int = K_PLANES, dim: int = DIM, seed: int = HYPERPLANE_SEED) -> List[List[int]]:
    """Frozen ±1 hyperplanes (sign random projections, Charikar 2002)."""
    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(k)]


def quantized(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Add ``qe``: the integer-quantized embedding."""
    return df.withColumn(
        "qe", F.expr(f"transform({col}, x -> cast(round(x * {QUANT}) as bigint))")
    )


def _dot(a: str, b: str) -> F.Column:
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, x) -> acc + x)")


def topk_dot_neighbors(
    emb: DataFrame, top_k: int = TOP_K, query_mod: int = QUERY_MOD
) -> DataFrame:
    """Exact top-k max-inner-product neighbors for the query subset.

    NOT layout-guarded on purpose (round-8 measurement): spreading the
    corpus side puts an Exchange under the broadcast build's subtree
    too, serializing the broadcast behind a shuffle stage — a net cold
    loss at sandbox scale; at production scale the scan is already
    split."""
    q = quantized(emb).select("vec_id", "qe")
    queries = q.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("qv")
    )
    pairs = F.broadcast(queries).crossJoin(q).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), _dot("qv", "qe").alias("dot")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )


def lsh_buckets(emb: DataFrame) -> DataFrame:
    """Signed-hyperplane bucket id per vector (the ANN scale path:
    bucket equi-join replaces the cross join for candidate generation)."""
    q = quantized(emb).select("vec_id", "qe")
    planes = hyperplanes()
    bucket = None
    for k, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"{w}L" for w in plane) + ")"
        bit = F.when(_dot("qe", arr) > 0, F.lit(2 ** k)).otherwise(F.lit(0))
        bucket = bit if bucket is None else (bucket + bit)
    return q.select("vec_id", bucket.cast("bigint").alias("bucket"))


COSINE_NUM = 81  # cosine^2 threshold as a ratio: dot^2/(na*nb) >= 81/100
COSINE_DEN = 100
COSINE_DOWNSCALE = 1000  # pre-divide to keep products inside bigint range


def embedding_cosine_duplicates(emb: DataFrame) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — entirely integer math.

    Candidates block on the signed-hyperplane LSH bucket (near-identical
    vectors land in the same bucket), then verify
    ``cos >= 0.9`` via the cross-multiplied integer comparison
    ``100 * (dot/1000)^2 >= 81 * (na/1000) * (nb/1000)`` with ``dot > 0``
    — no floats anywhere, so Spark and the DuckDB oracle agree
    bit-for-bit (the /1000 downscale keeps products under 2^63; it
    slightly coarsens the threshold identically in both engines).
    """
    q = quantized(emb).select("vec_id", "qe")
    sq = _dot("qe", "qe")
    buckets = lsh_buckets(emb)
    vec = q.join(buckets, "vec_id").select(
        "vec_id", "qe", sq.alias("sq"), "bucket"
    )
    a = vec.alias("a")
    b = vec.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.expr(
            "aggregate(zip_with(a.qe, b.qe, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
        ).alias("dot"),
        F.col("a.sq").alias("sq_a"),
        F.col("b.sq").alias("sq_b"),
    )
    ds = COSINE_DOWNSCALE
    keep = (F.col("dot") > 0) & (
        F.lit(COSINE_DEN)
        * (F.expr(f"dot div {ds}") * F.expr(f"dot div {ds}"))
        >= F.lit(COSINE_NUM) * F.expr(f"sq_a div {ds}") * F.expr(f"sq_b div {ds}")
    )
    return pairs.filter(keep).select("id_a", "id_b", "dot", "sq_a", "sq_b")


def lsh_topk_neighbors(
    emb: DataFrame, top_k: int = TOP_K, query_mod: int = QUERY_MOD
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    The scale path for ANN — candidate generation is a bucket equi-join
    (shuffle on bucket id) instead of a cross join, trading recall for a
    candidate set ~2^K_PLANES times smaller.  Exact integer scoring and
    deterministic ranking within the bucket.
    """
    q = quantized(emb).select("vec_id", "qe")
    buckets = lsh_buckets(emb)
    vec = q.join(buckets, "vec_id")
    queries = vec.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qe").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    pairs = queries.join(
        vec, (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("query_id"))
    ).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), _dot("qv", "qe").alias("dot")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "neighbor_id", "dot", "rank")
    )


CENTROID_MOD = 29  # vec_id % CENTROID_MOD == 1 -> centroid (disjoint from queries)


def ivf_assign(emb: DataFrame, centroid_mod: int = CENTROID_MOD) -> DataFrame:
    """IVF coarse quantization: assign every vector to its max-dot centroid.

    Centroids are the (deterministic) subset ``vec_id % centroid_mod == 1``
    — a stand-in for k-means centroids, chosen so the DuckDB oracle can
    reproduce the assignment exactly.  The centroid set is tiny, so the
    scoring join is an explicit broadcast; ties break to the lowest
    centroid id.  All math is the exact quantized integer dot product.
    """
    q = quantized(emb).select("vec_id", "qe")
    cents = q.filter(F.col("vec_id") % centroid_mod == 1).select(
        F.col("vec_id").alias("cid"), F.col("qe").alias("ce")
    )
    scored = q.join(F.broadcast(cents)).select(
        "vec_id", "qe", "cid", _dot("qe", "ce").alias("cdot")
    )
    # argmax via max_by over (cdot, -cid), not a row_number window: max_by
    # partial-aggregates map-side, so the shuffle moves one row per vector
    # instead of the N x K scored rows a window sort would move.
    best = F.max_by(
        F.struct(F.col("cid"), F.col("qe")),
        F.struct(F.col("cdot"), (-F.col("cid")).alias("tie")),
    )
    return (
        scored.groupBy("vec_id")
        .agg(best.alias("_best"))
        .select("vec_id", F.col("_best.qe").alias("qe"), F.col("_best.cid").alias("cid"))
    )


IVF_TOPK_SCHEMA = "query_id long, neighbor_id long, dot long, rank int"


def ivf_topk_neighbors(
    emb: DataFrame,
    top_k: int = TOP_K,
    query_mod: int = QUERY_MOD,
    centroid_mod: int = CENTROID_MOD,
) -> DataFrame:
    """Approximate top-k via IVF: search only the query's own cluster.

    The grouped-map UDF tier (``applyInPandas``), used where it is
    scale-safe by construction: each group is ONE IVF cluster (~N/K
    vectors — bounded by the centroid count knob, unlike grouping by a
    skewed natural key), and the in-group numpy matrix product is the
    natural dense implementation.  Exact int64 arithmetic inside numpy
    matches the JVM/DuckDB quantized dot bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.array(pdf["qe"].tolist(), dtype="int64")  # (n, dim)
        ids = pdf["vec_id"].to_numpy(dtype="int64")
        q_mask = ids % query_mod == 0
        if not q_mask.any() or len(ids) < 2:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "dot": [], "rank": []}
            )
        out = {"query_id": [], "neighbor_id": [], "dot": [], "rank": []}
        dots = mat[q_mask] @ mat.T  # (nq, n) exact int64
        for qi, qid in enumerate(ids[q_mask]):
            mask = ids != qid
            nb_ids, nb_dots = ids[mask], dots[qi][mask]
            order = np.lexsort((nb_ids, -nb_dots))[:top_k]
            for rank, j in enumerate(order, start=1):
                out["query_id"].append(qid)
                out["neighbor_id"].append(nb_ids[j])
                out["dot"].append(nb_dots[j])
                out["rank"].append(rank)
        return pd.DataFrame(out)

    assigned = ivf_assign(emb, centroid_mod)
    return assigned.groupBy("cid").applyInPandas(per_cluster, schema=IVF_TOPK_SCHEMA)


def embedding_norm_stats(emb: DataFrame) -> DataFrame:
    """Per-label quantized-norm statistics (sanity/monitoring tier)."""
    q = quantized(emb)
    sq = _dot("qe", "qe")
    return (
        q.select("label", sq.alias("sqnorm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            (F.floor(F.avg("sqnorm") * 100) / 100).alias("avg_sqnorm"),
            F.max("sqnorm").alias("max_sqnorm"),
        )
    )


# ---------------------------------------------------------------------------
# k-means (Lloyd's iterations, distributed assignment + update)
# ---------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITER = 2


def _tz_div(s: int, n: int) -> int:
    """Integer division truncating toward ZERO (Spark/DuckDB `div`
    semantics) — Python's `//` floors, which differs for negative sums."""
    q = abs(s) // n
    return q if s >= 0 else -q


def _assign_clusters(q: DataFrame, centroids: List[List[int]], k: int) -> DataFrame:
    """Nearest centroid per vector via broadcast-LITERAL centroid arrays:
    zero shuffle, the whole arithmetic in one JVM projection.
    Deterministic tie-break: minimize ``dist * k + cluster`` (lowest
    cluster id wins), a single bigint key both engines order identically.
    ``dist``/``cluster`` are recovered from the key (it stays well under
    2^53, so the double round-trip in floor() is exact)."""
    terms = [
        F.aggregate(
            F.zip_with(
                F.col("qe"),
                F.array(*[F.lit(int(v)) for v in centroids[j]]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        * k
        + j
        for j in range(k)
    ]
    key = F.least(*terms)
    return q.select(
        "vec_id",
        "qe",
        (key % k).cast("int").alias("cluster"),
        F.floor(key / k).cast("long").alias("dist"),
    )


def kmeans_clusters(
    emb: DataFrame, k: int = KMEANS_K, n_iter: int = KMEANS_ITER
) -> DataFrame:
    """Lloyd's k-means over integer-quantized embeddings, fully
    deterministic and oracle-reproducible:

    - init: the ``k`` lowest vec_ids' vectors (no RNG);
    - assignment: broadcast centroid literals, squared-L2 in bigint,
      ties to the lowest cluster id — a map-only stage;
    - update: ``posexplode`` to (cluster, dim) partial sums (map-side
      combined, k x dim rows to the driver), centroid = toward-zero
      integer division; empty clusters keep their previous centroid.

    The driver-side loop is the standard Lloyd's shape (cf. Spark MLlib):
    each round is one map-only assignment + one aggregation; only the
    k x dim centroid table ever leaves the executors.
    """
    q = quantized(emb).select("vec_id", "qe").persist()
    try:
        # seed from the k lowest vec_ids PRESENT (any id space works:
        # 1-based, sparse, filtered); cluster j = rank-j seed
        seeds = q.orderBy("vec_id").limit(k).collect()
        if len(seeds) < k:
            raise ValueError(f"k-means needs >= k={k} vectors, got {len(seeds)}")
        centroids = [list(r["qe"]) for r in seeds]
        for _ in range(n_iter):
            assigned = _assign_clusters(q, centroids, k)
            upd = (
                assigned.select("cluster", F.posexplode("qe").alias("dim", "v"))
                .groupBy("cluster", "dim")
                .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            new = {c: list(centroids[c]) for c in range(k)}
            for r in upd:
                new[r["cluster"]][r["dim"]] = _tz_div(int(r["s"]), int(r["n"]))
            centroids = [new[c] for c in range(k)]
        # localCheckpoint materializes the final assignment so the cached
        # input can be released before returning (no storage leak)
        return (
            _assign_clusters(q, centroids, k)
            .select("vec_id", "cluster", "dist")
            .localCheckpoint()
        )
    finally:
        q.unpersist()


# deterministic clustered corpus (a mixture of well-separated blobs)
# derived from the random embeddings table.  Random vectors are LSH's
# WORST case (recall ~0.02 measured round 4); real embedding corpora are
# clustered, which is the regime the approximate tiers are built for —
# this derivation gives the recall report its realistic arm without any
# external data.  All integer math (center + quantized-noise div) so the
# DuckDB oracle reproduces the corpus bit-for-bit; the /QUANT rescale
# keeps the column a plain double embedding that round-trips exactly
# through quantized() in both engines.
SYNTH_CLUSTERS = 10
# centers +-2400 vs full-strength noise +-~3000: a deliberately
# OVERLAPPING regime (not degenerate blobs) — measured at sf0.01:
# IVF recall 1.0, LSH 0.8, vs 0.22/0.02 on the raw random corpus.
# Tighter steps (>=500) push both tiers to a trivial 1.0.
CENTER_STEP = 400
NOISE_DIV = 1


def clustered_embeddings(
    emb: DataFrame,
    n_clusters: int = SYNTH_CLUSTERS,
    center_step: int = CENTER_STEP,
    noise_div: int = NOISE_DIV,
) -> DataFrame:
    """Derive a deterministic clustered corpus from random embeddings.

    Cluster of row = ``vec_id % n_clusters``; center component ``j`` of
    cluster ``c`` = ``((c*37 + j*101) % 13 - 6) * center_step`` (a frozen
    pseudo-uniform lattice in [-6, 6]*step); the row's own quantized
    embedding, shrunk by ``noise_div``, is the intra-cluster noise.
    Everything is bigint arithmetic — Spark and DuckDB agree exactly —
    and ``div`` truncates toward zero in BOTH engines (verified for
    negatives), so the derived corpus is oracle-reproducible.
    """
    return emb.select(
        "vec_id",
        F.expr(
            f"transform(embedding, (x, j) -> "
            f"cast((((vec_id % {n_clusters}) * 37 + j * 101) % 13 - 6)"
            f" * {center_step}"
            f" + (cast(round(x * {QUANT}) as bigint) div {noise_div})"
            f" as double) / {QUANT})"
        ).alias("embedding"),
    )


def ann_recall_report(
    emb: DataFrame, top_k: int = TOP_K, query_mod: int = QUERY_MOD
) -> DataFrame:
    """Recall@k of the approximate ANN tiers against the exact tier —
    the acceptance metric every ANN deployment publishes before turning
    off brute force.  One row per method:
    ``(method, n_queries, n_exact, n_hits, recall)``.

    Scale: the exact tier is the expensive input, but it runs over the
    QUERY SUBSET only (that is the whole point of the exact/approx
    layering) and each comparison is a (query_id, neighbor_id) left-semi
    join of two top-k tables — k rows per query, trivially shuffled.
    The single-row aggregates combine via broadcast, never a shuffle.
    """
    from ..functions.columns import dtrunc

    exact = topk_dot_neighbors(emb, top_k, query_mod).select(
        "query_id", "neighbor_id"
    )
    rows = []
    for method, approx in (
        ("ivf", ivf_topk_neighbors(emb, top_k, query_mod)),
        ("lsh", lsh_topk_neighbors(emb, top_k, query_mod)),
    ):
        ap = approx.select("query_id", "neighbor_id")
        base = exact.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count("*").alias("n_exact"),
        )
        hits = exact.join(
            ap, ["query_id", "neighbor_id"], "left_semi"
        ).agg(F.count("*").alias("n_hits"))
        rows.append(
            base.join(F.broadcast(hits)).select(
                F.lit(method).alias("method"),
                "n_queries",
                "n_exact",
                "n_hits",
                dtrunc(F.col("n_hits") / F.col("n_exact"), 4).alias("recall"),
            )
        )
    return rows[0].unionByName(rows[1])


# --- SemDeDup: semantic dedup inside coarse-quantizer cells ------------
#
# Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
# through semantic deduplication") cluster the embedding corpus with
# k-means, compute pairwise cosines INSIDE each cluster only, and for
# every epsilon-ball keep the member farthest from the cluster centroid.
# The cluster scoping is what makes the O(n^2) pairwise affordable: with
# k ~ n / target_cell (they use k = 50,000 on LAION-440M, cells of
# ~10^4) each cell's pairwise is independent work for one executor and
# the corpus-wide cross join never exists.
#
# The twins corpus below gives the operator a deterministic planted
# ground truth (the clustered corpus alone has no near-duplicates:
# within-cluster cosines are 0.990-0.997 at step 400), and the frozen
# lattice codebook replaces the k-means driver loop so the DuckDB
# oracle can reproduce the assignment as a pure projection.

TWIN_MOD = 4          # vec_id % TWIN_MOD == TWIN_RES -> row gets a twin
TWIN_RES = 1
TWIN_OFFSET = 1_000_000   # twin vec_id = base vec_id + TWIN_OFFSET
TWIN_STEP = 15        # perturbation amplitude on the quantized scale
# cos^2 >= 9960/10000 (cos ~ 0.998): strictly between the planted-twin
# cosines (~0.9993 measured: perturbation norm^2 ~ 2e5 vs vector norm^2
# ~ 1.4e8) and the same-cluster baseline max (0.997 measured at
# sf0.001/sf0.01) — ~2e-3 margin each side, >> the ~1.5e-5 relative
# truncation error of the downscaled integer compare
SEMDEDUP_NUM = 9960
SEMDEDUP_DEN = 10_000


def lattice_centroids(
    n_clusters: int = SYNTH_CLUSTERS,
    center_step: int = CENTER_STEP,
    dim: int = DIM,
) -> List[List[int]]:
    """The frozen centers of :func:`clustered_embeddings`, as literals —
    the coarse-quantizer codebook for :func:`semdedup_prune`."""
    return [
        [((c * 37 + j * 101) % 13 - 6) * center_step for j in range(dim)]
        for c in range(n_clusters)
    ]


def semdedup_corpus(emb: DataFrame) -> DataFrame:
    """Plant deterministic near-duplicate twins into an embedding corpus.

    Every row with ``vec_id % TWIN_MOD == TWIN_RES`` emits a second row
    (``vec_id + TWIN_OFFSET``) whose quantized embedding is the base
    plus a frozen lattice perturbation ``((vec_id + j*7) % 13 - 6) *
    TWIN_STEP`` — a UNION ALL, never a join, so the derivation is one
    map-side pass and the DuckDB twin is the same two-branch union.
    Perturbed components shift by at most ±90 on the quantized scale
    (vector components average ~±1500), so twin pairs sit at cos ~
    0.9993 while unrelated same-cluster pairs stay <= 0.997.
    """
    twin = emb.filter(F.col("vec_id") % TWIN_MOD == TWIN_RES).select(
        (F.col("vec_id") + TWIN_OFFSET).alias("vec_id"),
        F.expr(
            f"transform(embedding, (x, j) -> "
            f"cast(cast(round(x * {QUANT}) as bigint)"
            f" + ((vec_id + j * 7) % 13 - 6) * {TWIN_STEP}"
            f" as double) / {QUANT})"
        ).alias("embedding"),
    )
    return emb.select("vec_id", "embedding").unionByName(twin)


def semdedup_prune(
    emb: DataFrame,
    n_clusters: int = SYNTH_CLUSTERS,
    center_step: int = CENTER_STEP,
    num: int = SEMDEDUP_NUM,
    den: int = SEMDEDUP_DEN,
    persist: bool = True,
) -> DataFrame:
    """SemDeDup pruning: which rows does semantic dedup drop, and why.

    Stages (all JVM-side, integer-exact):

    1. **Coarse assignment** — nearest centroid from the frozen lattice
       codebook (:func:`lattice_centroids`), squared-L2 in bigint via
       broadcast literals: a map-only projection, zero shuffle
       (the k-means analogue :func:`kmeans_clusters` learns centroids;
       here the codebook is frozen so the oracle can replay it).
    2. **Cell-local pairwise** — self-join on ``cluster`` only, cosine
       threshold ``cos^2 >= num/den`` via the cross-multiplied integer
       compare of :func:`embedding_cosine_duplicates` (downscale ``div
       1000`` keeps products under 2^63; identical in both engines).
    3. **Keeper rule** — per Abbas et al. §2: within an epsilon-pair the
       member FARTHEST from the centroid is kept (it preserves cluster
       diversity); a row is dropped iff SOME epsilon-partner beats it on
       ``(dist, -vec_id)``.  Pairwise dominance, not connected
       components: every epsilon-ball keeps at least its farthest
       member, and the rule needs one aggregation, not an iterative
       label propagation.

    Returns the DROPPED rows: ``(vec_id, cluster, dist,
    n_dup_partners)`` ordered by vec_id.

    Scale shape: one Exchange on ``cluster`` for the self-join; cell
    sizes are the coarse quantizer's design knob (k ~ n / 10^4 keeps
    each cell's pairwise ~10^8 integer ops, one executor-core each,
    embarrassingly parallel across cells — exactly the SemDeDup-paper
    regime), so the corpus-wide cross join never exists at any scale.
    """
    centroids = lattice_centroids(n_clusters, center_step)
    q = quantized(emb).select("vec_id", "qe")
    # squared norm ONCE per vector, before the self-join — recomputing
    # it per pair would triple the higher-order-fold work on the
    # quadratic side of the operator (measured 16 -> ~6 s at sf0.1)
    assigned = _assign_clusters(q, centroids, n_clusters).withColumn(
        "sq", _dot("qe", "qe")
    )
    if persist:
        # eager cut: the assignment projection is a HUGE generated
        # expression (n_clusters literal arrays x dim inside a least())
        # that the self-join would otherwise codegen and evaluate on
        # BOTH sides; materializing it once measured ~2x on the whole
        # operator at sf0.1 (7 -> 4 s)
        assigned = assigned.localCheckpoint()
    a, b = assigned.alias("a"), assigned.alias("b")
    ds = COSINE_DOWNSCALE
    # each UNORDERED pair's dot is computed ONCE (a.vec_id < b.vec_id
    # halves the quadratic fold work); the few surviving epsilon-pairs
    # are localCheckpoint-ed so the two direction projections below
    # don't re-run the join, then exploded into both orientations for
    # the per-member dominance aggregate
    half = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("a.cluster").alias("cluster"),
            F.col("a.dist").alias("dist_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("b.dist").alias("dist_b"),
            F.expr(
                "aggregate(zip_with(a.qe, b.qe, (x, y) -> x * y),"
                " 0L, (acc, x) -> acc + x)"
            ).alias("dot"),
            F.col("a.sq").alias("sq_a"),
            F.col("b.sq").alias("sq_b"),
        )
        .filter(
            (F.col("dot") > 0)
            & (
                F.lit(den)
                * (F.expr(f"dot div {ds}") * F.expr(f"dot div {ds}"))
                >= F.lit(num)
                * F.expr(f"sq_a div {ds}")
                * F.expr(f"sq_b div {ds}")
            )
        )
    )
    if persist:
        half = half.localCheckpoint()
    fwd = half.select(
        F.col("id_a").alias("vec_id"),
        "cluster",
        F.col("dist_a").alias("dist"),
        F.col("id_b").alias("o_id"),
        F.col("dist_b").alias("o_dist"),
    )
    rev = half.select(
        F.col("id_b").alias("vec_id"),
        "cluster",
        F.col("dist_b").alias("dist"),
        F.col("id_a").alias("o_id"),
        F.col("dist_a").alias("o_dist"),
    )
    pairs = fwd.unionByName(rev)
    # dropped iff some partner dominates on (dist, -vec_id); count all
    # epsilon-partners alongside for the report
    beats = (F.col("o_dist") > F.col("dist")) | (
        (F.col("o_dist") == F.col("dist")) & (F.col("o_id") < F.col("vec_id"))
    )
    return (
        pairs.groupBy("vec_id", "cluster", "dist")
        .agg(
            F.count("*").alias("n_dup_partners"),
            F.max(beats.cast("int")).alias("_beaten"),
        )
        .filter(F.col("_beaten") == 1)
        .drop("_beaten")
        .orderBy("vec_id")
    )


def embedding_drift(emb: DataFrame, dump_size: int = 100) -> DataFrame:
    """Embedding-space drift between consecutive crawl snapshots — the
    representation-level counterpart of `curation.snapshot_term_drift`
    (a dump whose embedding centroid swings is a content-mix or
    encoder-version change even when the token distribution looks
    stable, and vice versa; production corpora monitor both).

    Vectors map to dumps of ``dump_size`` consecutive ``vec_id``s (the
    shared snapshot convention).  Each dump's centroid is the
    per-dimension integer mean of the quantized embedding
    (``sum div n`` — quantized units, exact in both engines), and
    consecutive centroids compare by squared cosine in basis points via
    the same cross-multiplied integer form as
    :func:`embedding_cosine_duplicates` (``div 1000`` downscale keeps
    every product under 2^63 at any corpus size).  Returns one row per
    pair: ``(dump_from, dump_to, n_from, n_to, dot_sign,
    cos2_x10000)`` — identical distributions score ~10000, orthogonal
    drift scores ~0.

    Scale shape: one posexplode → map-side-combined ``(dump, dim)``
    sums (n_dumps × dim rows survive); centroids, the consecutive-pair
    join, and the cosine rollup all run on that tiny aggregate.  The
    sums aggregate feeds the join's both sides, so it is
    localCheckpoint-ed (same rationale as ``snapshot_term_drift``).
    """
    q = quantized(emb).select(
        F.expr(f"vec_id div {int(dump_size)}").alias("dump"), "qe"
    )
    comps = q.select("dump", F.posexplode("qe").alias("dim", "x"))
    sums = comps.groupBy("dump", "dim").agg(
        F.sum("x").alias("s"), F.count("*").alias("n")
    )
    sums = sums.localCheckpoint()
    cent = sums.select(
        "dump", "dim", "n", F.expr("s div n").alias("c")
    )
    a, b = cent.alias("a"), cent.alias("b")
    joined = a.join(
        b,
        (F.col("a.dump") + 1 == F.col("b.dump"))
        & (F.col("a.dim") == F.col("b.dim")),
    ).select(
        F.col("a.dump").alias("dump_from"),
        F.col("b.dump").alias("dump_to"),
        F.col("a.n").alias("n_from"),
        F.col("b.n").alias("n_to"),
        (F.col("a.c") * F.col("b.c")).alias("xy"),
        (F.col("a.c") * F.col("a.c")).alias("xx"),
        (F.col("b.c") * F.col("b.c")).alias("yy"),
    )
    agg = joined.groupBy("dump_from", "dump_to", "n_from", "n_to").agg(
        F.sum("xy").alias("dot"),
        F.sum("xx").alias("na"),
        F.sum("yy").alias("nb"),
    )
    return agg.select(
        "dump_from",
        "dump_to",
        "n_from",
        "n_to",
        F.signum("dot").cast("int").alias("dot_sign"),
        F.expr(
            "(10000 * ((dot div 1000) * (dot div 1000)))"
            " div greatest((na div 1000) * (nb div 1000), 1)"
        ).alias("cos2_x10000"),
    )
