"""Extra measurement harness for the optimization round (guide §1).

NOT the driver contract — ``bench.py`` is frozen for measurement.  This
file exists so per-query work can be isolated and re-measured quickly:

- times each headline query with the noop sink (guide §1.4), several
  reps, reporting every wall so cold (first-run planning + codegen) and
  steady-state costs are visible separately;
- optionally dumps ``.explain("formatted")`` for each query to
  ``plans/r08/<query>_<tag>.txt`` so plan-shape claims are committed
  evidence;
- labels jobs (guide §1.5).

Usage:
    python bench_extra.py                         # time all headline queries
    python bench_extra.py -q dedup_simhash_pairs  # just one
    python bench_extra.py --explain before        # also dump plans/r08/*_before.txt
    python bench_extra.py --reps 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "tpch_q1",
    "top_customers_per_region",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "ann_topk_dot",
    "events_sessionize",
    "token_count",
    "quality_score",
    "paragraph_dedup",
    "url_canonical_dedup",
    "pii_redact",
    "gopher_quality",
    "tfidf_top_terms",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-q", "--query", action="append", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--explain",
        default=None,
        metavar="TAG",
        help="dump plans/r08/<query>_<TAG>.txt explain('formatted') output",
    )
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()

    from deepseek_ocr_customvllm_spark.plans.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    names = args.query or HEADLINE
    # warm the SQL/codegen path once, as bench.py does
    queries["token_count"](spark, args.sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    plans_dir = os.path.join(REPO, "plans", "r08")
    if args.explain:
        os.makedirs(plans_dir, exist_ok=True)

    out: dict = {}
    for name in names:
        walls = []
        for rep in range(args.reps):
            # rep isolation: persist-shaped queries would cache-HIT
            # later reps on the first rep's materialized intermediates
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = queries[name](spark, args.sf_dir)
            df.write.mode("overwrite").format("noop").save()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"walls": walls, "min": min(walls)}
        if args.explain:
            df = queries[name](spark, args.sf_dir)
            path = os.path.join(plans_dir, f"{name}_{args.explain}.txt")
            with open(path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
        print(json.dumps({name: out[name]}), flush=True)

    total_min = round(sum(v["min"] for v in out.values()), 3)
    total_first = round(sum(v["walls"][0] for v in out.values()), 3)
    print(json.dumps({"total_first": total_first, "total_min": total_min}))
    spark.stop()


if __name__ == "__main__":
    main()
