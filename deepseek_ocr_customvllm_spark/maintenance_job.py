"""Store-maintenance CLI: compact the incremental-dedup band/shingle
store (`streaming.dedup_stream.compact_incremental_store`).

A months-running incremental dedup stream accumulates one committed
``batch=<content-key>`` partition per micro-batch; this job folds them
into one compacted partition per table so the sink's old-side path
list stays O(1) in history length.  Crash-safe (atomic manifest swap,
deferred sweep — see the operator docstring); run it between drains,
spaced further apart than a micro-batch takes.  The second invocation
of a quiet period completes the previous cycle's deferred cleanup.

Run under spark-submit (the module file is the application)::

    spark-submit --driver-memory 8g \\
        --py-files dist/deepseek_ocr_customvllm_spark.zip \\
        deepseek_ocr_customvllm_spark/maintenance_job.py \\
        --store /data/dedup_store --state /data/dedup_state

Prints ONE JSON line with fold/sweep stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

if __package__ in (None, ""):  # plain `python .../maintenance_job.py`
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

from deepseek_ocr_customvllm_spark.plans.session import get_spark
from deepseek_ocr_customvllm_spark.streaming.dedup_stream import (
    compact_incremental_store,
)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--store", required=True, help="band/shingle store dir")
    parser.add_argument("--state", required=True, help="ledger state-store dir")
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    spark = get_spark(app_name="maintenance_job", master=args.master)
    t0 = time.time()
    stats = compact_incremental_store(spark, args.store, args.state)
    print(
        json.dumps(
            {
                "job": "compact_incremental_store",
                **stats,
                "wall_clock_s": round(time.time() - t0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
