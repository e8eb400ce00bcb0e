"""Benchmark: run every declared query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q...": sec, ...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count). A
warm-up pass on one query amortizes JVM/codegen startup out of per-query
numbers; total excludes session startup but includes all query work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bucket_to_bigquery_spark.queries import all_queries  # noqa: E402
from bucket_to_bigquery_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    spark = get_spark("b2bqs-bench")
    spark.sparkContext.setLogLevel("ERROR")

    registry = all_queries()

    # Warm-up: JVM JIT, codegen cache, filesystem metadata.
    registry["q17_tpch_q1_shape"].builder(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in sorted(registry):
        q = registry[name]
        t0 = time.perf_counter()
        df = q.builder(spark, sf_dir)
        # Force full execution incl. result materialization to the driver
        # boundary, like the driver's collect, but cheap on memory.
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "declared_query_set_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
