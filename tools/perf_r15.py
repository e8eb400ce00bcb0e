"""Round-15 isolated steady measurement of the llm-rotation perf
candidates (tools/r15_llm_rotation_plan.md "Perf candidates").

Same protocol as tools/adjudicate_r14.py: bench session factory,
bench.py's exact execution (noop write), one untimed warm build pass
per query, 3 timed reps with a full state sweep between, calib probes
around each per-query loop. Run BEFORE and AFTER any change — the host
has two scheduling regimes, so single in-bench numbers are not
evidence.

Usage: python tools/perf_r15.py [sf_dir] [query ...]
       (defaults: /root/testdata/sf0.1, the plan's candidate list)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _calibrate, _execute, _sweep_state, _warm_python_workers  # noqa: E402
from bucket_to_bigquery_spark.queries import all_queries  # noqa: E402
from bucket_to_bigquery_spark.session import get_spark  # noqa: E402

CANDIDATES = [
    "q47b_minhash_lsh_pairs",
    "q46c_dedup_clusters",
    "q46d_dedup_apply",
    "q47_ngram_jaccard_pairs",
    "q47e_containment_pairs",
    "q46b_simhash_fingerprint",
    "q48e_signgrid_ann",
]

REPS = 3


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or CANDIDATES
    spark = get_spark("b2bqs-perf-r15")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    _warm_python_workers(spark)
    for name in names:
        try:
            registry[name].builder(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"WARM-ERR {name}: {e}", file=sys.stderr)
    _sweep_state(spark)

    out = {}
    for name in names:
        _sweep_state(spark)
        c_pre = _calibrate(spark)
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            _execute(registry[name].builder(spark, sf_dir))
            reps.append(round(time.perf_counter() - t0, 3))
            _sweep_state(spark)
        c_post = _calibrate(spark)
        med = sorted(reps)[len(reps) // 2]
        out[name] = {"reps": reps, "median": med, "calib": [c_pre, c_post]}
        print(f"{name}: reps={reps} median={med} calib=[{c_pre}, {c_post}]",
              flush=True)

    print(json.dumps({"sf_dir": sf_dir, "reps": REPS, "rows": out}))


if __name__ == "__main__":
    main()
