"""Round-16 (optimization round) isolated steady measurement.

Same protocol as tools/perf_r15.py / adjudicate_r14.py: bench session
factory, bench.py's exact execution (noop write), one untimed warm
build pass per query, 3 timed reps with a full state sweep between,
calib probes around each per-query loop. Run BEFORE and AFTER any
change — the host has two scheduling regimes, so single in-bench
numbers are not evidence.

Usage: python tools/perf_r16.py [sf_dir] [query ...]
       (defaults: /root/testdata/sf0.1, the r16 optimization targets)
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

# The r16 optimization target list: every bench row >= ~4 s in
# BENCH_local_r16b plus the in-window similarity/incremental family.
CANDIDATES = [
    "q54_full_pipeline",
    "q89b_source_overlap_minhash",
    "q78_pagerank",
    "q133_neardup_apply",
    "q132_neardup_components",
    "q89_source_overlap",
    "q95_shingle_novelty",
    "q130_lloyd_step_audit",
    "q46c_dedup_clusters",
    "q46d_dedup_apply",
    "q78b_triangle_count",
    "q76_frequent_pairs",
    "q55b_incremental_dedup_apply",
    "q55_incremental_dedup",
    "q47_ngram_jaccard_pairs",
    "q48e_signgrid_ann",
    "q48h_ivf_topk_exact_centroids",
    "q53_substring_scrub",
    "q47e_containment_pairs",
    "q51_repeated_substrings",
]

REPS = 3


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or CANDIDATES
    spark = get_spark("b2bqs-perf-r16")
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
        c0 = _calibrate(spark)
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            try:
                _execute(registry[name].builder(spark, sf_dir))
                reps.append(round(time.perf_counter() - t0, 3))
            except Exception as e:  # noqa: BLE001
                reps.append(None)
                print(f"ERR {name}: {type(e).__name__}: {e}", file=sys.stderr)
                break
            _sweep_state(spark)
        c1 = _calibrate(spark)
        ok = [r for r in reps if r is not None]
        med = sorted(ok)[len(ok) // 2] if ok else None
        out[name] = {"reps": reps, "median": med, "calib": [c0, c1]}
        print(f"{name}: reps={reps} median={med} calib=[{c0},{c1}]",
              file=sys.stderr)

    print(json.dumps({"sf_dir": sf_dir, "reps": REPS, "rows": out}))


if __name__ == "__main__":
    main()
