"""Round-13 adjudication of the six r12 driver-bench rows >=2x anchor.

VERDICT r12 marked q48e/q48d/q48/q47b/q48c/q48f weak-pending-adjudication:
the r12 DRIVER table read them 2.2-4.9x the r11b anchor, while two
same-code full local samples read 1.000x/1.056x with zero rows over 2x.
BASELINE.md's protocol: a >2x row is a finding only with calib in the
fast band AND a steady isolated re-measurement (3 reps, clearCache/state
sweep between, quiet host, calib probes around each loop).

Runs each flagged query isolated at sf0.1 on the bench session factory,
with bench.py's exact execution (noop write), warm-up semantics (one
untimed build pass so one-time scratch/index artifacts are out of the
timed reps -- the r12 driver table's q48-family inflation hypothesis is
exactly these one-time IVF v5 rebuilds), and per-query calib probes.

Usage: python tools/adjudicate_r13.py [sf_dir]   (default /root/testdata/sf0.1)
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

FLAGGED = [
    "q48e_signgrid_ann",
    "q48d_ivf_prebuilt",
    "q48_cosine_topk",
    "q47b_minhash_lsh_pairs",
    "q48c_ivf_topk",
    "q48f_knn_label_audit",
    "q48b_ann_lsh_topk",  # in-family control (not flagged, shares inputs)
]

REPS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("b2bqs-adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    by_real = {}
    for k, q in registry.items():
        by_real[getattr(q, "name", k)] = q
        by_real[k] = q

    # Session warm-up identical in spirit to bench.py: python workers,
    # codegen, and the one-time offline artifacts (q48d's IVF index).
    _warm_python_workers(spark)
    for name in FLAGGED:
        try:
            by_real[name].builder(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"WARM-ERR {name}: {e}", file=sys.stderr)
    _sweep_state(spark)

    out = {}
    for name in FLAGGED:
        _sweep_state(spark)
        c_pre = _calibrate(spark)
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            _execute(by_real[name].builder(spark, sf_dir))
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
