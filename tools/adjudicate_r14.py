"""Round-14 adjudication of the two r13 driver-bench rows >=2x anchor.

VERDICT r13 marked q52_sequence_packing and q53_substring_scrub
weak-pending-adjudication: the r13 DRIVER table read them 5.0x / 4.2x
the promoted anchor rows (5.3 s vs 1.06; 13.0 s vs 3.12) on code
untouched since round 6, while all four r13 local samples read q52 at
~1.2 s and q53 at 3.8-5.8 s. BASELINE.md's protocol: a >2x row is a
finding only with calib in the fast band AND a steady isolated
re-measurement (3 reps, state sweep between, quiet host, calib probes
around each loop).

Runs each flagged query isolated at sf0.1 on the bench session factory
with bench.py's exact execution (noop write), warm-up semantics (one
untimed build pass so one-time scratch artifacts stay out of the timed
reps), and per-query calib probes. q51_repeated_substrings rides along
as the in-family control (same windowed-hash span-index machinery as
q53; not flagged).

Usage: python tools/adjudicate_r14.py [sf_dir]  (default /root/testdata/sf0.1)
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
    "q52_sequence_packing",
    "q53_substring_scrub",
    "q51_repeated_substrings",  # in-family control (not flagged, shares the span-index machinery)
]

REPS = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("b2bqs-adjudicate-r14")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    by_real = {}
    for k, q in registry.items():
        by_real[getattr(q, "name", k)] = q
        by_real[k] = q

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
