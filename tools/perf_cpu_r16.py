"""Round-16 isolated measurement with a stall-immune work metric.

Same protocol as tools/perf_r16.py (bench session factory, bench.py's
noop-sink execution, untimed warm pass, state sweep between reps), but
alongside wall-clock it records the PROCESS-TREE CPU seconds consumed
by each rep (driver python + JVM + python workers, summed from
/proc/<pid>/stat utime+stime over this process's descendant tree).

Why: this sandbox host has multi-minute scheduler stalls that inflate
wall-clock 3-8x run-to-run (documented in OPTIMIZATION_r16.md's
measurement-hazard note), which makes wall-time A/B undecidable in a
bad window. CPU ticks are only charged while a thread actually runs,
so steal/stall windows do not inflate them — cpu_s is a comparable
WORK metric across sessions, while wall_s stays the headline the bench
reports. A structural optimization (fewer exchanges, no duplicated
subtree) must show in cpu_s; one that only rearranges waiting does not.

Usage: python tools/perf_cpu_r16.py [sf_dir] [query ...]
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

REPS = 3
_TICK = os.sysconf("SC_CLK_TCK")


def _children_map() -> dict[int, list[int]]:
    kids: dict[int, list[int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(") ", 1)[1].split()
            ppid = int(parts[1])
        except (OSError, IndexError, ValueError):
            continue
        kids.setdefault(ppid, []).append(int(pid))
    return kids


def _tree_cpu_s() -> float:
    """utime+stime seconds over this process and every live descendant."""
    kids = _children_map()
    total = 0.0
    stack = [os.getpid()]
    while stack:
        pid = stack.pop()
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(") ", 1)[1].split()
            # field 14/15 (1-based utime/stime) land at parts[11]/[12]
            total += (int(parts[11]) + int(parts[12])) / _TICK
        except (OSError, IndexError, ValueError):
            pass
        stack.extend(kids.get(pid, []))
    return total


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark("b2bqs-perf-cpu-r16")
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
            cpu0 = _tree_cpu_s()
            t0 = time.perf_counter()
            try:
                _execute(registry[name].builder(spark, sf_dir))
                wall = round(time.perf_counter() - t0, 3)
                cpu = round(_tree_cpu_s() - cpu0, 2)
                reps.append({"wall_s": wall, "cpu_s": cpu})
            except Exception as e:  # noqa: BLE001
                reps.append(None)
                print(f"ERR {name}: {type(e).__name__}: {e}", file=sys.stderr)
                break
            _sweep_state(spark)
        c1 = _calibrate(spark)
        ok = [r for r in reps if r is not None]
        med_cpu = (sorted(r["cpu_s"] for r in ok)[len(ok) // 2]
                   if ok else None)
        min_wall = min((r["wall_s"] for r in ok), default=None)
        out[name] = {"reps": reps, "median_cpu_s": med_cpu,
                     "min_wall_s": min_wall, "calib": [c0, c1]}
        print(f"{name}: {reps} median_cpu={med_cpu} min_wall={min_wall} "
              f"calib=[{c0},{c1}]", file=sys.stderr)

    print(json.dumps({"sf_dir": sf_dir, "reps": REPS, "rows": out}))


if __name__ == "__main__":
    main()
