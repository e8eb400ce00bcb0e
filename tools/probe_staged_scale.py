"""Ad-hoc scale-trend probe for the staged (unregistered) surface:
wall time per staged query at sf0.01 vs sf0.1 (10x data). The r10
round introduced this probe for its new registrations; staged entries
get the same treatment BEFORE they ever register, so a super-linear
row is caught while its module is still free to change.

Usage: python tools/probe_staged_scale.py [module ...]
Defaults to the full staged-r12 + staged-r13 sets.
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_MODULES = [
    "pit", "ab", "paths", "sketch_overlap",           # staged r12
    "collocations", "fd", "novelty", "psi",           # staged r13
    "rules", "zipf", "arrivals", "separation",        # staged r13b
]


def main() -> int:
    from bucket_to_bigquery_spark.session import get_spark

    mods = sys.argv[1:] or DEFAULT_MODULES
    spark = get_spark("staged-scale-probe")
    results = []
    for modname in mods:
        mod = importlib.import_module(
            f"bucket_to_bigquery_spark.queries.{modname}")
        for name, (fn, _o, _d, _t) in mod.STAGED.items():
            row = {"q": name}
            for tag, sf in (("s001", "/root/testdata/sf0.01"),
                            ("s01", "/root/testdata/sf0.1")):
                # warm the input cache layer once, then measure steady
                fn(spark, sf).collect()
                t0 = time.monotonic()
                n = len(fn(spark, sf).collect())
                row[tag] = round(time.monotonic() - t0, 3)
                row[f"rows_{tag}"] = n
                spark.catalog.clearCache()
            row["ratio_10x"] = round(row["s01"] / max(row["s001"], 1e-9), 2)
            results.append(row)
            print(json.dumps(row))
    print(json.dumps({
        "probe": "staged_10x",
        "worst": max(results, key=lambda r: r["ratio_10x"])["q"],
        "ratios": {r["q"]: r["ratio_10x"] for r in results},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
