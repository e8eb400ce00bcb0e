"""Ad-hoc scale-trend probe for the staged (unregistered) surface:
wall time per staged query at sf0.01 vs sf0.1 (10x data). The r10
round introduced this probe for its new registrations; staged entries
get the same treatment BEFORE they ever register, so a super-linear
row is caught while its module is still free to change.

Usage: python tools/probe_staged_scale.py [module ...]
Defaults to every queries/ module exposing a STAGED dict with at least
one not-yet-registered entry — DERIVED by scan, not a hand-kept list
(ADVICE r11 #2: the r11 list silently omitted 7 of the 15 staged-r13
modules, so a no-arg run under-probed while the GATE file claimed full
coverage).
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def staged_modules() -> list[str]:
    """Scan bucket_to_bigquery_spark/queries for modules with unregistered
    STAGED entries (importing the registry first, so a module whose
    STAGED surface already registered — e.g. pit/ab/paths/sketch_overlap
    after r12 — drops out automatically)."""
    from bucket_to_bigquery_spark.queries import all_queries

    reg = set(all_queries())
    qdir = os.path.join(REPO, "bucket_to_bigquery_spark", "queries")
    found = []
    for fname in sorted(os.listdir(qdir)):
        if not fname.endswith(".py") or fname.startswith("_"):
            continue
        mod = importlib.import_module(
            f"bucket_to_bigquery_spark.queries.{fname[:-3]}")
        staged = getattr(mod, "STAGED", None)
        if staged and any(n not in reg for n in staged):
            found.append(fname[:-3])
    return found


def main() -> int:
    from bucket_to_bigquery_spark.session import get_spark

    mods = sys.argv[1:] or staged_modules()
    if not mods:
        print(json.dumps({"probe": "staged_10x", "ratios": {},
                          "note": "no unregistered STAGED entries found"}))
        return 0
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
