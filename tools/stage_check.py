"""Ad-hoc staging parity loop: run each staged module's builders against
their DuckDB oracles through the driver-mirror harness at one or more
SF dirs, printing pass/fail per entry. Used while a staged module is
still free to change, BEFORE its test_staged_r*.py lands.

Usage: python tools/stage_check.py <module> [<module> ...] [--sf DIR ...]
"""

from __future__ import annotations

import importlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    sfs, mods = [], []
    it = iter(args)
    for a in it:
        if a == "--sf":
            try:
                sfs.append(next(it))
            except StopIteration:
                print("usage: stage_check.py <module> [...] [--sf DIR ...]")
                return 2
        else:
            mods.append(a)
    sfs = sfs or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    from bucket_to_bigquery_spark.queries.registry import Query, _with_tuning
    from bucket_to_bigquery_spark.session import get_spark
    from tests.oracle import compare, duck_connection

    spark = get_spark("stage-check")
    failures = 0
    for modname in mods:
        try:
            mod = importlib.import_module(
                f"bucket_to_bigquery_spark.queries.{modname}")
        except ModuleNotFoundError:
            print(f"unknown query module: {modname!r} "
                  "(expected a bucket_to_bigquery_spark.queries submodule)")
            return 2
        staged = {
            name: Query(name, _with_tuning(fn), oracle, desc, tags)
            for name, (fn, oracle, desc, tags) in mod.STAGED.items()
        }
        for sf in sfs:
            duck = duck_connection(sf)
            try:
                for name in sorted(staged):
                    t0 = time.time()
                    try:
                        problems = compare(name, spark, duck, sf, staged)
                    except Exception as e:  # noqa: BLE001
                        problems = [f"{type(e).__name__}: {e}"]
                    dt = time.time() - t0
                    tag = "PASS" if not problems else "FAIL"
                    failures += bool(problems)
                    print(f"{tag} {name} @ {os.path.basename(sf)} "
                          f"({dt:.1f}s)" + (": " + "; ".join(problems)
                                            if problems else ""))
            finally:
                duck.close()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
