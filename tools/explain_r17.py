"""Dump ``.explain("formatted")`` for named queries to plans/r17/.

Usage: python tools/explain_r17.py <suffix> [sf_dir] [query ...]

``suffix`` is ``before`` or ``after``; files land at
plans/r17/<query>_<suffix>.txt. Plans are built (not executed) —
cheap enough to run alongside other work.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bucket_to_bigquery_spark.queries import all_queries  # noqa: E402
from bucket_to_bigquery_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    args = sys.argv[2:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    out_dir = os.path.join(REPO, "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("b2bqs-explain-r17")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    for name in names:
        try:
            df = registry[name].builder(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
