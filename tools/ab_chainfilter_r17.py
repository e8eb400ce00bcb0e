"""Interleaved A/B of the q67/q75 tokenize-chain-filter shapes (r17).

This host's two scheduling regimes make separate-session wall clocks
undecidable for small deltas (see OPTIMIZATION_r16.md's measurement
hazard); alternating OLD/NEW executions inside ONE session gives both
shapes the same regime, and the per-rep process-tree CPU seconds are
the stall-immune work metric (the tools/perf_cpu_r16.py rationale).

OLD = the pre-r17 shapes verbatim: q67's `.where(size(tokens)>=2)`
pushed-chain filter + inner explode; q75's inner `explode(toks)` whose
InferFiltersFromGenerate inference substitutes the tokenize chain into
a synthesized filter above both corpus scans.
NEW = the committed registry builders (when-guard + explode_outer +
isNotNull for q67; explode_outer for q75).

Usage: python tools/ab_chainfilter_r17.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import _calibrate, _execute, _sweep_state, _warm_python_workers  # noqa: E402
from bucket_to_bigquery_spark.operators.dedup import tokens  # noqa: E402
from bucket_to_bigquery_spark.queries.registry import tables  # noqa: E402
from bucket_to_bigquery_spark.queries.retrieval import (  # noqa: E402
    _CONTRIB_FMT, _K1, _B, _QUERYSET, _TOPK as _Q75_TOPK, q75,
)
from bucket_to_bigquery_spark.queries.tokenstats import _TOPK as _Q67_TOPK, q67  # noqa: E402

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
    kids = _children_map()
    total = 0.0
    stack = [os.getpid()]
    while stack:
        pid = stack.pop()
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(") ", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / _TICK
        except (OSError, IndexError, ValueError):
            pass
        stack.extend(kids.get(pid, []))
    return total


def _old_q67(spark, sf_dir):
    """The pre-r17 q67 body, verbatim."""
    docs = tables(spark, sf_dir)["documents"]
    toks = docs.select(tokens(F.col("text")).alias("t")).where(F.size("t") >= 2)
    pairs = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("t"), i),
                    F.element_at(F.col("t"), i + 1),
                ),
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).cast("long").alias("n"))
    top = counted.orderBy(F.col("n").desc(), F.col("pair").asc()).limit(_Q67_TOPK)
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "pair", "n")
        .orderBy("rank")
    )


def _old_q75(spark, sf_dir):
    """The pre-r17 q75 body, verbatim (inner explode)."""
    docs = tables(spark, sf_dir)["documents"]
    all_terms = sorted({t for _, ts in _QUERYSET for t in ts})

    dtok = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    dlen = dtok.select(
        "doc_id", F.size("toks").cast("long").alias("dl"), "toks"
    )
    stats = dlen.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    )
    tf = (
        dlen.select("doc_id", "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(all_terms))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    qt = (
        spark.range(1)
        .select(F.explode(F.array(*[
            F.struct(F.lit(qid).alias("query_id"), F.lit(t).alias("term"))
            for qid, ts in _QUERYSET for t in ts
        ])).alias("qt"))
        .select("qt.query_id", "qt.term")
    )

    contrib = F.expr(_CONTRIB_FMT.format(
        tf="tf", df="df", dl="dl", nd="n_docs", td="total_dl",
        k1=_K1, b=_B,
    )).alias("c_e6")
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(F.broadcast(qt), "term")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", contrib)
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("c_e6").cast("long").alias("score_e6"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_e6").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _Q75_TOPK)
        .select("query_id", "rank", "doc_id", "score_e6", "n_terms")
        .orderBy("query_id", "rank")
    )


def main() -> None:
    from bucket_to_bigquery_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    rounds = int(args[1]) if len(args) > 1 else 5
    spark = get_spark("b2bqs-ab-chainfilter-r17")
    spark.sparkContext.setLogLevel("ERROR")
    _warm_python_workers(spark)

    pairs = {
        "q67": (_old_q67, q67),
        "q75": (_old_q75, q75),
    }
    out = {}
    for qname, (old_b, new_b) in pairs.items():
        old_df = old_b(spark, sf_dir)
        new_df = new_b(spark, sf_dir)
        _execute(old_df)
        _execute(new_df)
        _sweep_state(spark)
        rows = {"old": [], "new": []}
        for r in range(rounds):
            for label, df in (("old", old_df), ("new", new_df)):
                _sweep_state(spark)
                cpu0 = _tree_cpu_s()
                t0 = time.perf_counter()
                _execute(df)
                dt = round(time.perf_counter() - t0, 3)
                cpu = round(_tree_cpu_s() - cpu0, 2)
                rows[label].append({"wall_s": dt, "cpu_s": cpu})
                print(f"{qname} round {r} {label}: wall={dt} cpu={cpu} "
                      f"calib={_calibrate(spark)}", file=sys.stderr)
        summary = {}
        for label in ("old", "new"):
            walls = sorted(x["wall_s"] for x in rows[label])
            cpus = sorted(x["cpu_s"] for x in rows[label])
            summary[label] = {
                "wall_median": walls[len(walls) // 2],
                "wall_min": walls[0],
                "cpu_median": cpus[len(cpus) // 2],
                "cpu_min": cpus[0],
                "reps": rows[label],
            }
        out[qname] = summary
    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
